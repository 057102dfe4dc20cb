from comm_detect_spark.sources.dimacs import read_dimacs  # noqa: F401
from comm_detect_spark.sources.pages import (  # noqa: F401
    PAGES_SCHEMA,
    extract_edges,
    generate_pages,
    pages_to_graph,
)
