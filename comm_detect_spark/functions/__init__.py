from comm_detect_spark.functions.html import (  # noqa: F401
    extract_links_py,
    extract_text_py,
    links_udf,
    text_udf,
)
