from comm_detect_spark.graph.core import (  # noqa: F401
    degrees,
    dense_ids,
    edges_from_numpy,
    mint_vertex_ids,
    out_weights,
    vertex_range,
    volumes_df,
    weight_net,
)
