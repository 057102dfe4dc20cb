from comm_detect_spark.operators.components import connected_components  # noqa: F401
from comm_detect_spark.operators.louvain import dense_relabel, louvain  # noqa: F401
from comm_detect_spark.operators.lpa import lpa_sync  # noqa: F401
from comm_detect_spark.operators.lpa_async import lpa_async  # noqa: F401
from comm_detect_spark.operators.modularity import modularity_score  # noqa: F401
from comm_detect_spark.operators.corpus import (  # noqa: F401
    hash_split,
    pack_shards,
)
from comm_detect_spark.operators.dedup import (  # noqa: F401
    content_hash,
    decontaminate,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from comm_detect_spark.operators.kcore import (  # noqa: F401
    k_core,
    local_clustering,
)
from comm_detect_spark.operators.anf import (  # noqa: F401
    anf_b_sum,
    anf_estimates,
    anf_sketches,
    effective_diameter,
    neighborhood_function,
)
from comm_detect_spark.operators.hits import hits  # noqa: F401
from comm_detect_spark.operators.pagerank import (  # noqa: F401
    pagerank,
    personalized_pagerank,
)
from comm_detect_spark.operators.sessions import sessionize  # noqa: F401
from comm_detect_spark.operators.similarity import (  # noqa: F401
    ann_pairs,
    brute_force_topk,
    ivf_fit_centroids,
    ivf_fit_centroids_distributed,
    ivf_topk,
    ivf_topk_pruned,
    lsh_topk,
    read_centroids,
    write_centroids,
    write_ivf_table,
)
from comm_detect_spark.operators.scc import (  # noqa: F401
    strongly_connected_components,
)
from comm_detect_spark.operators.triangles import triangle_counts  # noqa: F401
