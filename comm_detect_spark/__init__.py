"""comm_detect_spark — a PySpark-native link-graph analytics engine.

A brand-new engine (not a port) with the community-detection capabilities of
the reference C++/OpenMP/MPI library ``dlekkas/comm_detect`` plus the
link-graph operators a web-scale pipeline needs: edge extraction from
Common-Crawl-style pages, PageRank, connected components, sync/async label
propagation, Louvain-style modularity refinement, triangle counting,
deduplication / similarity / text-analysis operators, checkpoint/resume.

Layout:
    session     — SparkSession factory with scale-oriented defaults
    oracle      — pure-NumPy executable spec of the reference semantics
    sources     — DIMACS loader, synthetic ``pages`` fixtures, edge extraction
    graph       — vertex-id minting, degrees/volumes, graph container
    operators   — the algorithms (DataFrame-first, Arrow-CSR fast paths)
    functions   — HTML/text/URL/hashing column helpers (vectorized)
    plans       — checkpointing, iteration driver, metrics
"""

__version__ = "0.1.0"
