"""spark-submit entry point (north rule: `spark-submit --py-files` launch).

Examples:
    spark-submit --py-files comm_detect_spark.zip jobs/run_algorithm.py \
        --algo pagerank --edges /data/edges.parquet --out /data/ranks \
        --iterations 10 --checkpoint-root /data/ckpt --run-id run1

    # resume a killed run mid-algorithm (requires --checkpoint-root):
    ... --resume

Input: an edge parquet (src BIGINT, dst BIGINT, weight BIGINT), or a pages
parquet (--pages) from which the edge table is extracted first. With
--pages, the url -> vid mapping is written to <out>_vertices so vid-keyed
results map back to URLs, and the full minted vertex set (including isolated
pages with no surviving links) is passed to the operators.

Build the zip with `python scripts/package.py`.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", required=True,
                    choices=["pagerank", "ppr", "hits", "cc", "scc", "anf",
                             "lpa_sync", "lpa_async", "louvain", "triangles",
                             "kcore", "clustering", "walks", "mis", "ktruss",
                             "profile", "linkpred", "seeded_lpa", "sssp",
                             "coloring", "katz", "betweenness", "coreness",
                             "khop", "transitivity", "knn"])
    ap.add_argument("--edges", help="edge parquet (src, dst, weight)")
    ap.add_argument("--pages", help="pages parquet (url, warc_ts, html, text, lang)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--iterations", type=int, default=10)
    # None -> size-derived default (one block per shuffle partition);
    # pass 1 explicitly for the oracle-parity single-task mode
    ap.add_argument("--num-blocks", type=int, default=None)
    ap.add_argument("--checkpoint-root")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--init",
                    help="warm-start parquet from a previous crawl's run: "
                         "(vid, rank) for --algo pagerank, (vid, comp) for "
                         "--algo cc (cc: sound for additive deltas only)")
    ap.add_argument("--output-buckets", type=int, default=None,
                    help="also register <out> as a vid-bucketed table "
                         "(downstream joins start co-partitioned — one "
                         "exchange saved per consumer)")
    ap.add_argument("--output-table", default="algo_out",
                    help="catalog table name for --output-buckets")
    ap.add_argument("--seeds", help="parquet of (vid) seed vertices "
                                    "(--algo ppr)")
    ap.add_argument("--k", type=int, default=3, help="k for --algo kcore")
    ap.add_argument("--hops", type=int, default=8,
                    help="--algo anf: neighborhood radius")
    ap.add_argument("--trials", type=int, default=32,
                    help="--algo anf: FM trials (variance ~ 1/sqrt)")
    ap.add_argument("--walk-length", type=int, default=10,
                    help="--algo walks: steps per walk")
    ap.add_argument("--walks-per-vertex", type=int, default=1)
    ap.add_argument("--seed", type=int, default=42,
                    help="--algo walks/mis: deterministic hash seed")
    ap.add_argument("--rounds", type=int, default=None,
                    help="--algo mis/ktruss: fixed round count "
                         "(ktruss default: peel to fixpoint)")
    ap.add_argument("--max-degree", type=int, default=None,
                    help="--algo walks: hash-subsample hub neighbor lists")
    ap.add_argument("--weighted", action="store_true",
                    help="--algo walks: next hop proportional to edge "
                         "weight (cumulative-range hash pick)")
    ap.add_argument("--p", type=float, default=None,
                    help="--algo walks: node2vec return parameter "
                         "(with --q: second-order biased walks)")
    ap.add_argument("--q", type=float, default=None,
                    help="--algo walks: node2vec in-out parameter")
    ap.add_argument("--min-common", type=int, default=2,
                    help="--algo linkpred: min shared neighbors to emit")
    ap.add_argument("--max-center-degree", type=int, default=None,
                    help="--algo linkpred: drop hyper-hub wedge centers")
    args = ap.parse_args()

    spark = SparkSession.builder.appName(f"comm-detect-{args.algo}").getOrCreate()

    from comm_detect_spark.operators.components import connected_components
    from comm_detect_spark.operators.louvain import louvain
    from comm_detect_spark.operators.lpa import lpa_sync
    from comm_detect_spark.operators.lpa_async import lpa_async
    from comm_detect_spark.operators.pagerank import pagerank
    from comm_detect_spark.operators.triangles import triangle_counts
    from comm_detect_spark.plans.checkpoint import CheckpointStore
    from comm_detect_spark.plans.driver import IterationDriver

    if args.resume and not args.checkpoint_root:
        ap.error("--resume requires --checkpoint-root")
    if args.resume and args.algo in ("triangles", "kcore", "clustering",
                                     "scc", "anf"):
        ap.error(f"--resume is not supported for {args.algo}")
    if args.algo in ("ppr", "seeded_lpa", "sssp", "khop") and not args.seeds:
        ap.error(f"--algo {args.algo} requires --seeds")

    vertices = None
    if args.pages:
        from comm_detect_spark.sources.pages import pages_to_graph

        pages = spark.read.parquet(args.pages)
        vertices, edges = pages_to_graph(
            pages, symmetric=args.algo in ("cc", "lpa_sync", "lpa_async",
                                           "louvain", "triangles", "kcore",
                                           "clustering", "anf")
        )
        # url -> vid mapping: without it the vid-keyed output is unreadable
        vertices = vertices.persist()
        vertices.write.mode("overwrite").parquet(f"{args.out}_vertices")
        vids = vertices.select("vid")
        n = vids.count()
    else:
        edges = spark.read.parquet(args.edges)
        vids = None
        n = (
            int(edges.select(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0]) + 1
        )

    def make_driver(run_id: str):
        if not args.checkpoint_root:
            return None
        store = CheckpointStore(args.checkpoint_root, run_id, algo=args.algo)
        return IterationDriver(store=store)

    driver = make_driver(args.run_id)

    if args.init and args.algo not in ("pagerank", "cc"):
        ap.error(f"--init is not supported for {args.algo}")
    init_df = spark.read.parquet(args.init) if args.init else None

    if args.algo == "pagerank":
        out = pagerank(spark, edges, n, iterations=args.iterations,
                       driver=driver, vertices=vids, resume=args.resume,
                       init=init_df)
    elif args.algo == "cc":
        out = connected_components(spark, edges, n, driver=driver,
                                   vertices=vids, resume=args.resume,
                                   init=init_df)
    elif args.algo == "lpa_sync":
        out = lpa_sync(spark, edges, n, driver=driver, vertices=vids,
                       resume=args.resume)
    elif args.algo == "lpa_async":
        out = lpa_async(spark, edges, n, num_blocks=args.num_blocks,
                        driver=driver, resume=args.resume)
    elif args.algo == "louvain":
        # one checkpoint store per level (level counter in the run id);
        # the recursion is deterministic, so a resumed run re-requests the
        # SAME run-id sequence — completed levels fast-path through their
        # final snapshots, the killed level reseeds mid-sweep
        levels_seen = [0]

        def driver_factory():
            levels_seen[0] += 1
            return make_driver(f"{args.run_id}-L{levels_seen[0]}")

        out, levels = louvain(
            spark, edges, n, num_blocks=args.num_blocks,
            driver_factory=driver_factory if args.checkpoint_root else None,
            resume=args.resume,
        )
    elif args.algo == "ppr":
        from comm_detect_spark.operators.pagerank import personalized_pagerank

        seeds = spark.read.parquet(args.seeds)
        out = personalized_pagerank(
            spark, edges, seeds, n, iterations=args.iterations,
            driver=driver, vertices=vids,
        )
    elif args.algo == "hits":
        from comm_detect_spark.operators.hits import hits

        out = hits(spark, edges, n, iterations=args.iterations,
                   driver=driver, vertices=vids)
    elif args.algo == "scc":
        from comm_detect_spark.operators.scc import (
            strongly_connected_components,
        )

        out = strongly_connected_components(spark, edges, n=n, vertices=vids)
    elif args.algo == "kcore":
        from comm_detect_spark.operators.kcore import k_core

        out = k_core(spark, edges, k=args.k)
    elif args.algo == "coreness":
        from comm_detect_spark.operators.kcore import core_decomposition

        out = core_decomposition(
            spark, edges, driver=driver, resume=args.resume
        )
    elif args.algo == "clustering":
        from comm_detect_spark.operators.kcore import local_clustering

        out = local_clustering(edges)
    elif args.algo == "anf":
        from comm_detect_spark.graph.core import vertex_range
        from comm_detect_spark.operators.anf import (
            anf_estimates,
            anf_sketches,
        )

        verts = vids if vids is not None else vertex_range(spark, n)
        sk = anf_sketches(spark, edges, verts, hops=args.hops,
                          trials=args.trials)
        out = anf_estimates(sk, args.trials)
    elif args.algo == "walks":
        from comm_detect_spark.operators.walks import (
            node2vec_walks,
            random_walks,
            weighted_random_walks,
        )

        if args.p is not None or args.q is not None:
            out = node2vec_walks(
                edges, walk_length=args.walk_length,
                walks_per_vertex=args.walks_per_vertex, seed=args.seed,
                p=args.p if args.p is not None else 1.0,
                q=args.q if args.q is not None else 1.0,
                max_degree=args.max_degree,
            )
        elif args.weighted:
            out = weighted_random_walks(
                edges, walk_length=args.walk_length,
                walks_per_vertex=args.walks_per_vertex, seed=args.seed,
            )
        else:
            out = random_walks(
                edges, walk_length=args.walk_length,
                walks_per_vertex=args.walks_per_vertex, seed=args.seed,
                max_degree=args.max_degree,
            )
    elif args.algo == "mis":
        from comm_detect_spark.operators.mis import maximal_independent_set

        out = maximal_independent_set(
            spark, edges, rounds=args.rounds or 10, seed=args.seed
        )
    elif args.algo == "ktruss":
        from comm_detect_spark.operators.truss import k_truss

        out = k_truss(spark, edges, k=args.k, rounds=args.rounds)
    elif args.algo == "profile":
        from comm_detect_spark.operators.graphstats import graph_profile

        out = graph_profile(edges)
    elif args.algo == "betweenness":
        from comm_detect_spark.operators.betweenness import betweenness_approx

        out = betweenness_approx(spark, edges, k_sources=args.k,
                                 seed=args.seed,
                                 max_depth=args.hops)
    elif args.algo == "katz":
        from comm_detect_spark.operators.katz import katz

        out = katz(spark, edges, n, iterations=args.iterations,
                   driver=driver, vertices=vids, resume=args.resume)
    elif args.algo == "coloring":
        from comm_detect_spark.operators.coloring import jones_plassmann

        out = jones_plassmann(spark, edges, rounds=args.rounds or 8,
                              seed=args.seed)
    elif args.algo == "sssp":
        from comm_detect_spark.operators.sssp import sssp

        # --seeds is a (vid) parquet; --rounds fixes the relaxation count
        # (omit for fixpoint under the lineage-truncation driver)
        seed_ids = [
            r["vid"] for r in spark.read.parquet(args.seeds).collect()
        ]
        out = sssp(spark, edges, seed_ids, rounds=args.rounds,
                   driver=driver, resume=args.resume)
    elif args.algo == "seeded_lpa":
        from comm_detect_spark.operators.lpa import seeded_lpa

        # --seeds here is a (vid, label) parquet (vs the vid-only ppr set)
        seeds = spark.read.parquet(args.seeds)
        out = seeded_lpa(spark, edges, seeds, rounds=args.rounds or 3)
    elif args.algo == "khop":
        from comm_detect_spark.operators.subgraph import khop_subgraph

        # --seeds is a (vid) parquet; --k is the hop radius
        seed_ids = [
            r["vid"] for r in spark.read.parquet(args.seeds).collect()
        ]
        out = khop_subgraph(spark, edges, seed_ids, k=args.k)
    elif args.algo == "transitivity":
        from comm_detect_spark.operators.graphstats import global_transitivity

        out = global_transitivity(edges)
    elif args.algo == "knn":
        from comm_detect_spark.operators.graphstats import avg_neighbor_degree

        out = avg_neighbor_degree(edges)
    elif args.algo == "linkpred":
        from comm_detect_spark.operators.linkpred import (
            link_prediction_scores,
        )

        out = link_prediction_scores(
            edges, max_center_degree=args.max_center_degree,
            min_common=args.min_common,
        )
    else:
        out = triangle_counts(edges)

    if args.output_buckets:
        from comm_detect_spark.sources.sinks import write_bucketed

        write_bucketed(out, args.output_table, args.out, args.output_buckets)
    else:
        out.write.mode("overwrite").parquet(args.out)
    spark.stop()


if __name__ == "__main__":
    main()
