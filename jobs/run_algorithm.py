"""spark-submit entry point (north rule: `spark-submit --py-files` launch).

Examples:
    spark-submit --py-files comm_detect_spark.zip jobs/run_algorithm.py \
        --algo pagerank --edges /data/edges.parquet --out /data/ranks \
        --iterations 10 --checkpoint-root /data/ckpt --run-id run1

    # resume a killed run mid-algorithm:
    ... --resume

Input: an edge parquet (src BIGINT, dst BIGINT, weight BIGINT), or a pages
parquet (--pages) from which the edge table is extracted first.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", required=True,
                    choices=["pagerank", "cc", "lpa_sync", "lpa_async", "louvain", "triangles"])
    ap.add_argument("--edges", help="edge parquet (src, dst, weight)")
    ap.add_argument("--pages", help="pages parquet (url, warc_ts, html, text, lang)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--num-blocks", type=int, default=32)
    ap.add_argument("--checkpoint-root")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--resume", action="store_true")
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
    from comm_detect_spark.sources.pages import pages_to_graph

    if args.pages:
        pages = spark.read.parquet(args.pages)
        vertices, edges = pages_to_graph(
            pages, symmetric=args.algo in ("cc", "lpa_sync", "lpa_async", "louvain", "triangles")
        )
    else:
        edges = spark.read.parquet(args.edges)
        vertices = None

    n = (
        int(edges.select(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0]) + 1
    )

    driver = None
    if args.checkpoint_root:
        store = CheckpointStore(args.checkpoint_root, args.run_id, algo=args.algo)
        driver = IterationDriver(store=store)

    if args.algo == "pagerank":
        out = pagerank(spark, edges, n, iterations=args.iterations, driver=driver)
    elif args.algo == "cc":
        out = connected_components(spark, edges, n, driver=driver)
    elif args.algo == "lpa_sync":
        out = lpa_sync(spark, edges, n, driver=driver)
    elif args.algo == "lpa_async":
        out = lpa_async(spark, edges, n, num_blocks=args.num_blocks, driver=driver)
    elif args.algo == "louvain":
        out, levels = louvain(spark, edges, n, num_blocks=args.num_blocks)
    else:
        out = triangle_counts(edges)

    out.write.mode("overwrite").parquet(args.out)
    spark.stop()


if __name__ == "__main__":
    main()
