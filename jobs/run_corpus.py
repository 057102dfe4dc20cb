"""spark-submit entry point for the training-data corpus pipeline.

The graph jobs live in run_algorithm.py; this is the document-side twin —
the compositions a 100 TB corpus run actually launches:

    # dedup keep-list (exact ∪ minhash-LSH -> CC clusters -> representative
    # + quality gate):
    spark-submit --py-files comm_detect_spark.zip jobs/run_corpus.py \
        --task dedup --docs /data/documents.parquet --out /data/keep

    # per-document stats (tokens, BPE-ish count, quality, lang, fingerprint):
    ... --task stats ...

    # materialize an IVF ANN index partitioned by inverted-list id:
    ... --task ivf-index --docs /data/embeddings.parquet \
        --out /data/ivf --n-centroids 256

Outputs are parquet directories; `--out` is overwritten. Build the zip with
`python scripts/package.py`.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True, choices=["dedup", "stats", "ivf-index"])
    ap.add_argument("--docs", required=True,
                    help="documents parquet (doc_id, text) or, for ivf-index, "
                         "embeddings parquet (vec_id, embedding)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--k", type=int, default=3, help="shingle size")
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--vec-id-col", default="vec_id")
    ap.add_argument("--n-centroids", type=int, default=64)
    ap.add_argument("--fit", choices=["sample", "distributed"],
                    default="sample",
                    help="ivf-index quantizer training: driver-side hash "
                         "sample (deterministic, oracle-replayable) or "
                         "full-corpus distributed Lloyd iterations")
    args = ap.parse_args()

    spark = SparkSession.builder.appName(f"corpus-{args.task}").getOrCreate()
    docs = spark.read.parquet(args.docs)

    if args.task == "dedup":
        from comm_detect_spark.operators.corpus import corpus_keep_list

        out = corpus_keep_list(
            spark, docs, args.id_col, args.text_col,
            k=args.k, num_hashes=args.num_hashes, bands=args.bands,
            min_quality=args.min_quality,
        )
        out.write.mode("overwrite").parquet(args.out)
    elif args.task == "stats":
        from pyspark.sql import functions as F

        from comm_detect_spark.functions.text import (
            bpe_ish_token_count,
            fingerprint,
            lang_id,
            quality_score,
            token_count,
        )

        docs.select(
            F.col(args.id_col).alias("id"),
            token_count(args.text_col).alias("tokens"),
            bpe_ish_token_count(args.text_col).alias("bpe_tokens"),
            quality_score(args.text_col).alias("quality"),
            lang_id(args.text_col).alias("lang"),
            fingerprint(args.text_col).alias("fingerprint"),
        ).write.mode("overwrite").parquet(args.out)
    else:  # ivf-index
        from comm_detect_spark.operators.similarity import (
            ivf_fit_centroids,
            ivf_fit_centroids_distributed,
            write_centroids,
            write_ivf_table,
        )

        fit = (
            ivf_fit_centroids_distributed
            if args.fit == "distributed"
            else ivf_fit_centroids
        )
        cent = fit(
            docs, n_centroids=args.n_centroids,
            id_col=args.vec_id_col, vec_col=args.vec_col,
        )
        write_ivf_table(
            docs, args.out, cent, id_col=args.vec_id_col, vec_col=args.vec_col
        )
        # persist the quantizer next to the index (a probe needs the SAME
        # centroids that built the lists) — through Spark, so hdfs:///s3://
        # --out locations work; a driver-local np.save would crash here
        # after the expensive index write already completed
        write_centroids(spark, args.out.rstrip("/") + "_centroids", cent)
    spark.stop()


if __name__ == "__main__":
    main()
