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

    # benchmark decontamination report (id, hits, contaminated):
    ... --task decontaminate --benchmark /data/evalset.parquet ...

    # graded n-gram-overlap contamination scores (id, n_shingles, n_hit,
    # contamination):
    ... --task contamination --benchmark /data/evalset.parquet --ngram 13 ...

    # exact batch ANN top-k over an embedding table (query_id, id,
    # cosine, rnk):
    ... --task ann-batch --docs /data/embeddings.parquet \
        --queries /data/query_vecs.parquet --topk 10 ...

    # deterministic train/val(/test) assignment:
    ... --task split --splits train:0.9,val:0.1 ...

    # fixed-token training-shard assignment:
    ... --task shards --shard-tokens 1000000 ...

Outputs are parquet directories; `--out` is overwritten. Build the zip with
`python scripts/package.py`.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True,
                    choices=["dedup", "stats", "ivf-index", "decontaminate",
                             "contamination", "split", "shards",
                             "quality-filter", "ann-batch"])
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
    ap.add_argument("--benchmark",
                    help="decontaminate: parquet of the held-out eval set "
                         "(needs --text-col column)")
    ap.add_argument("--ngram", type=int, default=8,
                    help="decontaminate: shingle width")
    ap.add_argument("--splits", default="train:0.9,val:0.1",
                    help="split: name:fraction list, cumulative order")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--shard-tokens", type=int, default=1_000_000,
                    help="shards: token budget per training shard")
    ap.add_argument("--queries",
                    help="ann-batch: parquet of query vectors "
                         "(--vec-id-col, --vec-col columns)")
    ap.add_argument("--topk", type=int, default=10,
                    help="ann-batch: neighbors per query")
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
    elif args.task == "quality-filter":
        from comm_detect_spark.operators.corpus import quality_filter

        quality_filter(
            docs, id_col=args.id_col, text_col=args.text_col,
            min_quality=args.min_quality,
        ).write.mode("overwrite").parquet(args.out)
    elif args.task == "decontaminate":
        if not args.benchmark:
            ap.error("--task decontaminate requires --benchmark")
        from comm_detect_spark.operators.dedup import decontaminate

        bench = spark.read.parquet(args.benchmark)
        decontaminate(
            docs, bench, id_col=args.id_col, text_col=args.text_col,
            bench_text_col=args.text_col, n=args.ngram,
        ).write.mode("overwrite").parquet(args.out)
    elif args.task == "split":
        from comm_detect_spark.operators.corpus import hash_split

        fracs = tuple(
            (part.split(":")[0], float(part.split(":")[1]))
            for part in args.splits.split(",")
        )
        hash_split(
            docs, id_col=args.id_col, fractions=fracs, seed=args.seed
        ).write.mode("overwrite").parquet(args.out)
    elif args.task == "contamination":
        from comm_detect_spark.operators.dedup import ngram_contamination

        if not args.benchmark:
            ap.error("--task contamination requires --benchmark")
        bench = spark.read.parquet(args.benchmark)
        ngram_contamination(
            docs, bench, id_col=args.id_col, text_col=args.text_col,
            bench_text_col=args.text_col, n=args.ngram,
        ).write.mode("overwrite").parquet(args.out)
    elif args.task == "ann-batch":
        from comm_detect_spark.operators.similarity import (
            brute_force_topk_batch,
        )

        if not args.queries:
            ap.error("--task ann-batch requires --queries")
        queries = spark.read.parquet(args.queries)
        brute_force_topk_batch(
            docs, queries, k=args.topk,
            id_col=args.vec_id_col, vec_col=args.vec_col,
            query_id_col=args.vec_id_col, query_vec_col=args.vec_col,
        ).write.mode("overwrite").parquet(args.out)
    elif args.task == "shards":
        from comm_detect_spark.functions.text import token_count
        from comm_detect_spark.operators.corpus import pack_shards
        from pyspark.sql import functions as F

        with_tokens = docs.select(
            F.col(args.id_col).alias("doc_id"),
            token_count(args.text_col).cast("bigint").alias("tokens"),
        )
        pack_shards(
            with_tokens, shard_tokens=args.shard_tokens, seed=args.seed
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
