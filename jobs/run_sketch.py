"""spark-submit entry point for the sketch quartet.

Mergeable summaries over any keyed/valued parquet (operators/{anf,cms,
bloom,histogram}.py) — the per-day fleet jobs of a 100 TB pipeline, each
one map-side-combined aggregation whose output size is independent of
input size:

    # count-min frequency sketch (d x w counter cells):
    spark-submit --py-files comm_detect_spark.zip jobs/run_sketch.py \
        --sketch cms --in /data/events.parquet --key user_id \
        --out /data/cms --depth 4 --width 1024

    # Bloom membership filter (64-bit words):
    ... --sketch bloom --key user_id --num-bits 65536 --num-hashes 4 ...

    # FM approximate-distinct b_sums per hour window:
    ... --sketch fm --key user_id --ts-col ts --trials 32 ...

    # fixed-bin value histogram (optionally grouped):
    ... --sketch hist --value-col value --bin-width 0.5 --group-col \
        event_type ...

All four are deterministic (md5-seeded / pure floor binning): re-running
any job on the same input writes byte-identical parquet, and partial
outputs from disjoint input splits merge by cell-sum / bit_or.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sketch", required=True,
                    choices=["cms", "bloom", "fm", "hist"])
    ap.add_argument("--in", dest="inp", required=True,
                    help="input parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--key", default="user_id",
                    help="key column (cms/bloom/fm)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--depth", type=int, default=4, help="cms rows")
    ap.add_argument("--width", type=int, default=1024, help="cms buckets")
    ap.add_argument("--weight-col", default=None,
                    help="cms: count this column instead of 1 per row")
    ap.add_argument("--num-bits", type=int, default=65536, help="bloom m")
    ap.add_argument("--num-hashes", type=int, default=4, help="bloom k")
    ap.add_argument("--ts-col", default="ts", help="fm window column")
    ap.add_argument("--trials", type=int, default=32,
                    help="fm trials (variance ~ 1/sqrt)")
    ap.add_argument("--value-col", default="value", help="hist column")
    ap.add_argument("--bin-width", type=float, default=1.0)
    ap.add_argument("--group-col", default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.appName(
        f"comm-detect-sketch-{args.sketch}"
    ).getOrCreate()
    df = spark.read.parquet(args.inp)

    if args.sketch == "cms":
        from comm_detect_spark.operators.cms import cms_sketch

        out = cms_sketch(df, args.key, depth=args.depth, width=args.width,
                         seed=args.seed, weight_col=args.weight_col)
    elif args.sketch == "bloom":
        from comm_detect_spark.operators.bloom import bloom_build

        out = bloom_build(df, args.key, num_bits=args.num_bits,
                          num_hashes=args.num_hashes, seed=args.seed)
    elif args.sketch == "fm":
        from comm_detect_spark.operators.anf import windowed_distinct_b_sums

        out = windowed_distinct_b_sums(df, ts_col=args.ts_col,
                                       key_col=args.key,
                                       trials=args.trials)
    else:
        from comm_detect_spark.operators.histogram import binned_histogram

        out = binned_histogram(df, args.value_col,
                               bin_width=args.bin_width,
                               group_col=args.group_col)
    out.write.mode("overwrite").parquet(args.out)
    spark.stop()


if __name__ == "__main__":
    main()
