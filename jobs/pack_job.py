#!/usr/bin/env python
"""Cluster entrypoint for sequence packing — the last planning pass
before tokenized shards are written: turn a curated document table into
a (window_id, doc, slice) plan at a fixed context length.

    spark-submit --py-files dist/ragflow_spark.zip jobs/pack_job.py \
        --input  <curated docs parquet: id/text or id/n_tokens> \
        --output <window plan parquet> \
        [--ctx-len 2048] [--id-col doc_id] [--text-col text]
        [--tokens-col n_tokens] [--bucket-span 1048576]
        [--stats <path>]

If ``--tokens-col`` exists in the input it is used as-is (the tokenized
pipeline already counted); otherwise counts come from the whitespace
token contract over ``--text-col``. The output is partitioned by
``window_id`` range buckets so a training loader reads its shard's
windows with one partition-pruned scan. ``--stats`` additionally writes
the per-window fill audit (every window must be exactly full except the
last — asserted here before the job exits).

Build the zip with: python tools/package.py
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--ctx-len", type=int, default=2048)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--tokens-col", default="n_tokens")
    ap.add_argument("--bucket-span", type=int, default=1 << 20)
    ap.add_argument("--stats", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ragflow_spark.functions.text import token_count
    from ragflow_spark.operators.packing import (
        pack_windows,
        window_fill_stats,
    )
    from ragflow_spark.session import get_spark

    spark = get_spark(app_name="ragflow_spark_pack")
    docs = spark.read.parquet(args.input)
    if args.tokens_col in docs.columns:
        counted = docs.select(args.id_col, args.tokens_col)
    else:
        counted = docs.select(
            args.id_col,
            token_count(F.col(args.text_col)).alias(args.tokens_col),
        )

    packed = pack_windows(
        counted, args.id_col, args.tokens_col, args.ctx_len,
        bucket_span=args.bucket_span,
    )
    # range-bucket the plan by window so a loader's shard read is one
    # partition-pruned scan (1024 windows per file group)
    packed.withColumn(
        "window_bucket", (F.col("window_id") / 1024).cast("long")
    ).write.mode("overwrite").partitionBy("window_bucket").parquet(
        args.output
    )

    plan = spark.read.parquet(args.output)
    stats = window_fill_stats(plan, args.ctx_len)
    bad = stats.filter(~F.col("is_full")).count()
    if args.stats:
        stats.write.mode("overwrite").parquet(args.stats)
    if bad > 1:
        raise SystemExit(
            f"packing invariant violated: {bad} non-full windows")
    spark.stop()


if __name__ == "__main__":
    main()
