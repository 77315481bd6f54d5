"""Sequence-packing scale smoke: plan 1M docs into ctx_len=2048 windows,
with planted structure so the output is checkable, not just timed:

- token counts are a deterministic hash mix in [1, 997] — every window
  boundary lands mid-document somewhere, exercising straddle fan-out
- every 131072nd doc is a 4M-token GIANT (straddles ~2048 windows) —
  the explode skew lane
- checks (all distributed aggregates, no collect): window count equals
  ceil(total_tokens / ctx), slice lengths sum back to total_tokens,
  every window except the last is exactly full

Prints one JSON line and rewrites the '## Sequence packing scale smoke'
section of BENCH/BASELINE.md (other sections preserved).

Usage: python tools/packing_smoke.py [n_rows] [cores]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ctx = 2048

    from ragflow_spark.operators.packing import (
        pack_windows,
        window_fill_stats,
    )
    from ragflow_spark.session import get_spark

    spark = get_spark(app_name="packing_smoke", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    spark.sparkContext.setLogLevel("ERROR")

    i = F.col("id")
    toks = F.when(i % 131072 == 7, F.lit(4_194_304)).otherwise(
        1 + F.pmod(i * 2654435761, F.lit(997))
    )
    docs = spark.range(0, n, 1, 4 * cores).select(
        i.alias("doc_id"), toks.cast("long").alias("n_tokens")
    ).persist()
    total_tokens = docs.agg(F.sum("n_tokens")).first()[0]
    n_giants = docs.filter(F.col("n_tokens") > 1_000_000).count()

    result: dict = {"n_rows": n, "cores": cores, "ctx_len": ctx,
                    "total_tokens": int(total_tokens),
                    "n_giant_docs": int(n_giants)}

    # bucket_span sized for this id range: ~512 buckets -> the totals
    # frame is 512 rows, the corpus window runs 512-way parallel
    span = max(n // 512, 1)
    t0 = time.perf_counter()
    packed = pack_windows(docs, "doc_id", "n_tokens", ctx,
                          bucket_span=span)
    packed.write.format("noop").mode("overwrite").save()
    result["pack_sec"] = round(time.perf_counter() - t0, 2)
    result["docs_per_sec"] = round(n / result["pack_sec"], 1)

    t0 = time.perf_counter()
    n_rows_out = packed.count()
    agg = packed.agg(
        F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("toks"),
        (F.max("window_id") + 1).alias("n_windows"),
    ).first()
    stats = window_fill_stats(packed, ctx)
    not_full = stats.filter(~F.col("is_full")).count()
    result["check_sec"] = round(time.perf_counter() - t0, 2)
    result["overlap_rows"] = int(n_rows_out)
    result["n_windows"] = int(agg["n_windows"])

    expect_windows = -(-total_tokens // ctx)
    assert agg["toks"] == total_tokens, (agg["toks"], total_tokens)
    assert agg["n_windows"] == expect_windows, (agg["n_windows"],
                                                expect_windows)
    assert not_full <= 1, not_full
    docs.unpersist()

    result["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    print(json.dumps(result))

    md = f"""## Sequence packing scale smoke ({n:,} docs, local[{cores}])

Token counts are a hash mix in [1, 997] plus {n_giants} planted 4M-token
giants (each straddling ~2048 windows — the explode skew lane);
ctx_len={ctx}, bucket_span={span:,} (~512 buckets). Measured
{result['ts']}:

| phase | wall sec | check |
|---|---|---|
| pack_windows plan + noop write | {result['pack_sec']} ({result['docs_per_sec']:,} docs/s) | {result['overlap_rows']:,} (doc, window) rows |
| distributed invariant audit | {result['check_sec']} | {result['n_windows']:,} windows = ceil({result['total_tokens']:,} / {ctx}); slice lengths sum back exactly; every window full except the last (asserted) |

Plan shape at this size: one Window partitioned by bucket (parallel),
one unpartitioned Window over the 512-row totals frame, one broadcast
join back, explode fan-out proportional to output. The giants cost rows
only in THEIR output slices — no shuffle grows with the straddle count.
"""
    out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(out_md):
        prev = open(out_md).read()
        marker = "## Sequence packing scale smoke"
        if marker in prev:
            pat = re.compile(
                r"## Sequence packing scale smoke.*?(?=\n## |\Z)", re.S)
            prev = pat.sub(md.rstrip() + "\n", prev)
        else:
            prev = prev.rstrip() + "\n\n" + md
        with open(out_md, "w") as f:
            f.write(prev)
        print("updated BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
