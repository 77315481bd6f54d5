"""PII-scrub scale smoke (VERDICT r6 #6): run the native regexp bank over
a 1M-doc corpus and record steady-state throughput — the scrub is one
codegen projection (zero shuffles, zero UDFs), so its wall should track
scan+regex cost linearly and hold at any cluster width.

Reuses the dedup smoke's deterministic corpus (planted dups are irrelevant
here — it's 1M realistic-length text rows); PII density comes from the
fixture text plus an appended synthetic email/phone/IP per 8th doc so every
category's counter path executes.

Prints one JSON line and rewrites the '## PII scrub smoke' section of
BENCH/BASELINE.md (other sections preserved).

Usage: python tools/pii_smoke.py [n_docs] [cores]
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from dedup_smoke import build_corpus

    from ragflow_spark.operators.curate import curate
    from ragflow_spark.operators.pii import pii_scrub
    from ragflow_spark.session import get_spark

    spark = get_spark(app_name="pii_smoke", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores,
                      extra_conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(REPO, ".cache", f"dedup_docs_{n_docs}.parquet")
    if not os.path.exists(path):
        build_corpus(spark, n_docs, path, parallelism=4 * cores)
    docs = spark.read.parquet(path).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 8 == 0,
            F.concat(
                F.col("text"),
                F.lit(" mail u"), F.col("doc_id").cast("string"),
                F.lit("@example.com call 555-123-4567 at 10.0.0.")
                , (F.col("doc_id") % 256).cast("string"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )

    result: dict = {"n_docs": n_docs, "cores": cores}

    def timed(tag, df):
        # warm pass (JIT + scan cache), then steady-state noop write
        df.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        result[f"{tag}_sec"] = round(time.perf_counter() - t0, 2)
        result[f"{tag}_docs_per_sec"] = round(
            n_docs / result[f"{tag}_sec"], 0)

    timed("pii_scrub", pii_scrub(docs, "doc_id", "text"))
    timed("curate", curate(docs, "doc_id", "text"))

    hits = pii_scrub(docs, "doc_id", "text").agg(
        F.sum("pii_hits").alias("total"),
        *[F.sum(f"{c}_hits").alias(c)
          for c in ("email", "ip", "ssn", "card", "phone")],
    ).first()
    result["total_hits"] = int(hits.total)
    result["hits_by_category"] = {
        c: int(hits[c]) for c in ("email", "ip", "ssn", "card", "phone")
    }
    result["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    print(json.dumps(result))

    md = f"""## PII scrub smoke ({n_docs:,} docs, local[{cores}])

Measured {result['ts']}; steady-state noop-write walls (one untimed warm
pass each). The scrub is ONE whole-stage-codegen projection — staged
regexp_count+regexp_replace per category, no shuffle, no UDF — so the
wall is scan+regex cost and scales with input bytes.

| pass | wall sec | docs/s |
|---|---|---|
| pii_scrub (5-category counters + scrub_md5) | {result['pii_scrub_sec']} | {result['pii_scrub_docs_per_sec']:,.0f} |
| curate() incl. pii_hits signal (full keep/drop pipeline) | {result['curate_sec']} | {result['curate_docs_per_sec']:,.0f} |

Hits found: {result['total_hits']:,} total — {json.dumps(result['hits_by_category'])}
(every 8th doc carries a planted email+phone+IP; the rest is organic
fixture text, mostly zero).
"""
    out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(out_md):
        prev = open(out_md).read()
        marker = "## PII scrub smoke"
        if marker in prev:
            pat = re.compile(r"## PII scrub smoke.*?(?=\n## |\Z)", re.S)
            prev = pat.sub(md.rstrip() + "\n", prev)
        else:
            prev = prev.rstrip() + "\n\n" + md
        with open(out_md, "w") as f:
            f.write(prev)
        print("updated BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
