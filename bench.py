#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "docs_per_sec": ..., "pages_docs": ...}

The extraction benchmark reads a pre-generated pages corpus from
.cache/ (built once, deterministic, sized to the sf) so the timed section
measures the pipeline, not corpus synthesis. Every query is forced with a
noop write → full materialization, no collect-to-driver skew.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    # pages corpus sized to sf: 4096 docs at sf0.1
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", str(max(256, int(40960 * sf)))))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ragflow_spark.session import get_spark
    from ragflow_spark.sources.pages import write_pages
    from ragflow_spark.operators.extract import extract_chunks
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="ragflow_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    pages_path = os.path.join(cache_dir, f"pages_web_{n_pages}.parquet")
    if not os.path.exists(pages_path):
        write_pages(spark, n_pages, pages_path, parallelism=cpus, profile="web")

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    def bench(name, fn):
        fn()  # untimed warm pass: JVM JIT + python-worker imports
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    pages = spark.read.parquet(pages_path)
    bench("extract_pages", lambda: _force(
        extract_chunks(pages, num_partitions=max(2 * cpus, 32))
    ))

    for name in (
        "doc_exact_dedup", "doc_minhash_pairs", "doc_simhash",
        "doc_ngram_jaccard", "doc_lang_id", "doc_quality", "doc_token_stats",
        "emb_cosine_topk", "emb_ivf_topk", "emb_near_dup",
        "events_hourly", "events_sessions",
        "tpch_pricing_summary", "tpch_revenue_by_nation",
        "doc_winnow_fp",
    ):
        bench(name, lambda name=name: _force(qs[name](spark, sf_dir)))

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_pages / timings["extract_pages"], 2)
    print(json.dumps({
        "metric": "extraction+dedup+similarity+stats wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pages_docs": n_pages,
        "docs_per_sec": docs_per_sec,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
