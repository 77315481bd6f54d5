#!/usr/bin/env python
"""Capture .explain("formatted") for declared/bench queries WITHOUT
forcing execution (plan evidence for OPTIMIZATION_r08.md; bench_extra.py
stays the timing harness).

Usage: python tools/capture_plans.py --out plans/r08 --suffix after \
         [--sf-dir /root/testdata/sf0.1] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r08")
    ap.add_argument("--suffix", default="after")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from ragflow_spark.session import get_spark
    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="ragflow_spark_plans",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**entrymod.legacy_bench_queries(), **entrymod.queries()}
    os.makedirs(os.path.join(repo, args.out), exist_ok=True)
    from ragflow_spark.operators.dedup import release

    for name in args.queries:
        if name == "extract_pages":
            from ragflow_spark.operators.extract import extract_chunks
            from ragflow_spark.sources.pages import (
                corpus_cache_name, write_pages)

            n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "4096"))
            cache_dir = os.path.join(repo, ".cache")
            pages_path = os.path.join(
                cache_dir, corpus_cache_name("web", n_pages))
            if not os.path.exists(pages_path):
                write_pages(spark, n_pages, pages_path,
                            parallelism=cpus, profile="web")
            df = extract_chunks(
                spark.read.parquet(pages_path),
                num_partitions=max(2 * cpus, 32),
                template_cfg={"ocr_backend": "fake"})
        else:
            df = qs[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(repo, args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        release(df)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
