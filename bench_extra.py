#!/usr/bin/env python
"""Per-query isolation bench (optimization guide §1.1/§1.4) — NOT the
driver contract; bench.py stays the frozen measurement harness.

Times individual declared queries with the noop sink (full
materialization, no collect skew), one untimed warm pass + N timed reps,
and optionally writes `.explain("formatted")` plan captures. Used to
isolate where each query's wall goes and to produce before/after evidence
for OPTIMIZATION_r08.md without touching bench.py.

Usage:
  python bench_extra.py [--sf-dir /root/testdata/sf1.0] [--reps 2]
                        [--plans plans/r08 --plan-suffix before]
                        query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<suffix>.txt plans")
    ap.add_argument("--plan-suffix", default="before")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ragflow_spark.session import get_spark
    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="ragflow_spark_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**entrymod.legacy_bench_queries(), **entrymod.queries()}

    from ragflow_spark.operators.dedup import release

    out = {}
    for name in args.queries:
        if name == "extract_pages":
            from ragflow_spark.operators.extract import extract_chunks
            from ragflow_spark.sources.pages import (
                corpus_cache_name, write_pages)

            n_pages = int(os.environ.get(
                "SPARK_GRAFT_PAGES",
                str(max(256, int(40960 * float(
                    args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]))))))
            cache_dir = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".cache")
            pages_path = os.path.join(
                cache_dir, corpus_cache_name("web", n_pages))
            if not os.path.exists(pages_path):
                write_pages(spark, n_pages, pages_path,
                            parallelism=cpus, profile="web")
            pages = spark.read.parquet(pages_path)

            def fn(pages=pages):
                return extract_chunks(
                    pages, num_partitions=max(2 * cpus, 32),
                    template_cfg={"ocr_backend": "fake"})
        else:
            fn = lambda name=name: qs[name](spark, args.sf_dir)

        spark.sparkContext.setJobDescription(f"bench_extra:{name}:warm")
        handles = [fn()]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = handles[0]._sc._jvm.PythonSQLUtils.explainString(
                handles[0]._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans,
                    f"{name}_{args.plan_suffix}.txt"), "w") as f:
                f.write(plan)
        _force(handles[0])
        walls = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:{i}")
            t0 = time.perf_counter()
            df = fn()
            _force(df)
            walls.append(round(time.perf_counter() - t0, 3))
            handles.append(df)
        for df in handles:
            release(df)
        walls.sort()
        mid = len(walls) // 2
        med = walls[mid] if len(walls) % 2 else (
            walls[mid - 1] + walls[mid]) / 2
        out[name] = {"median": round(med, 3), "reps": walls}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"sf_dir": args.sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
