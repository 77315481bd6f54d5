"""131k-doc extraction scale smoke: generate the web-profile corpus (4× the
scaling-gate size), run the full pipeline to a noop sink, report chunk/error
counts and steady-state docs/sec; rewrites the '## Scale smoke' section of
BENCH/BASELINE.md (other sections preserved).

Usage: python tools/scale_smoke.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    profile = sys.argv[3] if len(sys.argv) > 3 else "web"
    parts = 8 * cores

    from pyspark.sql import functions as F

    from ragflow_spark.operators.extract import extract_chunks
    from ragflow_spark.session import get_spark
    from ragflow_spark.sources.pages import write_pages

    spark = get_spark(app_name="scale_smoke", master=f"local[{cores}]",
                      shuffle_partitions=parts,
                      extra_conf={"spark.ui.enabled": "true",
                                  # explicit heap: see dedup_smoke note
                                  "spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    from ragflow_spark.sources.pages import corpus_cache_name

    path = os.path.join(REPO, ".cache", corpus_cache_name(profile, n_docs))
    gen_sec = None
    if not os.path.exists(path):
        t0 = time.perf_counter()
        write_pages(spark, n_docs, path, parallelism=parts, profile=profile)
        gen_sec = round(time.perf_counter() - t0, 1)
    pages = spark.read.parquet(path)

    cfg = {"ocr_backend": "fake"}  # web rev-2 scanned slice → OCR fallback
    chunks = extract_chunks(pages, num_partitions=parts, template_cfg=cfg)
    stats = chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("error").isNotNull().cast("long")).alias("n_errors"),
        F.countDistinct("url").alias("n_docs"),
    ).first()
    # steady state: the stats pass above is the warm-up
    import urllib.request

    def rest(path):
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
            return json.load(r)

    before = {s["stageId"] for s in rest("/stages?status=complete")}
    t0 = time.perf_counter()
    extract_chunks(pages, num_partitions=parts, template_cfg=cfg) \
        .write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 1)
    dps = round(n_docs / wall, 0)

    # task-skew + spill audit over the timed job's stages: the extraction
    # stage is the one with the most tasks; p99/median executorRunTime
    # bounds straggler impact (gate: ratio <= 3 proves the giant-doc
    # scatter lane works at this scale)
    new_stages = [
        s for s in rest("/stages?status=complete")
        if s["stageId"] not in before
    ]
    skew = None
    spilled = sum(
        s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
        for s in new_stages
    )
    if new_stages:
        big = max(new_stages, key=lambda s: s.get("numCompleteTasks", 0))
        q = rest(
            f"/stages/{big['stageId']}/{big['attemptId']}/taskSummary"
            "?quantiles=0.5,0.99"
        )
        med, p99 = q["executorRunTime"]
        skew = {
            "stage": big["stageId"],
            "tasks": big.get("numCompleteTasks", 0),
            "task_ms_p50": round(med, 1),
            "task_ms_p99": round(p99, 1),
            "p99_over_p50": round(p99 / max(med, 1e-9), 2),
        }

    result = {
        "n_docs": n_docs, "cores": cores, "partitions": parts,
        "n_chunks": int(stats.n_chunks), "n_errors": int(stats.n_errors),
        "docs_covered": int(stats.n_docs),
        "steady_sec": wall, "docs_per_sec": dps,
        "bytes_spilled": int(spilled), "task_skew": skew,
        "profile": profile,
        "gen_sec": gen_sec, "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result))

    skew_line = ""
    if skew:
        skew_line = (
            f"\nTask-skew audit (extraction stage, {skew['tasks']} tasks): "
            f"median task {skew['task_ms_p50']:.0f} ms, p99 "
            f"{skew['task_ms_p99']:.0f} ms → **p99/median = "
            f"{skew['p99_over_p50']}** (gate ≤ 3: "
            f"{'PASS' if skew['p99_over_p50'] <= 3 else 'FAIL'} — the "
            f"size-bucketed giant-doc scatter holds at this scale); "
            f"bytes spilled: {result['bytes_spilled']:,}."
        )
    if profile == "web":
        title = (f"## Scale smoke ({n_docs // 32768}\u00d7 the gate corpus; "
                 "round-2 corpus with TSR tables)")
    else:
        title = (f"## Office-format scale smoke ({profile} profile: "
                 "docx merged cells / pptx tables+groups / xlsx / eml "
                 "in-stream)")
    md = f"""{title}

{n_docs:,} {profile}-profile docs at local[{cores}], {parts} partitions, measured
{result['ts']}: **{result['n_chunks']:,} chunks, {result['n_errors']}
error rows, {wall} s steady-state → {dps:.0f} docs/s**; giant
PDFs bounded by 12-page task windows; ~half the PDFs carry TSR-lite table
pages.{f" (Corpus generation, distributed via mapInPandas: {gen_sec} s.)" if gen_sec else ""}{skew_line}
"""
    out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(out_md):
        prev = open(out_md).read()
        pat = re.compile(
            r"## Scale smoke.*?(?=\n## |\Z)" if profile == "web"
            else r"## Office-format scale smoke.*?(?=\n## |\Z)", re.S)
        if pat.search(prev):
            prev = pat.sub(md.rstrip() + "\n", prev, count=1)
        else:
            prev = prev.rstrip() + "\n\n" + md
        with open(out_md, "w") as f:
            f.write(prev)
        print("updated BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
