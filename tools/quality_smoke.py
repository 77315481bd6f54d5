"""Quality-tier scale smoke: the three corpus-trained/rollup operators
added in r7 — char-bigram LM scoring (operators/lm.py), the NB quality
classifier (operators/clf.py) and the per-host rollup
(weburl.host_stats) — each timed end-to-end on a 1M-doc corpus.

Corpus: the dedup-smoke corpus (planted near-dups + identical
boilerplate, deterministic) with host/lang columns derived natively from
doc_id (4,096 hosts; 5 langs) — boilerplate copies land on every 64th
doc, so hosts see real dup-loser shares.

Prints one JSON line and rewrites the '## Quality-tier smoke' section of
BENCH/BASELINE.md (other sections preserved — keep manual notes under
their own ## headers).

Usage: python tools/quality_smoke.py [n_docs] [cores]
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from ragflow_spark.operators import clf, lm, weburl
    from ragflow_spark.session import get_spark
    from tools.dedup_smoke import build_corpus

    spark = get_spark(app_name="quality_smoke", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(REPO, ".cache", f"dedup_docs_{n_docs}.parquet")
    if not os.path.exists(path):
        build_corpus(spark, n_docs, path, parallelism=4 * cores)
    docs = spark.read.parquet(path).select(
        "doc_id", "text",
        F.concat(F.lit("host"), (F.col("doc_id") % 4096).cast("string"))
        .alias("source"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("en", "de", "fr", "zh", "es")]),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ).alias("lang"),
    )
    docs.count()  # warm the scan cache / JIT before timing

    result: dict = {"n_docs": n_docs, "cores": cores}

    t0 = time.perf_counter()
    scored = lm.charlm_score_corpus(docs, "doc_id", "text")
    result["charlm_rows"] = scored.count()
    result["charlm_sec"] = round(time.perf_counter() - t0, 2)

    # the 100 TB path: train on a 1% deterministic hash sample
    t0 = time.perf_counter()
    sampled = lm.charlm_score_corpus(docs, "doc_id", "text", train_frac=0.01)
    result["charlm_frac_rows"] = sampled.count()
    result["charlm_frac_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    nb = clf.nb_quality_clf(docs, "doc_id", "text")
    agg = nb.agg(
        F.count(F.lit(1)).alias("n"), F.sum("pred").alias("pos")
    ).first()
    result["clf_rows"] = int(agg["n"])
    result["clf_pred_pos"] = int(agg["pos"])
    result["clf_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    hs = weburl.host_stats(docs, "source", "doc_id", "text")
    hrows = hs.persist()
    result["host_rows"] = hrows.count()
    result["hosts_dropped"] = hrows.filter(F.col("host_keep") == 0).count()
    result["host_sec"] = round(time.perf_counter() - t0, 2)
    hrows.unpersist()

    result["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    print(json.dumps(result))

    rate = lambda s: f"{n_docs / s:,.0f}"  # noqa: E731
    md = f"""## Quality-tier smoke ({n_docs:,} docs, local[{cores}])

Dedup-smoke corpus (every 64th doc identical boilerplate, every 16th a
near-dup) with 4,096 derived hosts and 5 langs. Measured {result['ts']}:

| operator | wall sec | docs/s | output |
|---|---|---|---|
| charlm_score_corpus (train full corpus + score) | {result['charlm_sec']} | {rate(result['charlm_sec'])} | {result['charlm_rows']:,} scored |
| charlm_score_corpus (train_frac=0.01 hash sample) | {result['charlm_frac_sec']} | {rate(result['charlm_frac_sec'])} | {result['charlm_frac_rows']:,} scored |
| nb_quality_clf (train + score, B=4096) | {result['clf_sec']} | {rate(result['clf_sec'])} | {result['clf_pred_pos']:,} pred-positive |
| host_stats (fp window + host rollup) | {result['host_sec']} | {rate(result['host_sec'])} | {result['host_rows']:,} hosts, {result['hosts_dropped']:,} dropped |

Shapes that make these flat at 100 TB: both trainers collect O(model)
(1,444 / 4,096 int64 rows) independent of corpus size and scoring is a
zero-shuffle Arrow pass; ``train_frac`` makes the training read a
deterministic hash sample (the LM/classifier saturate long before 1%);
host_stats is one fp-window shuffle + one (host, lang) pre-aggregation
that collapses the corpus to hosts x langs rows before the rollup.
"""
    out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(out_md):
        prev = open(out_md).read()
        marker = "## Quality-tier smoke"
        if marker in prev:
            pat = re.compile(r"## Quality-tier smoke.*?(?=\n## |\Z)", re.S)
            nxt = pat.sub(md.rstrip() + "\n", prev)
        else:
            nxt = prev.rstrip() + "\n\n" + md
        with open(out_md, "w") as f:
            f.write(nxt)


if __name__ == "__main__":
    main()
