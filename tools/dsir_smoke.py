"""DSIR scale smoke: importance-resample 1M synthetic docs toward a
16k-doc target slice, with planted structure so the selection is
checkable, not just timed:

- raw docs alternate between an ON-TOPIC vocabulary (the target's) and
  an OFF-TOPIC one, with per-doc salt tokens for hash variety
- the target corpus uses only the on-topic vocabulary
- checks: the Gumbel top-k is overwhelmingly on-topic (weights dominate
  the noise by construction), every raw doc got a weight, and the ratio
  model stays O(B)

Prints one JSON line and rewrites the '## DSIR scale smoke' section of
BENCH/BASELINE.md (other sections preserved).

Usage: python tools/dsir_smoke.py [n_rows] [cores]
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
    nb, k = 10_000, 10_000

    from ragflow_spark.operators import dsir
    from ragflow_spark.session import get_spark

    spark = get_spark(app_name="dsir_smoke", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    spark.sparkContext.setLogLevel("ERROR")

    i = F.col("id")
    on = F.concat(
        F.lit("markets bonds yields trading finance report quarter "),
        F.lit("earnings margin outlook guidance segment topic"),
        (i % 97).cast("string"),
    )
    off = F.concat(
        F.lit("recipes flour sugar butter oven whisk bake cook "),
        F.lit("kitchen dinner garnish season flavor topic"),
        (i % 89).cast("string"),
    )
    raw = spark.range(0, n, 1, 4 * cores).select(
        i.alias("doc_id"),
        F.when(i % 2 == 1, on).otherwise(off).alias("text"),
    )
    target = spark.range(0, 16_384, 1, cores).select(
        (F.col("id") + n).alias("doc_id"),
        F.concat(
            F.lit("markets bonds yields trading finance report "),
            F.lit("quarter earnings outlook topic"),
            (F.col("id") % 97).cast("string"),
        ).alias("text"),
    )

    result: dict = {"n_rows": n, "cores": cores, "num_buckets": nb,
                    "k": k}

    t0 = time.perf_counter()
    # persisted: the model-fit collect materializes the featurized frame,
    # the weight pass reads the cache — one corpus pass (dsir.py docstring)
    raw_dbc = dsir.doc_bucket_counts(raw, "doc_id", "text", nb).persist()
    raw_counts = raw_dbc.groupBy("bucket").agg(F.sum("n").alias("n"))
    tgt_g = dsir.gram_buckets(target, "doc_id", "text", nb)
    ratios = dsir.dsir_log_ratios(
        dsir.bucket_counts(tgt_g), raw_counts, nb)
    n_model = ratios.count()
    result["model_sec"] = round(time.perf_counter() - t0, 2)
    result["model_buckets"] = int(n_model)
    assert n_model <= nb

    t0 = time.perf_counter()
    w = dsir.dsir_weights(raw_dbc, ratios, "doc_id")
    sel = dsir.dsir_resample(w, "doc_id", k=k).collect()
    result["select_sec"] = round(time.perf_counter() - t0, 2)
    raw_dbc.unpersist()
    result["docs_per_sec"] = round(
        n / (result["model_sec"] + result["select_sec"]), 1)

    on_topic = sum(1 for r in sel if r.doc_id % 2 == 1)
    result["selected_on_topic"] = on_topic
    assert len(sel) == k, len(sel)
    assert on_topic >= int(0.99 * k), on_topic

    result["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    print(json.dumps(result))

    md = f"""## DSIR scale smoke ({n:,} docs, local[{cores}])

Raw docs alternate on-topic (target vocabulary) / off-topic; B={nb:,}
hashed unigram+bigram buckets; Gumbel top-{k:,} selection. Measured
{result['ts']}:

| phase | wall sec | check |
|---|---|---|
| model fit (two count passes -> driver λ) | {result['model_sec']} | {result['model_buckets']:,} populated buckets (≤ B) |
| weights + Gumbel top-k | {result['select_sec']} | {result['selected_on_topic']:,}/{k:,} selected docs on-topic (≥99% asserted) |

End-to-end {result['docs_per_sec']:,} docs/s. Plan shape: gram strings
die map-side into int buckets; the (doc, bucket) count frame is
PERSISTED so the model-fit collect materializes it and the weight pass
reads the cache — the raw corpus is featurized exactly once (at crawl
scale the same two-phase shape writes that slim frame to a table
between jobs); λ is an O(B) driver-computed broadcast; the top-k is
TakeOrderedAndProject. Driver holds O(B) + the k selected rows,
independent of corpus size.
"""
    out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(out_md):
        prev = open(out_md).read()
        marker = "## DSIR scale smoke"
        if marker in prev:
            pat = re.compile(r"## DSIR scale smoke.*?(?=\n## |\Z)", re.S)
            prev = pat.sub(md.rstrip() + "\n", prev)
        else:
            prev = prev.rstrip() + "\n\n" + md
        with open(out_md, "w") as f:
            f.write(prev)
        print("updated BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
