"""Diagnose the curate+pii superadditive slowdown (r7): verified cause is
JVM regex JIT profile pollution between the EMAIL pattern and [^\\w\\s].
This run checks (a) the translate() rewrite of punct_ratio is fast beside
EMAIL, (b) whether curate's other regexes (\\s+ replace, \\s+ split,
stopword alternation) also pair badly with EMAIL.

Usage: python tools/diag_pii_codegen.py [n_docs] [cores]
"""
from __future__ import annotations

import os
import string
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
WORD_WS = string.ascii_letters + string.digits + "_ \t\n\x0b\f\r"
STOP = r"\b(?:the|and|of|to|in|is|you|that|it|he|was|for|on|are)\b"


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from dedup_smoke import build_corpus
    from ragflow_spark.session import get_spark

    spark = get_spark(app_name="diag_pii", master=f"local[{cores}]",
                      shuffle_partitions=2 * cores,
                      extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(REPO, ".cache", f"dedup_docs_{n_docs}.parquet")
    if not os.path.exists(path):
        build_corpus(spark, n_docs, path, parallelism=2 * cores)
    docs = spark.read.parquet(path).select("doc_id", "text")
    c = F.col("text")

    exprs = {
        "cnt_email": F.regexp_count(c, F.lit(EMAIL)),
        "punct_translate": F.length(F.translate(c, WORD_WS, "")),
        "punct_regex": F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", "")),
        "ws_replace": F.length(F.regexp_replace(c, r"\s+", "")),
        "ws_translate": F.length(F.translate(c, " \t\n\x0b\f\r", "")),
        "ws_split": F.size(F.split(F.trim(c), r"\s+")),
        "stopwords": F.size(F.regexp_extract_all(F.lower(c), F.lit(STOP), F.lit(0))),
    }

    def timed(df):
        df.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    solo = {}
    for name, e in exprs.items():
        solo[name] = timed(docs.select("doc_id", e.alias("x")))
        print(f"solo {name:16s} {solo[name]:7.2f}", flush=True)

    for name in list(exprs)[1:]:
        w = timed(docs.select("doc_id", exprs["cnt_email"].alias("a"),
                              exprs[name].alias("b")))
        flag = " <<<" if w > 2.0 * (solo["cnt_email"] + solo[name]) else ""
        print(f"pair email+{name:16s} {w:7.2f} "
              f"(sum {solo['cnt_email']+solo[name]:.2f}){flag}", flush=True)

    # equivalence check: translate rewrites must be bit-identical
    eq = docs.select(
        (exprs["punct_translate"] == exprs["punct_regex"]).alias("p"),
        (exprs["ws_translate"] == exprs["ws_replace"]).alias("w"),
    ).agg(F.min("p").alias("p"), F.min("w").alias("w")).first()
    print(f"equivalence punct={eq.p} ws={eq.w}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
