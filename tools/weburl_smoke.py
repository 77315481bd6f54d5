"""URL-tier scale smoke: canonicalization + crawl-ingest dedup + per-host
cap at 1M rows, with planted structure so every operator's output is
checkable, not just timed:

- every odd row is a re-fetch of its even predecessor under tracking
  noise and a newer ts (url_dedup_latest must collapse each pair and
  keep the newer fetch)
- ~2k site hosts (~512 docs each) plus ONE mega-host ('spamfarm',
  n/64 rows) as the skew lane cap_per_host(64) must crush

Prints one JSON line and rewrites the '## URL tier scale smoke' section
of BENCH/BASELINE.md (other sections preserved).

Usage: python tools/weburl_smoke.py [n_rows] [cores]
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

    from ragflow_spark.operators import weburl
    from ragflow_spark.session import get_spark

    spark = get_spark(app_name="weburl_smoke", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    spark.sparkContext.setLogLevel("ERROR")

    i = F.col("id")
    base = i - (i % 2)  # pair (2k, 2k+1) shares a page
    # keyed on base (not i) so both members of a re-fetch pair share the
    # host: every 64th PAIR lands on the mega-host -> n/64 rows
    host = F.when(base % 128 == 2, F.lit("spamfarm")).otherwise(
        F.concat(F.lit("site"), (base % 4096).cast("string")))
    raw = F.concat(
        F.when(i % 3 == 0, F.lit("HTTPS://WWW.")).otherwise(
            F.lit("https://www.")),
        host, F.lit(".com"),
        F.when(i % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"), base.cast("string"),
        F.when(i % 2 == 1, F.lit("?utm_source=rss&fbclid=x")).otherwise(
            F.lit("")),
    )
    pages = spark.range(0, n, 1, 4 * cores).select(
        i.alias("doc_id"), raw.alias("url"),
        (F.lit(1_700_000_000) + i).cast("timestamp").alias("warc_ts"),
    ).persist()
    pages.count()

    result: dict = {"n_rows": n, "cores": cores}

    t0 = time.perf_counter()
    n_canon = pages.select(
        weburl.canonical_url(F.col("url")).alias("c")
    ).agg(F.countDistinct("c")).first()[0]
    result["canon_distinct"] = n_canon
    result["canon_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    kept = weburl.url_dedup_latest(pages, "url", "warc_ts")
    n_kept = kept.count()
    result["dedup_kept"] = n_kept
    result["dedup_sec"] = round(time.perf_counter() - t0, 2)
    # every (2k, 2k+1) pair collapses to the ODD row (newer ts)
    odd_kept = kept.filter(F.col("doc_id") % 2 == 1).count()
    assert n_kept == n // 2 and odd_kept == n_kept, (n_kept, odd_kept)

    t0 = time.perf_counter()
    capped = weburl.cap_per_host(pages, "url", 64)
    n_capped = capped.count()
    spam_left = capped.filter(
        F.col("url").contains("spamfarm")).count()
    result["cap_survivors"] = n_capped
    result["cap_spamhost_survivors"] = spam_left
    result["cap_sec"] = round(time.perf_counter() - t0, 2)
    assert spam_left == 64, spam_left

    # URL quality scrub: every 33rd row gains a hard bank word in its
    # path, every 7th (not also 33rd) three soft words — the expected
    # fail set is exact arithmetic, so the 1M verdict is asserted not
    # just timed
    t0 = time.perf_counter()
    noisy = pages.select(
        "doc_id",
        F.concat(
            F.col("url"),
            F.when(F.col("doc_id") % 33 == 0, F.lit("/viagra")).when(
                F.col("doc_id") % 7 == 0, F.lit("/adult-dating-webcam")
            ).otherwise(F.lit("")),
        ).alias("url"),
    )
    flagged = weburl.url_quality_flags(noisy, "url", id_col="doc_id")
    n_fail = flagged.filter(F.col("url_keep") == 0).count()
    result["urlq_fail"] = n_fail
    result["urlq_sec"] = round(time.perf_counter() - t0, 2)
    expected_fail = len([k for k in range(n) if k % 33 == 0 or k % 7 == 0])
    assert n_fail == expected_fail, (n_fail, expected_fail)

    pages.unpersist()
    result["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    print(json.dumps(result))

    md = f"""## URL tier scale smoke ({n:,} rows, local[{cores}])

Planted structure: every odd row is a tracking-noise re-fetch of its
even predecessor at a newer ts; one mega-host ('spamfarm', ~{n // 64:,}
rows) stresses the cap's skew lane. Measured {result['ts']}:

| operator | wall sec | check |
|---|---|---|
| canonical_url (countDistinct) | {result['canon_sec']} | {result['canon_distinct']:,} distinct canonicals |
| url_dedup_latest (newest fetch per canonical) | {result['dedup_sec']} | kept exactly the {result['dedup_kept']:,} newer fetches (asserted) |
| cap_per_host(64) | {result['cap_sec']} | mega-host crushed to 64 survivors (asserted), {result['cap_survivors']:,} total |
| url_quality_flags (word-score scrub) | {result['urlq_sec']} | {result['urlq_fail']:,} planted bad URLs failed (exact count asserted) |

canonical_url is a pure codegen projection (no shuffle); the dedup and
cap are each ONE window shuffle on their key. The mega-host funnels into
a single partition only for its rank pass — rows past the cap drop
inside the window stage, nothing else moves. The quality scrub is a
two-level shuffle-free projection (word array + host staged once per
row, the bank scores over the staged columns).
"""
    out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(out_md):
        prev = open(out_md).read()
        marker = "## URL tier scale smoke"
        if marker in prev:
            pat = re.compile(r"## URL tier scale smoke.*?(?=\n## |\Z)", re.S)
            prev = pat.sub(md.rstrip() + "\n", prev)
        else:
            prev = prev.rstrip() + "\n\n" + md
        with open(out_md, "w") as f:
            f.write(prev)
        print("updated BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
