"""Incremental-dedup scale smoke: a 64k crawl increment probed against a
1M-doc historical store, demonstrating the O(increment) claim — the
probe never re-mines (or rereads) history.

History: the dedup_smoke corpus (reused from .cache if present — build it
with `python tools/dedup_smoke.py 1048576 32` first for identical docs).
Its stores (exact fp table + minhash signature table) are written to
parquet ONCE (the per-snapshot cost), then the increment probes them.

Increment (deterministic, ids 2_000_000+):
- every 64th doc is the history boilerplate (exact hit on the 16k-copy
  group; the minhash probe's hot-band guard must DROP its buckets)
- every other 16th doc is a verbatim copy of a unique history doc
  (exact hit + minhash est=1.0 pair)
- everything else is fresh unique filler (no hits)

Prints one JSON line and rewrites the '## Incremental dedup smoke'
section of BENCH/BASELINE.md (other sections preserved).

Usage: python tools/incremental_smoke.py [n_history] [n_new] [cores]
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


def build_increment(spark, n_new: int, n_history: int, path: str,
                    parallelism: int) -> None:
    import pandas as pd

    def gen(batches):
        import random

        from ragflow_spark.sources.pages import _sentences

        boiler = ("all rights reserved navigation home about contact terms "
                  "privacy policy subscribe newsletter footer")
        for pdf in batches:
            ids, texts = [], []
            for j in pdf["id"]:
                i = int(j)
                if i % 64 == 0:
                    text = boiler
                elif i % 16 == 0:
                    # verbatim copy of a UNIQUE history doc (odd id →
                    # never a history boiler/near-dup slot); same pure
                    # generator the history corpus used
                    h = ((i * 61) % n_history) | 1
                    rng = random.Random(77_000_000 + h)
                    text = " ".join(_sentences(rng, rng.randint(12, 40)))
                else:
                    rng = random.Random(88_000_000 + i)
                    text = " ".join(_sentences(rng, rng.randint(12, 40)))
                ids.append(2_000_000 + i)
                texts.append(text)
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    (spark.range(0, n_new, 1, parallelism)
     .mapInPandas(gen, schema="doc_id long, text string")
     .write.mode("overwrite").parquet(path))


def main() -> None:
    n_history = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    n_new = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from ragflow_spark.operators import dedup
    from ragflow_spark.session import get_spark

    spark = get_spark(app_name="incremental_smoke",
                      master=f"local[{cores}]",
                      shuffle_partitions=4 * cores,
                      extra_conf={"spark.driver.memory": "32g"})
    spark.sparkContext.setLogLevel("ERROR")
    cache = os.path.join(REPO, ".cache")
    hist_path = os.path.join(cache, f"dedup_docs_{n_history}.parquet")
    if not os.path.exists(hist_path):
        from tools.dedup_smoke import build_corpus
        build_corpus(spark, n_history, hist_path, parallelism=4 * cores)
    hist = spark.read.parquet(hist_path)

    new_path = os.path.join(cache, f"incr_docs_{n_new}.parquet")
    if not os.path.exists(new_path):
        build_increment(spark, n_new, n_history, new_path, 4 * cores)
    new = spark.read.parquet(new_path)
    new.count()  # warm the scan; timing discipline per BASELINE notes

    result: dict = {"n_history": n_history, "n_new": n_new, "cores": cores}

    # one-time snapshot cost: write both stores
    ex_store_path = os.path.join(cache, f"exact_store_{n_history}.parquet")
    mh_store_path = os.path.join(cache, f"mh_store_{n_history}.parquet")
    t0 = time.perf_counter()
    dedup.exact_hash_store(hist, "doc_id", "text").write.mode(
        "overwrite").parquet(ex_store_path)
    result["exact_store_build_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    dedup.minhash_store(hist, "doc_id", "text").write.mode(
        "overwrite").parquet(mh_store_path)
    result["minhash_store_build_sec"] = round(time.perf_counter() - t0, 2)

    ex_store = spark.read.parquet(ex_store_path)
    mh_store = spark.read.parquet(mh_store_path)

    # the probes — the recurring per-increment cost
    t0 = time.perf_counter()
    hits = dedup.incremental_exact_dups(new, ex_store, "doc_id", "text")
    result["exact_hits"] = hits.count()
    result["exact_probe_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    pairs = dedup.incremental_minhash_pairs(new, mh_store, "doc_id", "text")
    result["minhash_pairs"] = pairs.count()
    result["minhash_probe_sec"] = round(time.perf_counter() - t0, 2)
    result["minhash_dropped_bands"] = dedup.dropped_band_count(pairs)
    dedup.release(pairs)

    result["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    print(json.dumps(result))

    md = f"""## Incremental dedup smoke ({n_new:,}-doc increment vs {n_history:,}-doc store, local[{cores}])

The O(increment) claim, measured {result['ts']}: the history corpus's
stores are written once per snapshot (exact fp table
{result['exact_store_build_sec']} s, minhash signature table
{result['minhash_store_build_sec']} s — both one-time, amortized across
every later increment), then a {n_new:,}-doc increment ({n_new // 64:,}
boilerplate copies, {n_new // 16 - n_new // 64:,} verbatim copies of
unique history docs, rest fresh) probes them WITHOUT touching history
text (the stores carry none — 24 B/doc exact, sig+bands minhash):

| probe | wall sec | hits |
|---|---|---|
| incremental_exact_dups | {result['exact_probe_sec']} | {result['exact_hits']:,} |
| incremental_minhash_pairs (est ≥ 0.5) | {result['minhash_probe_sec']} | {result['minhash_pairs']:,} |

The minhash probe's matched-buckets hot-band guard dropped
{result['minhash_dropped_bands']} band(s) (the boilerplate group — exact
dedup's job, and the exact probe found every copy). Compare the full
re-mine alternative: minhash_pairs over the 1M corpus alone is ~128 s
(Dedup scale smoke above) and grows with the corpus; the probe grows
with the increment. At a 10^12-doc deployment the stores are bucketed
by fp/band key on disk, making each probe a co-located join — nothing
O(history) shuffles.
"""
    out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(out_md):
        prev = open(out_md).read()
        marker = "## Incremental dedup smoke"
        if marker in prev:
            pat = re.compile(r"## Incremental dedup smoke.*?(?=\n## |\Z)",
                             re.S)
            prev = pat.sub(md.rstrip() + "\n", prev)
        else:
            prev = prev.rstrip() + "\n\n" + md
        with open(out_md, "w") as f:
            f.write(prev)
        print("updated BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
