"""Incremental dedup: a new batch checked against a historical store
without touching historical text. Pins (1) exact-store hits vs a
full-corpus run, (2) the minhash-estimate verification arithmetic vs
the stored signatures themselves, (3) candidacy == band intersection,
(4) the matched-buckets-only hot-band guard, (5) parquet round-trip of
both stores (the snapshot persistence the operators are built for)."""

import os

import pytest
from pyspark.sql import functions as F

from ragflow_spark.operators import dedup

BASE = ("the quick brown fox jumps over the lazy dog and then "
        "wanders across the wide river valley toward the distant hills "
        "while the evening light settles over the quiet fields")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- exact

def test_incremental_exact_hits_match_full_run(spark):
    hist = _docs(spark, [
        (1, "alpha beta gamma"),
        (2, "delta epsilon zeta"),
        (3, "alpha beta gamma"),          # in-history dup: min id wins
        (4, "unique history text"),
    ])
    new = _docs(spark, [
        (101, "alpha beta gamma"),        # dup of history group {1,3}
        (102, "brand new content"),       # unique
        (103, "delta epsilon zeta"),      # dup of history doc 2
        (104, "brand new content"),       # in-batch dup only: NOT a hit
    ])
    store = dedup.exact_hash_store(hist, "doc_id", "text")
    got = {
        (r.id_new, r.id_hist)
        for r in dedup.incremental_exact_dups(
            new, store, "doc_id", "text"
        ).collect()
    }
    assert got == {(101, 1), (103, 2)}

    # equivalence vs mining the concatenated corpus: every incremental
    # hit is a full-run group that spans the split, keeper = history min
    full = dedup.exact_dedup_groups(
        hist.unionByName(new), "doc_id", "text"
    ).filter(F.col("dup_count") > 1).collect()
    spanning = {
        (r.fp, r.keep_id) for r in full if r.keep_id < 100
    }
    store_fp = {r.fp: r.doc_id for r in store.collect()}
    for id_new, id_hist in got:
        fp = dedup.exact_hash_store(
            new.filter(F.col("doc_id") == id_new), "doc_id", "text"
        ).collect()[0].fp
        assert (fp, id_hist) in spanning, (id_new, id_hist)


def test_incremental_exact_store_parquet_roundtrip(spark, tmpdir_path):
    hist = _docs(spark, [(1, "persisted snapshot text")])
    path = os.path.join(tmpdir_path, "exact_store")
    dedup.exact_hash_store(hist, "doc_id", "text").write.parquet(path)
    new = _docs(spark, [(9, "persisted snapshot text"), (10, "other")])
    got = dedup.incremental_exact_dups(
        new, spark.read.parquet(path), "doc_id", "text"
    ).collect()
    assert [(r.id_new, r.id_hist) for r in got] == [(9, 1)]


# ----------------------------------------------------------- minhash

def test_incremental_minhash_identical_cross_pair(spark):
    hist = _docs(spark, [(1, BASE), (2, "completely different words here "
                                        "about sailing ships and harbors")])
    new = _docs(spark, [(101, BASE), (102, "unrelated fresh material on "
                                           "mountain trails and snow")])
    store = dedup.minhash_store(hist, "doc_id", "text")
    out = dedup.incremental_minhash_pairs(new, store, "doc_id", "text")
    rows = out.collect()
    dedup.release(out)
    assert [(r.id_new, r.id_hist, r.est_jaccard) for r in rows] == [
        (101, 1, 1.0)
    ]


def test_incremental_minhash_est_matches_stored_sigs(spark):
    """Self-consistency against the store's own signatures: candidacy ==
    band intersection, est == fraction of agreeing sig components (the
    unbiased minhash estimate), threshold applied on that value."""
    texts = {
        1: BASE,
        2: BASE.replace("evening", "morning").replace("river", "dry"),
        3: "short doc about nothing shared with the base at all today",
    }
    new_texts = {
        101: BASE,                                    # identical to 1
        102: BASE + " with a small appended tail clause",  # near-dup
        103: "fully distinct subject matter entirely",      # unrelated
    }
    hist = _docs(spark, sorted(texts.items()))
    new = _docs(spark, sorted(new_texts.items()))
    store = dedup.minhash_store(hist, "doc_id", "text").persist()
    sig = {r.doc_id: (r.sig, r.bands) for r in store.collect()}
    sig.update({
        r.doc_id: (r.sig, r.bands)
        for r in dedup.minhash_store(new, "doc_id", "text").collect()
    })

    out = dedup.incremental_minhash_pairs(
        new, store, "doc_id", "text", est_threshold=0.25
    )
    got = {(r.id_new, r.id_hist): r.est_jaccard for r in out.collect()}
    dedup.release(out)
    store.unpersist()

    expected = {}
    for id_new in new_texts:
        for id_hist in texts:
            sn, bn = sig[id_new]
            sh, bh = sig[id_hist]
            if not set(bn) & set(bh):
                continue
            est = round(
                sum(a == b for a, b in zip(sn, sh)) / len(sn), 6
            )
            if est >= 0.25:
                expected[(id_new, id_hist)] = est
    assert got == expected
    assert (101, 1) in got and got[(101, 1)] == 1.0


def test_incremental_minhash_hot_band_guard(spark):
    boiler = "identical navigation chrome footer " * 3
    hist = _docs(spark, [(i, boiler) for i in range(1, 41)]
                 + [(99, BASE)])
    new = _docs(spark, [(101, boiler), (102, BASE)])
    store = dedup.minhash_store(hist, "doc_id", "text")
    out = dedup.incremental_minhash_pairs(
        new, store, "doc_id", "text", max_band_size=20
    )
    rows = {(r.id_new, r.id_hist) for r in out.collect()}
    # boilerplate buckets (40 history docs > cap 20) drop; the clean
    # pair survives; the drop is auditable
    assert rows == {(102, 99)}
    assert dedup.dropped_band_count(out) > 0
    dedup.release(out)


def test_incremental_minhash_store_parquet_roundtrip(spark, tmpdir_path):
    hist = _docs(spark, [(1, BASE)])
    path = os.path.join(tmpdir_path, "mh_store")
    dedup.minhash_store(hist, "doc_id", "text").write.parquet(path)
    new = _docs(spark, [(101, BASE)])
    out = dedup.incremental_minhash_pairs(
        new, spark.read.parquet(path), "doc_id", "text"
    )
    assert [(r.id_new, r.id_hist, r.est_jaccard) for r in out.collect()] \
        == [(101, 1, 1.0)]
    dedup.release(out)


def test_incremental_minhash_plan_never_reads_history_text(spark, tmpdir_path):
    """With the store persisted (the deploy shape), the only signature
    computation in the plan is the NEW batch's — historical text is
    never read (the store schema has no text column by construction)."""
    hist = _docs(spark, [(1, BASE)])
    path = os.path.join(tmpdir_path, "mh_store_plan")
    dedup.minhash_store(hist, "doc_id", "text").write.parquet(path)
    store = spark.read.parquet(path)
    assert store.columns == ["doc_id", "sig", "bands"]
    new = _docs(spark, [(101, BASE)])
    out = dedup.incremental_minhash_pairs(new, store, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    dedup.release(out)
    # the history side is parquet-scanned as-is — no signature recompute
    # is even possible (the store has no text column), so the only
    # MapInPandas subtrees are the new batch's in-memory rows
    assert "Scan parquet" in plan, plan
    assert "MapInPandas" in plan  # the new batch does compute sigs
