"""Naive-Bayes quality classifier (CCNet-style shape, weak labels from
the quality_keep heuristic): Spark pipeline vs the sequential
pure-Python twin, plus the exact-integer contract and the weak-
supervision generalization property."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from ragflow_spark.operators import clf


GOOD = [
    "this is a perfectly normal readable sentence with common words",
    "another clean document where the words flow in a natural way",
    "the quick brown fox jumps over the lazy dog every single day",
    "reading comprehension improves when the text has real structure",
]
BAD = [
    "x",
    "!!! ??? *** ### $$$ %%%",
    "aa bb",
    "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz qqq",
]
CORPUS = GOOD + BAD


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(5)


def test_matches_pure_python_reference(spark):
    got = {
        r["doc_id"]: r.asDict()
        for r in clf.nb_quality_clf(_df(spark, CORPUS), "doc_id", "text").collect()
    }
    # labels must equal the quality_keep heuristic the twin recomputes
    from ragflow_spark.operators.textstats import quality_features

    labels = [
        r["quality_keep"]
        for r in quality_features(
            _df(spark, CORPUS).coalesce(1).orderBy("doc_id"),
            "doc_id", "text",
        ).orderBy("doc_id").collect()
    ]
    want = clf.nb_reference(CORPUS, labels)
    assert len(got) == len(CORPUS)
    for i, w in enumerate(want):
        g = got[i]
        assert g["label"] == w["label"], i
        assert g["n_feats"] == w["n_feats"], i
        assert g["score_micro"] == w["score_micro"], i
        assert g["pred"] == w["pred"], i


def test_partition_count_invariance(spark):
    """int64 micro-nat sums are exact: 1 and 11 partitions agree
    bit-for-bit, model included."""
    d1 = _df(spark, CORPUS).coalesce(1)
    d11 = _df(spark, CORPUS).repartition(11)
    a = {r["doc_id"]: r.asDict()
         for r in clf.nb_quality_clf(d1, "doc_id", "text").collect()}
    b = {r["doc_id"]: r.asDict()
         for r in clf.nb_quality_clf(d11, "doc_id", "text").collect()}
    assert a == b


def test_classifier_recovers_weak_labels(spark):
    """On a separable corpus the NB scores reproduce the heuristic
    labels it was trained on (training-set fit — the distillation
    sanity bar)."""
    got = {
        r["doc_id"]: r.asDict()
        for r in clf.nb_quality_clf(_df(spark, CORPUS), "doc_id", "text").collect()
    }
    for i in range(len(GOOD)):
        assert got[i]["pred"] == 1, i
    for i in range(len(GOOD), len(CORPUS)):
        assert got[i]["pred"] == 0, i


def test_unseen_vocab_neutral_known_words_tip(spark):
    """Presence-NB semantics on unseen docs: tokens never seen in
    training land in zero-evidence buckets, so a fully-unseen doc
    scores (near) the prior — NOT a confident rejection; and the same
    unseen filler plus words from the positive class must outscore it
    plus tokens from the negative class."""
    train = _df(spark, CORPUS)
    w, prior = clf.nb_train(
        train.withColumn(
            "_label",
            (F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 8).cast("int"),
        ),
        "text", "_label",
    )
    filler = "qwxz vbnk jfhg plmt"  # never in CORPUS
    unseen = _df(
        spark,
        [
            filler,
            filler + " readable sentence with common words",  # GOOD vocab
            filler + " !!! ??? *** ###",  # BAD vocab
        ],
    )
    got = {
        r["doc_id"]: r["score_micro"]
        for r in clf.nb_score(unseen, "doc_id", "text", w, prior).collect()
    }
    # zero-evidence buckets contribute the Laplace-floor differential
    # only; with a handful of features that stays within a few nats of
    # the prior (a confident class assignment is tens of nats here)
    assert abs(got[0] - prior) < 5_000_000
    assert got[1] > got[0] > got[2]


def test_token_bucket_range_and_determinism(spark):
    df = _df(spark, CORPUS)
    rows = df.select(
        clf.token_buckets(F.col("text"), 512).alias("bs")
    ).collect()
    for r in rows:
        assert all(0 <= b < 512 for b in r["bs"])
        assert len(set(r["bs"])) == len(r["bs"])  # distinct


def test_train_frac_sampling(spark):
    texts = [f"training sample number {i} with shared tail words" for i in range(40)]
    df = _df(spark, texts)
    full = {
        r["doc_id"]: r["score_micro"]
        for r in clf.nb_quality_clf(df, "doc_id", "text").collect()
    }
    frac1 = {
        r["doc_id"]: r["score_micro"]
        for r in clf.nb_quality_clf(df, "doc_id", "text", train_frac=1.0).collect()
    }
    assert full == frac1
    half = clf.nb_quality_clf(df, "doc_id", "text", train_frac=0.5)
    assert half.count() == 40  # scoring covers the full corpus


def test_score_requires_int64_weights(spark):
    df = _df(spark, ["ab"])
    with pytest.raises(ValueError):
        clf.nb_score(df, "doc_id", "text", np.zeros(16, dtype=np.float64), 0)
    with pytest.raises(ValueError):
        clf.nb_train(df, "text", "doc_id", train_frac=0.5)


def test_nb_save_load_roundtrip(spark, tmp_path):
    """The incremental-crawl path: persist a trained model, reload it,
    score an increment — bit-identical to scoring with the live model."""
    train = _df(spark, CORPUS)
    w, prior = clf.nb_train(
        train.withColumn(
            "_label",
            (F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 8).cast("int"),
        ),
        "text", "_label", n_buckets=256,
    )
    path = str(tmp_path / "nb_model")
    clf.nb_save(spark, w, prior, path)
    lw, lp = clf.nb_load(spark, path)
    assert lp == prior and (lw == w).all() and len(lw) == 256
    inc = _df(spark, ["a fresh increment document", "zz qq"])
    a = {r["doc_id"]: r["score_micro"]
         for r in clf.nb_score(inc, "doc_id", "text", w, prior).collect()}
    b = {r["doc_id"]: r["score_micro"]
         for r in clf.nb_score(inc, "doc_id", "text", lw, lp).collect()}
    assert a == b
    with pytest.raises(ValueError):
        clf.nb_save(spark, w.astype("float64"), prior, path)
