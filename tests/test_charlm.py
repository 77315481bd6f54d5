"""Char-bigram LM (CCNet-style perplexity scoring): Spark pipeline vs
the sequential pure-Python twin, plus the numeric-contract edges the
DuckDB oracle relies on (exact int64 sums, seam handling, partition
order independence)."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from ragflow_spark.operators import lm


CORPUS = [
    "the cat sat on the mat",
    "The CAT, the cat -- the cat!",
    "numbers 123 and 456 mix with words",
    "zzzz qqqq xxxx unusual tail chars",
    "Ünïcödé gets hashed to the OOV bucket ©®",
    "a",
    "",
    "the the the the the the the the",
]


def _spark_rows(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(5)
    out = lm.charlm_score_corpus(df, "doc_id", "text", **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_matches_pure_python_reference(spark):
    got = _spark_rows(spark, CORPUS)
    want = lm.charlm_reference(CORPUS)
    assert len(got) == len(CORPUS)
    for i, w in enumerate(want):
        g = got[i]
        assert g["n_bigrams"] == w["n_bigrams"], i
        assert g["nll_micro"] == w["nll_micro"], i
        if w["ce_nats"] is None:
            assert g["ce_nats"] is None and g["ppl"] is None
        else:
            assert g["ce_nats"] == pytest.approx(w["ce_nats"], abs=2e-6)
            assert g["ppl"] == pytest.approx(w["ppl"], abs=2e-4)


def test_partition_count_invariance(spark):
    """int64 micro-nat sums are exact: 1 partition and 11 partitions
    must agree bit-for-bit, including the trained model."""
    df1 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    a = {
        r["doc_id"]: r.asDict()
        for r in lm.charlm_score_corpus(
            df1.coalesce(1), "doc_id", "text"
        ).collect()
    }
    b = {
        r["doc_id"]: r.asDict()
        for r in lm.charlm_score_corpus(
            df1.repartition(11), "doc_id", "text"
        ).collect()
    }
    assert a == b


def test_bigram_counts_respect_row_seams(spark):
    """'ab' + 'ba' in separate rows must NOT create a 'bb' or 'ab'
    seam bigram; empty rows between them don't revive the seam."""
    df = spark.createDataFrame(
        [(0, "ab"), (1, ""), (2, "ba")], "doc_id long, text string"
    ).coalesce(1)
    counts = {
        (r["idx"] // lm.K, r["idx"] % lm.K): r["c"]
        for r in lm.charlm_bigram_counts(df, "text").collect()
    }
    ai, bi = lm.ALPHABET.index("a"), lm.ALPHABET.index("b")
    assert counts == {(ai, bi): 1, (bi, ai): 1}


def test_normalization_contract(spark):
    """Uppercase folds, punctuation/unicode become '#', digits and
    space survive."""
    df = spark.createDataFrame([(0, "Ab1 ,é")], "doc_id long, text string")
    normed = df.select(
        lm.normalize_text_col(F.col("text")).alias("t")
    ).first()["t"]
    assert normed == "ab1 ##"


def test_model_formula_tiny_corpus():
    """Hand-check add-one smoothing on a 2-bigram corpus."""
    ai, bi = lm.ALPHABET.index("a"), lm.ALPHABET.index("b")
    counts = [(ai * lm.K + bi, 3)]
    model = lm.charlm_model(counts)
    # p(b|a) = (3+1)/(3+38); p(x|a) = 1/41; p(anything|unseen ctx) = 1/38
    assert model[ai * lm.K + bi] == round(math.log(4 / 41) * 1e6)
    assert model[ai * lm.K + ai] == round(math.log(1 / 41) * 1e6)
    assert model[bi * lm.K + ai] == round(math.log(1 / 38) * 1e6)


def test_repetitive_doc_scores_lower_ce(spark):
    """The repetitive doc must get lower cross-entropy than the
    unusual-chars doc under the corpus model — the CCNet bucketing
    property the operator exists for."""
    got = _spark_rows(spark, CORPUS)
    assert got[7]["ce_nats"] < got[3]["ce_nats"]


def test_train_frac_sampling(spark):
    """Hash-sampled training still scores every doc, and frac=1.0
    equals unsampled."""
    texts = [f"sample doc number {i} with shared tail words" for i in range(40)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    full = {
        r["doc_id"]: r["nll_micro"]
        for r in lm.charlm_score_corpus(df, "doc_id", "text").collect()
    }
    frac1 = {
        r["doc_id"]: r["nll_micro"]
        for r in lm.charlm_score_corpus(
            df, "doc_id", "text", train_frac=1.0
        ).collect()
    }
    assert full == frac1
    half = lm.charlm_score_corpus(df, "doc_id", "text", train_frac=0.5)
    assert half.count() == 40  # scoring covers the full corpus


def test_score_requires_valid_model(spark):
    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lm.charlm_score(df, "doc_id", "text", np.zeros(7, dtype=np.int64))
    with pytest.raises(ValueError):
        lm.charlm_bigram_counts(df, "text", train_frac=0.5)
