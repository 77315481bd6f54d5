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


def test_ppl_tiers_thirds_and_null_tail(spark):
    """Tiers split ~evenly, nulls land in tail, and the boundary
    comparisons are inclusive-on-head/middle."""
    texts = [f"doc number {i} words {'common ' * (i % 7)}" for i in range(30)]
    texts.append("")  # null ce doc
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = lm.ppl_tiers(lm.charlm_score_corpus(df, "doc_id", "text"))
    rows = {r["doc_id"]: r for r in out.collect()}
    counts = {}
    for r in rows.values():
        counts[r["tier"]] = counts.get(r["tier"], 0) + 1
    assert set(counts) == {"head", "middle", "tail"}
    assert rows[30]["ce_nats"] is None and rows[30]["tier"] == "tail"
    # verify every tag against driver-side boundaries computed with the
    # same (n-1)*q linear interpolation (np.percentile 'linear'); tied
    # values land on one side together, so compare VALUES not ranks
    import numpy as np

    ces = np.array(
        sorted(r["ce_nats"] for r in rows.values() if r["ce_nats"] is not None)
    )
    q1, q2 = np.percentile(ces, [100 / 3, 200 / 3])
    for r in rows.values():
        if r["ce_nats"] is None:
            continue
        want = (
            "head" if r["ce_nats"] <= q1
            else ("middle" if r["ce_nats"] <= q2 else "tail")
        )
        assert r["tier"] == want, (r["doc_id"], r["ce_nats"], q1, q2)
    # ~thirds modulo boundary ties
    assert 6 <= counts["head"] <= 14 and 6 <= counts["middle"] <= 14


def test_ppl_tiers_approx_path(spark):
    """exact=False (the 100 TB path) still produces the three tiers on
    a corpus with well-separated scores."""
    texts = [
        f"doc {i} " + " ".join(f"tok{j}" for j in range(i))
        for i in range(60)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = lm.ppl_tiers(
        lm.charlm_score_corpus(df, "doc_id", "text"), exact=False
    )
    rows = out.collect()
    tiers = {r["tier"] for r in rows}
    assert tiers == {"head", "middle", "tail"}
    assert all(r["tier"] is not None for r in rows)


def test_model_save_load_roundtrip(spark, tmp_path):
    """The incremental-crawl path: persist a trained model, reload it,
    score an increment — bit-identical to scoring with the live model."""
    hist = spark.createDataFrame(
        [(i, f"historical doc {i} common words") for i in range(20)],
        "doc_id long, text string",
    )
    counts = [
        (r["idx"], r["c"])
        for r in lm.charlm_bigram_counts(hist, "text").collect()
    ]
    model = lm.charlm_model(counts)
    path = str(tmp_path / "charlm_model")
    lm.charlm_save(spark, model, path)
    loaded = lm.charlm_load(spark, path)
    assert (loaded == model).all()
    inc = spark.createDataFrame(
        [(100, "a new increment document"), (101, "zzz qqq")],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["nll_micro"]
         for r in lm.charlm_score(inc, "doc_id", "text", model).collect()}
    b = {r["doc_id"]: r["nll_micro"]
         for r in lm.charlm_score(inc, "doc_id", "text", loaded).collect()}
    assert a == b
    import pytest as _pytest
    with _pytest.raises(ValueError):
        lm.charlm_save(spark, model[:7], path)


def test_fused_normalization_matches_contract_column(spark):
    """The Arrow-pass LUT normalization must agree with the JVM
    normalize_text_col contract on mixed text (the hot-path fusion)."""
    texts = [
        "MiXeD Case 123",
        "tabs\tand\nnewlines",
        "Ünïcödé ©® — em-dash",
        "KELVIN K sign",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    jvm = [
        r["t"]
        for r in df.select(lm.normalize_text_col(F.col("text")).alias("t"))
        .orderBy("doc_id" if "doc_id" in df.columns else "t").collect()
    ]
    # decode the LUT path back to alphabet chars
    for t, want in zip(texts, jvm):
        codes, _ = lm._batch_codes([t])
        got = "".join(lm.ALPHABET[c] for c in codes)
        assert got == want, t
