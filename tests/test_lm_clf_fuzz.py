"""Hypothesis fuzz: the charlm and NB-classifier Spark pipelines vs
their sequential pure-Python twins on adversarial unicode corpora —
the exact-integer contracts must hold for ANY input, not just the
hand-picked fixtures."""

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st

from ragflow_spark.operators import clf, lm


# mixed alphabet: ascii letters/digits/space plus whitespace variants,
# unicode (incl. astral), and the normalization edge chars
_CHARS = st.sampled_from(
    list("abcXYZ019 #?\t\n\r")
    + ["é", "Ü", "中", "K", "µ", "İ", " ", "\U0001f600"]
)
_TEXT = st.text(alphabet=_CHARS, max_size=60)
_CORPUS = st.lists(_TEXT, min_size=1, max_size=10)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_charlm_fuzz_matches_twin(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(3)
    got = {
        r["doc_id"]: r.asDict()
        for r in lm.charlm_score_corpus(df, "doc_id", "text").collect()
    }
    want = lm.charlm_reference(texts)
    for i, w in enumerate(want):
        assert got[i]["n_bigrams"] == w["n_bigrams"], (i, texts[i])
        assert got[i]["nll_micro"] == w["nll_micro"], (i, texts[i])


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_nb_fuzz_matches_twin(spark, data):
    texts = data.draw(_CORPUS)
    labels = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=1),
            min_size=len(texts), max_size=len(texts),
        )
    )
    df = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(zip(texts, labels))],
        "doc_id long, text string, y int",
    ).repartition(3)
    w, prior = clf.nb_train(df, "text", "y", n_buckets=64)
    got = {
        r["doc_id"]: r.asDict()
        for r in clf.nb_score(
            df, "doc_id", "text", w, prior, label_col="y"
        ).collect()
    }
    want = clf.nb_reference(texts, labels, n_buckets=64)
    for i, wv in enumerate(want):
        assert got[i]["n_feats"] == wv["n_feats"], (i, texts[i])
        assert got[i]["score_micro"] == wv["score_micro"], (i, texts[i])
        assert got[i]["pred"] == wv["pred"], (i, texts[i])
