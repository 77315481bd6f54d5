"""Curation operator: all drop reasons, precedence order, and the summary."""

from ragflow_spark.operators.curate import curate, curation_summary


def test_curate_all_reasons_and_precedence(spark):
    rows = [
        # kept: normal english prose, unique
        (1, "the quick brown fox jumps over the lazy dog and runs home to rest"),
        # too_short (precedence beats low_quality too)
        (2, "hi"),
        # repetitive: stopword-bearing so lang-ID passes, then Gopher fires
        (3, "the cat " * 40),
        # low_quality: punctuation soup (punct_ratio > 0.3), 'the' keeps
        # the lang gate satisfied
        (4, "the!!! the??? the;;; the::: the--- the+++ the=== the***"),
        # duplicate of doc 1 (same normalized text, different id)
        (5, "The  quick brown fox jumps over the lazy dog and runs home to rest"),
        # bad_lang: no stopwords from any bank, no CJK -> 'und'
        (6, "zzz qqq xxx vvv kkk jjj www yyy mmm nnn ppp rrr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in curate(
        df, "doc_id", "text", allowed_langs=("en", "de", "es", "fr", "zh")
    ).collect()}
    assert out[1].keep == 1 and out[1].drop_reason is None
    assert out[1].pred_lang == "en"
    assert out[2].drop_reason == "too_short"
    assert out[3].drop_reason == "repetitive"
    assert out[4].drop_reason == "low_quality"
    assert out[5].drop_reason == "duplicate" and out[5].is_dup == 1
    assert out[6].drop_reason == "bad_lang"
    # min-id representative of the dup group is kept
    assert out[1].is_dup == 0


def test_curate_too_long_and_summary(spark):
    long_text = "word " * 60_000
    df = spark.createDataFrame(
        [(1, long_text), (2, "the cat and the dog sat with the bird in that house")],
        "doc_id long, text string",
    )
    flags = curate(df, "doc_id", "text")
    out = {r.doc_id: r.drop_reason for r in flags.collect()}
    # precedence: too_long wins over repetitive for the 60k-word doc
    assert out[1] == "too_long"
    assert out[2] is None
    summary = {r.outcome: (r.n_docs, r.n_tokens)
               for r in curation_summary(flags).collect()}
    assert summary["kept"][0] == 1
    assert summary["too_long"] == (1, 60_000)
