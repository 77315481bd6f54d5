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


def test_curate_optin_gopher_and_c4_reasons(spark):
    """Opt-in published rule sets slot between 'repetitive' and
    'duplicate' in the drop_reason precedence; defaults keep the pre-r7
    schema and decisions byte-identical."""
    # word-unique lines so the repetition gate stays quiet; 'the'/'and'
    # provide the two required-stopword hits
    keeper = "\n".join(
        f"the quick{i} brown{i} foxes{i} jump{i} over{i} and lazy{i} "
        f"dogs{i} sleep{i} today{i}."
        for i in range(12)
    )
    no_stop = "\n".join(                          # gopher: 0 required stopwords
        f"lorem{i} dolor{i} sit{i} amet{i} consectetur{i} adipiscing{i} "
        f"elit{i} tempor{i} incididunt{i}."
        for i in range(12)
    )
    braces = keeper + "\nvar x = {a: 1};"         # c4 page veto: curly brace
    rows = [(1, keeper), (2, no_stop), (3, braces)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r.doc_id: r.drop_reason for r in curate(
        df, "doc_id", "text", gopher_quality=True, c4_page_rules=True
    ).collect()}
    assert out[1] is None
    assert out[2] == "gopher_quality"
    assert out[3] == "c4_page"

    # defaults: same rows, neither rule fires, schema unchanged
    base = curate(df, "doc_id", "text")
    assert {r.doc_id: r.drop_reason for r in base.collect()} == {
        1: None, 2: None, 3: None
    }
    assert "drop_reason" in base.columns and len(base.columns) == 9


def test_curate_url_gate_first_and_optin_shape(spark):
    good = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
            "tempor incididunt labore dolore magna aliqua veniam")
    rows = [
        (1, good, "https://www.example.com/articles/cooking"),
        # bad URL wins over EVERY content rule — the text here is also
        # too_short, but bad_url has precedence (zero content bytes read)
        (2, "x", "https://freeporn.example/x"),
        (3, good, "https://adult-dating-webcam.example/x"),
        # soft single hit keeps; content rules still apply after
        (4, "x", "https://sussex-dating.com/p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    out = {r.doc_id: r for r in curate(
        df, "doc_id", "text", url_col="url"
    ).collect()}
    assert out[1].drop_reason is None and out[1].url_keep == 1
    assert out[2].drop_reason == "bad_url" and out[2].url_keep == 0
    assert out[3].drop_reason == "bad_url"
    assert out[4].drop_reason == "too_short" and out[4].url_keep == 1
    # opt-in adds exactly the url_keep column; default shape untouched
    assert len(out[1].asDict()) == 10
    assert len(curate(df, "doc_id", "text").columns) == 9
