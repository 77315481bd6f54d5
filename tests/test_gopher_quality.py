"""Gopher doc-quality rules (textstats.gopher_quality) — Rae et al. 2021
§A1.1 goldens, one rule violated per doc so the keep bit's failure cause
is unambiguous."""

from pyspark.sql import functions as F

from ragflow_spark.operators import textstats

# 60 words, all rules satisfied (repeats the stopword set throughout)
GOOD = " ".join(
    ["the quick brown fox jumps over lazy dogs and cats that have fun with"]
    * 5
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in textstats.gopher_quality(df, "doc_id", "text").collect()
    }


def test_each_rule_gates(spark):
    rows = [
        (1, GOOD),
        (2, "too few words here."),                       # <50 words
        (3, GOOD + " " + "# " * 20),                      # symbol ratio
        (4, "\n".join(["• " + GOOD.split("\n")[0][:40]] * 19 + [GOOD])),
        (5, "\n".join([GOOD[:40] + "…"] * 9 + [GOOD])),   # ellipsis lines
        (6, " ".join(["12345"] * 60)),                    # no alpha words
        (7, " ".join(["lorem dolor sit amet consectetur"] * 12)),  # 0 stopwords
    ]
    out = _run(spark, rows)
    assert out[1].gopher_quality_keep == 1
    assert out[2].gopher_quality_keep == 0
    assert out[3].symbol_word_ratio > 0.1 and out[3].gopher_quality_keep == 0
    assert out[4].bullet_line_frac > 0.9 and out[4].gopher_quality_keep == 0
    assert out[5].ellipsis_line_frac > 0.3 and out[5].gopher_quality_keep == 0
    assert out[6].alpha_word_frac == 0.0 and out[6].gopher_quality_keep == 0
    assert out[7].gopher_stop_hits < 2 and out[7].gopher_quality_keep == 0


def test_stop_hits_counts_distinct_members(spark):
    # 'the' repeated 60 times: ONE distinct stopword, not sixty
    out = _run(spark, [(1, " ".join(["the"] * 60))])
    assert out[1].gopher_stop_hits == 1


def test_three_dot_ellipsis_counts(spark):
    out = _run(spark, [(1, "\n".join([GOOD[:40] + "..."] * 9 + [GOOD]))])
    assert out[1].ellipsis_line_frac > 0.3


def test_dup_line_and_para_fractions(spark):
    """Gopher duplicate line/paragraph fractions: char side counts the
    bytes of occurrences beyond the first."""
    # 4 lines, 'dup' twice; paragraphs: two identical blocks
    text = "dup\nunique one\ndup\nother line"
    ptext = "para one\nbody\n\npara one\nbody\n\ndifferent"
    rows = [(1, text), (2, ptext), (3, "all\nunique\nlines")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from ragflow_spark.operators.textstats import dup_line_columns
    from pyspark.sql import functions as F

    cols = dup_line_columns(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in cols.items()]
        ).collect()
    }
    # doc 1: 4 lines, 3 distinct -> 0.25; dup chars = len('dup') = 3 of 29
    assert out[1].dup_line_frac == 0.25
    assert out[1].dup_line_char_frac == round(3 / len(text), 6)
    # doc 2: paragraphs 'para one\nbody' x2 + 'different' -> 1/3 dup
    assert out[2].dup_para_frac == round(1 - 2 / 3, 6)
    assert out[2].dup_para_char_frac == round(13 / len(ptext), 6)
    # doc 3: no duplicates anywhere
    assert out[3].dup_line_frac == 0.0
    assert out[3].dup_line_char_frac == 0.0
    assert out[3].dup_para_frac == 0.0


def test_ngram_char_fractions(spark):
    """Top/dup n-gram char fractions (Arrow pass): conventions are
    count*len(space-joined gram)/len(text), overlaps double-counted,
    capped at 1.0."""
    from ragflow_spark.operators.textstats import gopher_ngram_columns
    from pyspark.sql import functions as F

    rows = [(1, "a b a b a b"), (2, "w x y z w x y z w x y z u v"),
            (3, ""), (4, "only four words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = gopher_ngram_columns(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in cols.items()]
        ).collect()
    }
    # doc 1: top 2-gram 'a b' count 3, len 3 -> 9/11; 4-gram overlap
    # would give 14/11 -> capped at 1.0
    assert out[1].top_2gram_char_frac == round(9 / 11, 6)
    assert out[1].top_4gram_char_frac == 1.0
    assert out[1].dup_5gram_char_frac == 0.0
    # doc 2: 'w x y z' repeats 3x -> top 2-gram 'w x' 3*3=9 of 27
    assert out[2].top_2gram_char_frac == round(9 / 27, 6)
    # dup 5-grams: duplicated occurrences beyond first cover > len(text)
    # with overlap -> capped
    assert out[2].dup_5gram_char_frac == 1.0
    assert out[2].dup_9gram_char_frac == 0.0
    # empty / too-short docs: all zero
    assert out[3].top_2gram_char_frac == 0.0
    assert out[4].dup_5gram_char_frac == 0.0
