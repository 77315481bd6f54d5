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
