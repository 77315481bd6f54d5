"""C4 line-level cleaning rules (textstats.c4_line_filter / c4_clean_text)
— Raffel et al. 2020 §2.2 goldens over crafted multi-line docs (the sf
oracle corpus is mostly single-line, so line behavior pins here)."""

from pyspark.sql import functions as F

from ragflow_spark.operators import textstats

DOC_GOOD = (
    "This is a perfectly fine opening sentence.\n"
    "Here is another sentence with enough words!\n"
    'Is this a question with the required words?\n'
    'He said "the quote ends the line."\n'
)
DOC_MIXED = (
    "Short line.\n"                                   # <5 words: drop
    "no terminal punctuation on this line here\n"     # no punct: drop
    "Please enable JavaScript to view the comments.\n"  # javascript: drop
    "A good line that survives every single rule.\n"  # keep
    "Another good line that survives every rule too.\n"  # keep
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in textstats.c4_line_filter(df, "doc_id", "text").collect()
    }


def test_line_rules_and_page_gate(spark):
    rows = [
        (1, DOC_GOOD),
        (2, DOC_MIXED),
        (3, "One good sentence that is long enough.\nAnother one here also fine."),
        (4, DOC_GOOD + "var x = {a: 1};\n"),        # brace: page drop
        (5, DOC_GOOD + "Lorem Ipsum dolor sit amet.\n"),  # lorem: page drop
        (6, ""),
    ]
    out = _run(spark, rows)
    # doc 1: 4 kept lines (+ trailing '' from the final \n) → page keep
    assert out[1].lines_kept == 4 and out[1].c4_page_keep == 1
    # doc 2: only the 2 good lines survive → below the 3-line page gate
    assert out[2].lines_kept == 2 and out[2].c4_page_keep == 0
    # doc 3: both lines survive the line rules but 2 < 3 → page drop
    assert out[3].lines_kept == 2 and out[3].c4_page_keep == 0
    # page-level vetoes ignore how many lines were kept
    assert out[4].lines_kept == 4 and out[4].c4_page_keep == 0
    assert out[5].c4_page_keep == 0
    # empty doc: one empty line, nothing kept, md5('')
    assert out[6].lines_total == 1 and out[6].lines_kept == 0
    assert out[6].clean_md5 == "d41d8cd98f00b204e9800998ecf8427e"


def test_clean_text_joins_kept_lines_in_order(spark):
    df = spark.createDataFrame([(1, DOC_MIXED)], "doc_id long, text string")
    got = df.select(
        textstats.c4_clean_text(F.col("text")).alias("t")
    ).first().t
    assert got == (
        "A good line that survives every single rule.\n"
        "Another good line that survives every rule too."
    )


def test_javascript_word_bounded(spark):
    rows = [
        (1, "The javascript runtime is discussed here today.\n"
            "A good line that survives every single rule.\n"
            "Another good line that survives every rule too.\n"
            "One more good line to pass the page gate.\n"),
        # 'javascripting' is NOT the word javascript — line survives
        (2, "We were javascripting all night long yesterday evening.\n"
            "A good line that survives every single rule.\n"
            "Another good line that survives every rule too.\n"),
    ]
    out = _run(spark, rows)
    assert out[1].lines_kept == 3   # the javascript line dropped
    assert out[2].lines_kept == 3   # word-boundary: all three kept
