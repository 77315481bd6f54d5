"""Transparent gzip payloads: CC-style landing zones often store the
WARC payload member-compressed; the parse UDF detects the 1f8b magic and
decodes per row, so gzipped and raw rows emit byte-identical chunks
across every format in the corpus (batch AND streaming share the one
decode point in _extract_batches)."""

import gzip

from pyspark.sql import functions as F

from ragflow_spark.operators.extract import extract_chunks
from ragflow_spark.sources import pages as pages_src


def _chunks(spark, df):
    return {
        (r.url, r.chunk_idx): (r.chunk_text, r.content_hash)
        for r in extract_chunks(
            df, num_partitions=8, template_cfg={"ocr_backend": "fake"}
        ).select("url", "chunk_idx", "chunk_text", "content_hash",
                 "error").filter(F.col("error").isNull()).collect()
    }


def test_gzipped_html_equals_raw_all_formats(spark):
    import pandas as pd

    pages = pages_src.generate_pages_df(spark, 64, parallelism=2)
    raw = _chunks(spark, pages)
    assert raw

    @F.pandas_udf("binary")
    def gz(col: pd.Series) -> pd.Series:
        return col.map(lambda b: gzip.compress(bytes(b), compresslevel=1))

    gzipped = pages.withColumn("html", gz(F.col("html")))
    assert _chunks(spark, gzipped) == raw


def test_corrupt_gzip_reports_per_doc_error(spark):
    bad = b"\x1f\x8b" + b"\x00" * 40  # gzip magic, garbage member
    df = spark.createDataFrame(
        [("https://s.com/bad", None, bad, None, "English", "naive", "html")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, parser string, fmt string",
    )
    rows = extract_chunks(df, num_partitions=2).collect()
    # the row surfaces (manifest visibility contract) — either a parse
    # of the raw bytes or an explicit per-doc error, never a crash
    assert len(rows) >= 1
    assert all(r.url == "https://s.com/bad" for r in rows)


def test_truncated_gzip_member_never_crashes(spark):
    whole = gzip.compress(b"<html><body><p>hello truncated world, with "
                          b"commas, for, scoring.</p></body></html>")
    df = spark.createDataFrame(
        [(f"https://s.com/t{i}", None, whole[:n], None, "English",
          "naive", "html")
         for i, n in enumerate([3, 10, len(whole) - 1])],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, parser string, fmt string",
    )
    rows = extract_chunks(df, num_partitions=2).collect()
    assert {r.url for r in rows} == {f"https://s.com/t{i}" for i in range(3)}
