"""Meta-robots noindex gate (operators/extract.page_noindex): the
standard crawl-pipeline exclusion — pages whose head carries
<meta name=robots content=...noindex/none...> drop before any parse
work. Gated two ways: hand goldens covering attribute order/quoting/
case/garbage-byte shapes, and a DuckDB twin running the SAME RE2-safe
patterns (shared constants, so the banks cannot drift)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ragflow_spark.operators.extract import (
    NOINDEX_CONTENT_RE,
    NOINDEX_META_TAG_RE,
    NOINDEX_NAME_RE,
    page_noindex,
    run_extraction_job,
)

CASES = [
    (b'<html><head><meta name="robots" content="noindex, nofollow">'
     b"</head>", True),
    # attribute order reversed, single quotes, upper case
    (b"<meta content='NOINDEX' name=robots>", True),
    (b"<META NAME=ROBOTS CONTENT=NONE>", True),  # the 'none' shorthand
    (b'<meta name="robots" content="index,follow">', False),
    # a directive for one specific bot is NOT the blanket robots one
    (b'<meta name="googlebot" content="noindex">', False),
    # the tokens outside a robots meta tag never match
    (b'<meta name="description" content="robots and noindex explained">',
     False),
    (b"no meta at all", False),
    (b"", False),
    # second robots tag carries the directive
    (b'<meta name="robots" content="nofollow">'
     b'<meta name="robots" content="noindex">', True),
    # malformed leading bytes can't break the ISO-8859-1 decode
    (b"\xff\xfe garbage then <meta name=robots content=noindex>", True),
]


def test_page_noindex_goldens(spark):
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(CASES)], "i int, html binary"
    )
    got = {r["i"]: r["x"] for r in df.select(
        "i", page_noindex(F.col("html")).alias("x")).collect()}
    for i, (html, exp) in enumerate(CASES):
        assert got[i] == exp, (html, got[i])


def test_page_noindex_head_bytes_window(spark):
    far = b"x" * 9000 + b'<meta name="robots" content="noindex">'
    near = b"y" * 100 + b'<meta name="robots" content="noindex">'
    df = spark.createDataFrame([(0, far), (1, near)], "i int, html binary")
    got = {r["i"]: r["x"] for r in df.select(
        "i", page_noindex(F.col("html")).alias("x")).collect()}
    assert got[0] is False  # beyond the 8 KB head window
    assert got[1] is True


def test_page_noindex_duckdb_twin(spark):
    """Same patterns, both engines, every golden case (text-decodable
    ones — the twin runs on VARCHAR)."""
    texts = [c.decode("latin-1") for c, _ in CASES]
    df = spark.createDataFrame(
        [(i, t.encode("latin-1")) for i, t in enumerate(texts)],
        "i int, html binary",
    )
    sp = {r["i"]: r["x"] for r in df.select(
        "i", page_noindex(F.col("html")).alias("x")).collect()}

    con = duckdb.connect()
    con.execute("create table t(i int, head varchar)")
    con.executemany("insert into t values (?, ?)", list(enumerate(texts)))
    sql = f"""
      select i, len(list_filter(
        regexp_extract_all(head, '{NOINDEX_META_TAG_RE.replace("'", "''")}', 1),
        t -> regexp_matches(t, '{NOINDEX_NAME_RE.replace("'", "''")}')
         and regexp_matches(t, '{NOINDEX_CONTENT_RE.replace("'", "''")}')
      )) > 0 as x from t
    """
    dk = {int(i): bool(x) for i, x in con.execute(sql).fetchall()}
    assert sp == dk


def test_run_extraction_job_respect_noindex(spark, tmpdir_path):
    import os

    noindex = (b"<html><head><meta name='robots' content='noindex'>"
               b"</head><body><p>hidden page body text</p></body></html>")
    normal = (b"<html><head><title>ok</title></head>"
              b"<body><p>visible page body text</p></body></html>")
    rows = [
        (f"https://s.com/{i}", None,
         noindex if i % 2 else normal, None, "English", "naive", "html")
        for i in range(8)
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, parser string, fmt string",
    )
    out = os.path.join(tmpdir_path, "chunks")
    man = os.path.join(tmpdir_path, "manifest")
    run_extraction_job(pages, out, man, num_partitions=4,
                       respect_noindex=True)
    urls = {r["url"] for r in spark.read.parquet(out).select("url").collect()}
    assert urls == {f"https://s.com/{i}" for i in range(8) if i % 2 == 0}
