"""Hypothesis fuzz for the two r7-final cross-engine twins: the URL
quality scrub and the meta-robots noindex gate. Java regex (Spark) and
RE2 (DuckDB) agree only on the construct subset the banks restrict
themselves to — the fuzz drives adversarial URL-ish / HTML-ish strings
through BOTH engines batch-wise and requires bit-identical outputs,
catching any semantics drift the hand-picked corpora miss."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from ragflow_spark.operators import weburl
from ragflow_spark.operators.extract import (
    NOINDEX_CONTENT_RE,
    NOINDEX_META_TAG_RE,
    NOINDEX_NAME_RE,
    page_noindex,
)

# URL-ish fragments: schemes, hosts with digits/userinfo/ports, bank
# words embedded whole and as substrings, separators, junk
_URL_PARTS = st.sampled_from([
    "https://", "http://", "ftp://", "", "www.", "porn", "xxx", "sex",
    "essex", "dating", "casino-", ".com", ".ac.uk", "/", "?", "&", "=",
    "a", "b9", "10.0.0.1", ":8080", "@", "user:pw@", "#frag", "%20",
    "-", "_", "~", "..", "p/q", "UPPER", "é", " ",
])
_URL = st.lists(_URL_PARTS, min_size=1, max_size=12).map("".join)

_HTML_PARTS = st.sampled_from([
    "<meta ", "<META ", "name=", "NAME =", "robots", "googlebot",
    "content=", '"', "'", "noindex", "none", "index", "nofollow", ",",
    " ", ">", "<", "<head>", "</head>", "<body>", "text ", "=",
    "description", "/>", "\n", "\t",
])
_HTML = st.lists(_HTML_PARTS, min_size=1, max_size=16).map("".join)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(urls=st.lists(_URL, min_size=1, max_size=12))
def test_url_quality_fuzz_matches_duckdb(spark, urls):
    urls = list(dict.fromkeys(urls))  # unique keys for the row join
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    sp = weburl.url_quality_flags(df, "url").toPandas().set_index("url")

    exprs = weburl.url_quality_oracle_exprs("url")
    sel = ", ".join(f"{sql} as {name}" for name, sql in exprs.items())
    con = duckdb.connect()
    con.execute("create table t(url varchar)")
    con.executemany("insert into t values (?)", [(u,) for u in urls])
    dk = con.execute(f"select url, {sel} from t").df().set_index("url")
    for name in exprs:
        for u in urls:
            assert sp.loc[u, name] == dk.loc[u, name], (name, repr(u))


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(heads=st.lists(_HTML, min_size=1, max_size=12))
def test_noindex_fuzz_matches_duckdb(spark, heads):
    df = spark.createDataFrame(
        [(i, h.encode("utf-8")) for i, h in enumerate(heads)],
        "i int, html binary",
    )
    sp = {r["i"]: r["x"] for r in df.select(
        "i", page_noindex(F.col("html")).alias("x")).collect()}

    con = duckdb.connect()
    con.execute("create table t(i int, head varchar)")
    con.executemany("insert into t values (?, ?)", list(enumerate(heads)))
    q = NOINDEX_META_TAG_RE.replace("'", "''")
    n = NOINDEX_NAME_RE.replace("'", "''")
    c = NOINDEX_CONTENT_RE.replace("'", "''")
    dk = {int(i): bool(x) for i, x in con.execute(f"""
      select i, len(list_filter(regexp_extract_all(head, '{q}', 1),
        t -> regexp_matches(t, '{n}') and regexp_matches(t, '{c}')
      )) > 0 from t""").fetchall()}
    assert sp == dk
