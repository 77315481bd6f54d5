"""Link-graph tier: outlink harvest, host edges, degree stats, and the
fixed-point PageRank — Spark results checked against an independent
pure-Python reimplementation of the same integer arithmetic."""

import pytest
from pyspark.sql import functions as F

from ragflow_spark.operators import linkgraph as lg


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


# ------------------------------------------------- outlink extraction


def test_extract_outlinks_resolution_branches(spark):
    html = (
        '<p>x</p>'
        '<a href="https://other.com/abs">abs</a>'
        "<a href='//proto.com/p'>proto</a>"
        '<a href="/root/r">root</a>'
        '<a href="sib.html">rel</a>'
        '<a href="#frag">frag-only</a>'
        '<a href="/keep#frag">frag-strip</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a class="x" href="https://Attr.Order.com/">attr</a>'
    )
    df = _pages(spark, [("https://src.com/dir/page.html", html)])
    out = lg.extract_outlinks(df).orderBy("href").collect()
    by_href = {r["href"]: r for r in out}
    assert "javascript:void(0)" not in by_href
    assert "mailto:a@b.c" not in by_href
    assert "#frag" not in by_href and "" not in by_href
    assert by_href["https://other.com/abs"]["dst_host"] == "other.com"
    assert by_href["//proto.com/p"]["dst_url"] == "https://proto.com/p"
    assert by_href["/root/r"]["dst_url"] == "https://src.com/root/r"
    # relative path merges onto the base directory
    assert by_href["sib.html"]["dst_url"] == "https://src.com/dir/sib.html"
    # fragment stripped before resolution
    assert by_href["/keep#frag"]["dst_url"] == "https://src.com/keep"
    # canonicalization lowercases the host
    assert by_href['https://Attr.Order.com/']["dst_host"] == "attr.order.com"
    assert all(r["src_host"] == "src.com" for r in out)


def test_extract_outlinks_unquoted_href(spark):
    html = ('<a href=/rel rel=nofollow>u</a>'
            '<a href=https://q.com/x>abs</a>'
            '<a href="/quoted">q</a>')
    df = _pages(spark, [("https://a.com/", html)])
    got = sorted(r["dst_url"] for r in lg.extract_outlinks(df).collect())
    assert got == [
        "https://a.com/quoted", "https://a.com/rel", "https://q.com/x",
    ]


def test_extract_outlinks_binary_html_and_quotes(spark):
    df = spark.createDataFrame(
        [("https://a.com/", bytearray(b'<a href="https://b.com/x">l</a>'))],
        "url string, html binary",
    )
    out = lg.extract_outlinks(df).collect()
    assert len(out) == 1 and out[0]["dst_host"] == "b.com"


def test_extract_outlinks_is_pure_projection(spark):
    df = _pages(spark, [("https://a.com/", "<a href='/x'>y</a>")])
    plan = lg.extract_outlinks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: harvest is a projection
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_extract_anchor_texts(spark):
    html = (
        '<a href="https://b.com/x"><b>Bold</b>  link</a>'
        '<a href="/y">plain</a>'
        '<a href="javascript:x">js</a>'
        '<a href="#frag">frag</a>'
        '<a href="/unclosed">no close'
        '<a href="/z" class="c">with attrs</a>'
    )
    df = _pages(spark, [("https://a.com/", html)])
    rows = sorted(
        (r["href"], r["text"])
        for r in lg.extract_anchor_texts(df).collect()
    )
    # tags stripped + whitespace collapsed; javascript/fragment-only
    # filtered; the unclosed anchor neither appears nor swallows /z
    assert rows == [
        ("/y", "plain"),
        ("/z", "with attrs"),
        ("https://b.com/x", "Bold link"),
    ]


# ------------------------------------------------- edges and degrees


def _edges(spark):
    rows = [
        ("a.com", "b.com", 3),
        ("a.com", "c.com", 1),
        ("b.com", "a.com", 2),
        ("b.com", "b.com", 1),  # self edge
        ("c.com", "sink.com", 5),  # sink.com: dangling (no out-edges)
    ]
    return spark.createDataFrame(
        rows, "src_host string, dst_host string, weight long"
    )


def test_host_edges_aggregates_and_keeps_self(spark):
    pages = _pages(
        spark,
        [
            ("https://a.com/1", '<a href="https://b.com/x">l</a>'
             '<a href="https://b.com/y">l</a><a href="/self">s</a>'),
            ("https://a.com/2", '<a href="https://b.com/z">l</a>'),
        ],
    )
    edges = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in lg.host_edges(lg.extract_outlinks(pages)).collect()
    }
    assert edges == {("a.com", "b.com"): 3, ("a.com", "a.com"): 1}


def test_degree_stats(spark):
    d = {r["host"]: (r["out_w"], r["in_w"])
         for r in lg.degree_stats(_edges(spark)).collect()}
    assert d["a.com"] == (4, 2)
    assert d["b.com"] == (3, 4)
    assert d["c.com"] == (5, 1)
    assert d["sink.com"] == (0, 5)  # classic dangling sink


# ------------------------------------------------------ pagerank math


def _pagerank_py(edges, iterations=3, num=85, den=100):
    """Independent reimplementation: same integer contract, plain dicts."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    r = {v: lg.SCALE // n for v in nodes}
    base = lg.SCALE * (den - num) // (den * n)
    for _ in range(iterations):
        dangling = sum(r[v] for v in nodes if v not in out_w)
        share = dangling // n
        contrib = {v: 0 for v in nodes}
        for s, d, w in edges:
            contrib[d] += r[s] * w // out_w[s]
        r = {v: base + num * (contrib[v] + share) // den for v in nodes}
    return r


@pytest.mark.parametrize("iterations", [1, 3])
def test_pagerank_matches_reference_math(spark, iterations):
    rows = [
        ("a.com", "b.com", 3), ("a.com", "c.com", 1), ("b.com", "a.com", 2),
        ("b.com", "b.com", 1), ("c.com", "sink.com", 5),
    ]
    edges = spark.createDataFrame(
        rows, "src_host string, dst_host string, weight long"
    )
    got = {r["host"]: r["rank_u"]
           for r in lg.pagerank(edges, iterations=iterations).collect()}
    assert got == _pagerank_py(rows, iterations=iterations)


def test_pagerank_mass_conservation_and_sink_gain(spark):
    res = {r["host"]: r["rank_u"]
           for r in lg.pagerank(_edges(spark), iterations=3).collect()}
    total = sum(res.values())
    # floors only shed mass: total within n*iters*small of SCALE
    assert lg.SCALE * 0.98 < total <= lg.SCALE
    # the sink receives a heavy in-edge: it must out-rank its source
    assert res["sink.com"] > res["c.com"]


def test_pagerank_plan_has_no_cartesian_or_python(spark):
    edges = _edges(spark)
    plan = (
        lg.pagerank(edges, iterations=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_skip_nofollow_drops_only_optout_anchors(spark):
    html = (
        '<html><body>'
        '<a href="https://keep1.com/a">k1</a>'
        '<a rel="nofollow" href="https://drop1.com/x">d1</a>'
        '<a href="https://drop2.com/y" rel=ugc>d2</a>'
        "<a rel='sponsored noopener' href='https://drop3.com/z'>d3</a>"
        '<a rel="noopener" href="https://keep2.com/b">k2</a>'
        '<a href=https://keep3.com/c rel=author>k3</a>'
        '</body></html>'
    ).encode()
    df = spark.createDataFrame(
        [("https://src.com/p", html)], "url string, html binary"
    )
    from ragflow_spark.operators import linkgraph as lg

    default = {r["dst_host"] for r in lg.extract_outlinks(df).collect()}
    assert default == {"keep1.com", "keep2.com", "keep3.com",
                       "drop1.com", "drop2.com", "drop3.com"}
    follow = {r["dst_host"]
              for r in lg.extract_outlinks(df, skip_nofollow=True).collect()}
    assert follow == {"keep1.com", "keep2.com", "keep3.com"}


def test_skip_nofollow_harvest_matches_default_without_rel(spark):
    """On rel-free pages the tag-based harvest and the default harvest
    emit the SAME edge multiset (quoted + unquoted forms both)."""
    html = (
        '<div><a href="https://a.com/1">x</a>'
        "<a href=https://b.com/2 class=c>y</a>"
        '<a href="/rel/path">z</a></div>'
    ).encode()
    df = spark.createDataFrame(
        [("https://src.com/d/p", html)], "url string, html binary"
    )
    from ragflow_spark.operators import linkgraph as lg

    d = sorted((r["href"], r["dst_url"])
               for r in lg.extract_outlinks(df).collect())
    t = sorted((r["href"], r["dst_url"])
               for r in lg.extract_outlinks(df, skip_nofollow=True).collect())
    assert d == t and len(d) == 3


def test_frontier_urls_discovers_only_unknown(spark):
    html = (
        '<a href="https://known.com/a">k</a>'
        '<a href="https://new1.com/x">n</a>'
        '<a href="https://new1.com/x">n again</a>'
        '<a href="https://new2.com/y?utm_source=z">tracked</a>'
        '<a href="mailto:a@b.c">m</a>'
    ).encode()
    pages = spark.createDataFrame(
        [("https://src.com/p", html),
         ("https://known.com/a/", b"<p>already crawled</p>"),
         ("https://new2.com/y", b"<p>crawled under the canonical key</p>")],
        "url string, html binary",
    )
    from ragflow_spark.operators import linkgraph as lg

    out = {r["dst_url"]: r for r in lg.frontier_urls(
        lg.extract_outlinks(pages), pages).collect()}
    # known.com/a/ canonicalizes to known.com/a -> NOT in the frontier;
    # new2.com's tracked variant canonicalizes onto the crawled key too
    assert set(out) == {"https://new1.com/x"}
    assert out["https://new1.com/x"]["n_citations"] == 2
    assert out["https://new1.com/x"]["n_citing_hosts"] == 1


def test_frontier_urls_host_cap(spark):
    anchors = "".join(
        f'<a href="https://farm.com/p{i}">x</a>' for i in range(10)
    ) + '<a href="https://solo.com/q">y</a>'
    pages = spark.createDataFrame(
        [("https://src.com/p", anchors.encode())],
        "url string, html binary",
    )
    from ragflow_spark.operators import linkgraph as lg

    out = lg.frontier_urls(lg.extract_outlinks(pages), pages,
                           max_per_host=3).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r["dst_url"])
    assert len(by_host["farm.com"]) == 3
    assert by_host["solo.com"] == ["https://solo.com/q"]


def test_extract_sitemap_urls(spark):
    urlset = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        '<url><loc>https://Site.com/page1/</loc><lastmod>2024-01-01'
        '</lastmod></url>'
        '<url><loc>\n  https://site.com/p?a=1&amp;b=2  \n</loc></url>'
        '<url><loc>ftp://skip.me/x</loc></url>'
        '</urlset>'
    ).encode()
    index = (
        '<sitemapindex><sitemap>'
        '<loc>https://site.com/sitemap-2.xml</loc>'
        '</sitemap></sitemapindex>'
    ).encode()
    plain = b'<html><body><loc>https://not-a-sitemap.com/x</loc></body></html>'
    df = spark.createDataFrame(
        [("https://site.com/sitemap.xml", urlset),
         ("https://site.com/sitemap_index.xml", index),
         ("https://other.com/page", plain)],
        "url string, html binary",
    )
    from ragflow_spark.operators import linkgraph as lg

    rows = {(r["src_url"], r["dst_url"]): r["is_nested_sitemap"]
            for r in lg.extract_sitemap_urls(df).collect()}
    # the plain html page (no <urlset>/<sitemapindex>) contributes nothing;
    # ftp loc drops; host canonicalizes; the xml entity decodes
    assert rows == {
        ("https://site.com/sitemap.xml", "https://site.com/page1"): 0,
        ("https://site.com/sitemap.xml", "https://site.com/p?a=1&b=2"): 0,
        ("https://site.com/sitemap_index.xml",
         "https://site.com/sitemap-2.xml"): 1,
    }
