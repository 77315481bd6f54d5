"""robots.txt parse + frontier filtering (operators/robots.py): RFC 9309
group selection, wildcard/anchor rules, longest-match precedence with
Allow winning ties. Hand goldens follow the RFC's own examples; the
composition test runs harvest -> frontier -> robots filter end-to-end."""

from pyspark.sql import functions as F

from ragflow_spark.operators import robots


ROBOTS_BODY = b"""
# example per RFC 9309 section 5
User-agent: *
Disallow: /admin/
Disallow: /private*
Allow: /private-garden/
Disallow: /*.gif$

User-agent: specialbot
User-agent: otherbot
Disallow: /only-special/

Sitemap: https://ex.com/sitemap.xml
"""


def _rules(spark, body=ROBOTS_BODY, url="https://ex.com/robots.txt"):
    df = spark.createDataFrame([(url, body)], "url string, html binary")
    return robots.parse_robots(df)


def test_parse_groups_and_patterns(spark):
    rows = _rules(spark).collect()
    by_agent = {}
    for r in rows:
        by_agent.setdefault(r["agent"], []).append(r)
    assert {r["path"] for r in by_agent["*"]} == {
        "/admin/", "/private*", "/private-garden/", "/*.gif$"}
    # consecutive user-agent lines share the group's rules
    assert {r["path"] for r in by_agent["specialbot"]} == {"/only-special/"}
    assert {r["path"] for r in by_agent["otherbot"]} == {"/only-special/"}
    gif = next(r for r in by_agent["*"] if r["path"] == "/*.gif$")
    assert gif["like_pattern"] == "/%.gif"  # $ anchors: no trailing %
    assert gif["spec_len"] == len("/.gif")


def _frontier(spark, urls):
    return spark.createDataFrame(
        [(u, "ex.com") for u in urls], "dst_url string, host string"
    )


def test_frontier_longest_match_allow_wins(spark):
    rules = _rules(spark)
    urls = [
        "https://ex.com/",                       # no rule -> allowed
        "https://ex.com/admin/x",                # disallow prefix
        "https://ex.com/private-stuff",          # /private* disallows
        "https://ex.com/private-garden/rose",    # longer Allow overrides
        "https://ex.com/pics/cat.gif",           # $-anchored disallow
        "https://ex.com/pics/cat.gif.html",      # anchor does NOT match
        "https://ex.com/only-special/x",         # other agent's rule only
    ]
    kept = {r["dst_url"] for r in robots.frontier_allowed(
        _frontier(spark, urls), rules).collect()}
    assert kept == {
        "https://ex.com/",
        "https://ex.com/private-garden/rose",
        "https://ex.com/pics/cat.gif.html",
        "https://ex.com/only-special/x",
    }


def test_frontier_specific_agent_group_excludes_star(spark):
    rules = _rules(spark)
    urls = ["https://ex.com/admin/x", "https://ex.com/only-special/x"]
    kept = {r["dst_url"] for r in robots.frontier_allowed(
        _frontier(spark, urls), rules, agent="specialbot").collect()}
    # specialbot has its OWN group: the * group's /admin/ rule does not
    # apply (RFC 9309 2.2.1 — never both), its own /only-special/ does
    assert kept == {"https://ex.com/admin/x"}


def test_frontier_no_robots_host_allowed(spark):
    rules = _rules(spark)
    f = spark.createDataFrame(
        [("https://other.com/anything", "other.com")],
        "dst_url string, host string",
    )
    assert robots.frontier_allowed(f, rules).count() == 1


def test_end_to_end_with_harvest_and_frontier(spark):
    from ragflow_spark.operators import linkgraph as lg

    page = (
        '<a href="https://ex.com/admin/secret">a</a>'
        '<a href="https://ex.com/public/ok">b</a>'
    ).encode()
    pages = spark.createDataFrame(
        [("https://src.com/p", page),
         ("https://ex.com/robots.txt", ROBOTS_BODY)],
        "url string, html binary",
    )
    frontier = lg.frontier_urls(lg.extract_outlinks(pages), pages)
    allowed = robots.frontier_allowed(frontier, robots.parse_robots(pages))
    assert {r["dst_url"] for r in allowed.collect()} == {
        "https://ex.com/public/ok"}


def test_robots_metadata_sitemaps_and_delay(spark):
    body = (b"Sitemap: https://ex.com/sitemap.xml\n"
            b"User-agent: *\n"
            b"Crawl-delay: 1.5\n"
            b"Disallow: /x\n"
            b"Sitemap: https://ex.com/sitemap-news.xml\n"
            b"User-agent: fastbot\n"
            b"Crawl-delay: nope\n")
    df = spark.createDataFrame(
        [("https://ex.com/robots.txt", body)], "url string, html binary"
    )
    rows = robots.robots_metadata(df).collect()
    sitemaps = {r["sitemap_url"] for r in rows if r["sitemap_url"]}
    delays = {(r["agent"], r["crawl_delay"])
              for r in rows if r["agent"] is not None}
    assert sitemaps == {"https://ex.com/sitemap.xml",
                        "https://ex.com/sitemap-news.xml"}
    assert delays == {("*", 1.5)}  # malformed fastbot delay dropped


def test_frontier_fuzz_matches_python_twin(spark):
    """Property check: the distributed longest-match expression agrees
    with the sequential RFC evaluator (robots.allowed_py) over random
    rule sets, agents and URL paths."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    seg = st.sampled_from(
        ["a", "b", "cd", "*", "x*y", "img", "%", "_", "1"])
    pat = st.lists(seg, min_size=0, max_size=4).map(
        lambda parts: "/" + "/".join(parts)
    ).flatmap(lambda p: st.sampled_from([p, p + "$"]))
    rule = st.tuples(
        st.sampled_from(["*", "mybot", "other"]),   # agent
        st.sampled_from([0, 1]),                    # allow
        pat,
    )

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rules=st.lists(rule, min_size=0, max_size=8),
           agent=st.sampled_from(["*", "mybot", "missing"]),
           paths=st.lists(
               st.lists(st.sampled_from(["a", "b", "cd", "xzy", "img",
                                         "%", "_", "q?k=v"]),
                        min_size=0, max_size=4).map(
                   lambda p: "/" + "/".join(p)),
               min_size=1, max_size=6))
    def check(rules, agent, paths):
        rows = [
            ("h.com", a, al, p, robots._compile_like(p),
             len(p.replace("*", "").rstrip("$")))
            for a, al, p in rules
        ]
        rules_df = spark.createDataFrame(rows, robots.ROBOTS_SCHEMA) \
            if rows else spark.createDataFrame([], robots.ROBOTS_SCHEMA)
        urls = list(dict.fromkeys(f"https://h.com{p}" for p in paths))
        f = spark.createDataFrame(
            [(u, "h.com") for u in urls], "dst_url string, host string"
        )
        kept = {r["dst_url"] for r in robots.frontier_allowed(
            f, rules_df, agent=agent).collect()}
        expect = {u for u in urls if robots.allowed_py(rows, agent, u)}
        assert kept == expect, (rules, agent, sorted(urls),
                                sorted(kept), sorted(expect))

    check()
