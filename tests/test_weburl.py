"""URL canonicalization + URL-level dedup (operators/weburl.py).

The registry's doc_exact_dedup stage='url' oracle is ANALYTIC (the
expected canonical string is derived from doc_id in SQL), so it only
exercises the mess features the synthetic URLs contain; these goldens pin
the canonicalizer's generic behavior — ports, schemes, passthrough,
tracking-prefix anchoring — beyond that corpus.
"""

import pytest
from pyspark.sql import functions as F

from ragflow_spark.operators import weburl

GOLDENS = [
    # full mess: case, default port, trailing slash, param order,
    # tracking param, fragment
    ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
     "https://www.example.com/a/b?a=1&b=2"),
    # default http port + root path variants
    ("http://site.com:80/", "http://site.com/"),
    ("http://site.com", "http://site.com/"),
    # explicit NON-default port survives; params still sort
    ("https://site.com:8080/p?z=1&y=2", "https://site.com:8080/p?y=2&z=1"),
    # tracking-only query disappears entirely (no dangling '?')
    ("https://site.com/p/?fbclid=abc", "https://site.com/p"),
    ("https://site.com/p?utm_medium=mail", "https://site.com/p"),
    # anchored prefix match: ref= is tracking, refresh= is NOT
    ("https://site.com/p?ref=hn&refresh=1", "https://site.com/p?refresh=1"),
    # repeated trailing slashes collapse
    ("HTTP://A.B/x//", "http://a.b/x"),
    # userinfo never distinguishes a page: stripped from the key, and
    # the host after the '@' is the one that lowercases / loses :443
    ("https://User:Pw@Host.COM:443/x", "https://host.com/x"),
    ("https://admin@site.com/p?b=1", "https://site.com/p?b=1"),
    # IPv6 bracket authority: the ':' host/port split doesn't apply —
    # identity passthrough rather than a mangled key
    ("https://[2001:db8::1]:8080/x", "https://[2001:db8::1]:8080/x"),
    # non-http(s) and unparseable input pass through byte-identical
    ("ftp://weird/keep?as=is", "ftp://weird/keep?as=is"),
    ("not a url at all", "not a url at all"),
    ("", ""),
]


def test_canonical_url_goldens(spark):
    df = spark.createDataFrame([(u,) for u, _ in GOLDENS], "url string")
    got = [
        r.c
        for r in df.select(
            weburl.canonical_url(F.col("url")).alias("c")
        ).collect()
    ]
    assert got == [want for _, want in GOLDENS]


def test_canonical_url_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the property that makes
    the key stable under re-ingestion of an already-canonical crawl."""
    df = spark.createDataFrame([(u,) for u, _ in GOLDENS], "url string")
    once = df.select(weburl.canonical_url(F.col("url")).alias("url"))
    twice = once.select(weburl.canonical_url(F.col("url")).alias("c"))
    assert [r.c for r in twice.collect()] == [w for _, w in GOLDENS]


def test_url_dedup_groups_and_keeper(spark):
    rows = [
        (1, "https://A.com/x?b=2&a=1"),
        (2, "HTTPS://a.COM:443/x/?a=1&b=2#top"),   # same canonical as 1
        (3, "https://a.com/x?a=1&b=2&utm_source=t"),  # same canonical
        (4, "https://a.com/y"),                     # different
        (5, None),                                  # null url -> own group
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    groups = {
        r.url: (r.keep_id, r.dup_count)
        for r in weburl.url_dedup_groups(df, "doc_id", "url").collect()
    }
    assert groups["https://a.com/x?a=1&b=2"] == (1, 3)
    assert groups["https://a.com/y"] == (4, 1)
    assert groups.get(None) == (5, 1)

    kept = sorted(
        r.doc_id for r in weburl.url_dedup(df, "doc_id", "url").collect()
    )
    assert kept == [1, 4, 5]


def test_canonical_url_fuzz_invariants(spark):
    """512 generated URLs (seeded, deterministic), one Spark pass, three
    invariants: idempotence; canonical http(s) output carries no
    fragment / no tracking params / params sorted with no empties; and
    non-http(s) inputs pass through byte-identical."""
    import random

    rng = random.Random(4242)
    trackers = ["utm_source", "utm_x", "fbclid", "gclid", "msclkid",
                "mc_eid", "igshid", "ref"]
    content = ["a", "b9", "page", "q", "zz"]

    def mess():
        scheme = rng.choice(["http", "https", "HTTP", "HTTPS", "ftp"])
        host = "".join(
            c.upper() if rng.random() < 0.4 else c
            for c in f"www.host{rng.randrange(30)}.example.com"
        )
        port = rng.choice(["", ":80", ":443", ":8080", ":65535"])
        path = "/" + "/".join(
            f"s{rng.randrange(9)}" for _ in range(rng.randrange(4))
        )
        path += "/" * rng.randrange(3)
        params = [f"{rng.choice(content)}={rng.randrange(99)}"
                  for _ in range(rng.randrange(3))]
        params += [f"{rng.choice(trackers)}=v{rng.randrange(9)}"
                   for _ in range(rng.randrange(3))]
        rng.shuffle(params)
        q = "?" + "&".join(params) if params else ""
        frag = rng.choice(["", "#x", "#a/b?c=1"])
        return f"{scheme}://{host}{port}{path}{q}{frag}"

    urls = [mess() for _ in range(512)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [
        r.c for r in df.select(
            weburl.canonical_url(F.col("url")).alias("c")).collect()
    ]
    df2 = spark.createDataFrame([(c,) for c in once], "url string")
    twice = [
        r.c for r in df2.select(
            weburl.canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert once == twice  # idempotent

    for raw, c in zip(urls, once):
        if raw.lower().startswith("ftp://"):
            assert c == raw  # passthrough, byte-identical
            continue
        assert "#" not in c
        assert not any(t + "=" in c for t in trackers if t != "ref")
        assert "?ref=" not in c and "&ref=" not in c
        if "?" in c:
            parts = c.split("?", 1)[1].split("&")
            assert parts == sorted(parts) and "" not in parts
        scheme = c.split("://", 1)[0]
        assert scheme in ("http", "https")
        host_part = c.split("://", 1)[1].split("/", 1)[0]
        assert host_part == host_part.lower()
        # only the scheme's OWN default port is stripped: http://x:443
        # keeps its (non-default) port
        default = ":80" if scheme == "http" else ":443"
        assert not host_part.endswith(default)


def test_url_dedup_latest_keeps_newest_fetch(spark):
    """The crawl-ingest variant (jobs/extract_job.py --url-dedup): one
    survivor per canonical URL, newest warc_ts wins, raw-url bytewise
    tiebreak — deterministic across runs and partition layouts."""
    import datetime as dt

    t = lambda d: dt.datetime(2026, 1, d)  # noqa: E731
    rows = [
        ("https://a.com/x?b=2&a=1", t(1), "old"),
        ("HTTPS://A.com/x/?a=1&b=2", t(3), "newest"),
        ("https://a.com/x?a=1&b=2&utm_source=t", t(2), "mid"),
        # tie on ts: smallest raw url bytewise wins ('A' < 'a')
        ("https://a.com/y?p=1", t(5), "tie-b"),
        ("https://A.COM/y?p=1", t(5), "tie-a"),
        ("https://a.com/z", t(1), "solo"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, body string")
    from ragflow_spark.operators.weburl import url_dedup_latest

    got = {r.body for r in url_dedup_latest(df, "url", "warc_ts").collect()}
    assert got == {"newest", "tie-a", "solo"}
    # survivors keep their RAW url (dedup never rewrites the key column)
    urls = {r.url for r in url_dedup_latest(df, "url", "warc_ts").collect()}
    assert "HTTPS://A.com/x/?a=1&b=2" in urls


def test_cap_per_host_deterministic_survivors(spark):
    """Per-domain cap keeps the bytewise-smallest urls per host, the same
    set regardless of input partitioning."""
    from ragflow_spark.operators.weburl import cap_per_host

    rows = [(i, f"https://h{i % 3}.com/p/{i:03d}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    for parts in (1, 7):
        got = sorted(
            r.doc_id
            for r in cap_per_host(
                df.repartition(parts), "url", 4
            ).collect()
        )
        # per host h{k}: ids k, k+3, ..., urls sort by zero-padded id, so
        # the 4 smallest ids of each residue class survive
        assert got == sorted(
            i for i in range(30) if i // 3 < 4
        ), parts


def test_cap_per_host_order_col(spark):
    """With order_col, the cap keeps the smallest values of THAT column
    (e.g. a quality rank), not url order."""
    from ragflow_spark.operators.weburl import cap_per_host

    rows = [(i, f"https://one.com/{i}", 100 - i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, url string, rank long")
    kept = sorted(
        r.doc_id
        for r in cap_per_host(df, "url", 3, order_col="rank").collect()
    )
    assert kept == [7, 8, 9]  # smallest rank = largest doc_id


@pytest.mark.parametrize("tracker", ["utm_x", "utm_", "fbclid", "gclid",
                                     "msclkid", "mc_eid", "igshid", "ref"])
def test_every_tracking_param_dropped(spark, tracker):
    df = spark.createDataFrame(
        [(f"https://s.com/p?{tracker}=v&keep=1",)], "url string")
    got = df.select(weburl.canonical_url(F.col("url")).alias("c")).first().c
    assert got == "https://s.com/p?keep=1"


# ---------------------------------------------------------------- host_stats


def _host_rows(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = weburl.host_stats(df, "source", "doc_id", "text")
    return {r["host"]: r.asDict() for r in out.collect()}


def test_host_stats_dup_loser_share(spark):
    """Three identical docs on one host: the min-id doc keeps, the other
    two are losers (2/3); a unique doc on another host has share 0."""
    good = "this is a perfectly reasonable sentence with many words"
    got = _host_rows(spark, [
        (1, good, "en", "a.com"),
        (2, good, "en", "a.com"),
        (3, good, "en", "a.com"),
        (4, "another unique readable document with plenty of words", "en", "b.com"),
    ])
    assert got["a.com"]["dup_loser_share"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["b.com"]["dup_loser_share"] == 0.0
    assert got["a.com"]["n_docs"] == 3 and got["b.com"]["n_docs"] == 1


def test_host_stats_dup_groups_cross_hosts(spark):
    """Duplicate groups span hosts: the keeper's host is charged no
    loser, the copier's host is — the cross-host spam-mirror signal."""
    t = "mirrored content that appears on two different hosts today"
    got = _host_rows(spark, [
        (1, t, "en", "orig.com"),
        (2, t, "en", "mirror.com"),
    ])
    assert got["orig.com"]["dup_loser_share"] == 0.0
    assert got["mirror.com"]["dup_loser_share"] == 1.0


def test_host_stats_top_lang_tie_breaks_bytewise(spark):
    """2 en vs 2 de on one host -> 'de' wins the bytewise tie-break."""
    mk = "completely different sentence number {} with enough words here"
    got = _host_rows(spark, [
        (1, mk.format(1), "en", "h"),
        (2, mk.format(2), "en", "h"),
        (3, mk.format(3), "de", "h"),
        (4, mk.format(4), "de", "h"),
    ])
    assert got["h"]["top_lang"] == "de"
    assert got["h"]["top_lang_share"] == pytest.approx(0.5)
    assert got["h"]["n_langs"] == 2


def test_host_stats_host_keep_thresholds(spark):
    """A host that is mostly dup losers flips host_keep to 0; a clean
    host keeps 1. Threshold is <= (inclusive)."""
    junk = "junk page body repeated verbatim across the spam domain now"
    rows = [(i, junk, "en", "spam.com") for i in range(1, 5)]
    rows.append((10, "one clean page with normal readable words on it", "en", "ok.com"))
    got = _host_rows(spark, rows)
    assert got["spam.com"]["dup_loser_share"] == 0.75
    assert got["spam.com"]["host_keep"] == 0
    assert got["ok.com"]["host_keep"] == 1


def test_host_stats_quality_fail_share(spark):
    """quality_keep is the quality_features heuristic: a <5-token doc
    fails, a normal sentence passes."""
    got = _host_rows(spark, [
        (1, "tiny doc", "en", "q.com"),
        (2, "a full sentence with more than five proper words", "en", "q.com"),
    ])
    assert got["q.com"]["quality_fail_share"] == pytest.approx(0.5)


# ------------------------------------------------------------ URL quality

URLQ_CASES = [
    # (url, expected url_keep, note)
    ("https://www.example.com/articles/cooking-pasta", 1, "clean"),
    ("https://bestporn.example/x", 0, "hard word as host substring"),
    ("https://site.com/free-viagra-pills", 0, "hard word in path"),
    ("https://www.essex.ac.uk/courses", 1,
     "the C4 false-positive guard: soft 'sex' never substring-matches"),
    ("https://sussex-dating.com/p", 1, "one soft word (334 < 1000)"),
    ("https://adult-dating-webcam.example/x", 0, "three soft words"),
    ("https://casino.example/poker", 1, "two soft words keep"),
    ("http://93.184.216.34/page", 1, "IP host flags but keeps"),
]


@pytest.mark.parametrize("url,keep,note", URLQ_CASES)
def test_url_quality_keep_goldens(spark, url, keep, note):
    df = spark.createDataFrame([(url,)], "url string")
    row = weburl.url_quality_flags(df, "url").first()
    assert row["url_keep"] == keep, (note, row.asDict())


def test_url_quality_structural_columns(spark):
    df = spark.createDataFrame(
        [("http://93.184.216.34/a/b/c?q=1",),
         ("https://user:pw@Site99.com/x",),
         ("not a url",)],
        "url string",
    )
    out = {r["url"]: r.asDict()
           for r in weburl.url_quality_flags(df, "url").collect()}
    ip = out["http://93.184.216.34/a/b/c?q=1"]
    assert ip["is_ip_host"] == 1
    assert ip["url_host"] == "93.184.216.34"
    assert ip["n_path_segments"] == 3
    assert ip["host_digit_milli"] == 769  # 10 digits / 13 chars
    site = out["https://user:pw@Site99.com/x"]
    assert site["url_host"] == "site99.com"  # userinfo-safe, lowercased
    assert site["host_digit_milli"] == 200  # 2 / 10
    bad = out["not a url"]
    assert bad["url_host"] == "" and bad["url_keep"] == 1
    assert bad["n_path_segments"] == 0 and bad["is_ip_host"] == 0


def test_url_quality_duckdb_twin(spark):
    """Bit-exact cross-engine gate: every url_quality column agrees with
    the DuckDB twin expressions over a corpus covering every bank word,
    hard-substring hosts, IP hosts, userinfo, and unparseable input."""
    import duckdb

    urls = [f"https://www.example{i}.com/kw/{w}" for i, (w, _, _)
            in enumerate(weburl.URL_WORD_BANK)]
    urls += [
        "https://freeporn-hub.example/x",        # hard substring host
        "https://xxxmovies.example/clips",       # hard substring host
        "https://www.essex.ac.uk/courses",       # soft non-hit
        "https://adult-dating-webcam.example/x", # 3 softs
        "http://10.0.0.1:8080/a/b",              # ip + port
        "https://u:p@h0st5.com/q?x=1",           # userinfo + digits
        "HTTPS://UPPER.COM/PORN",                # case folding
        "not a url", "",                          # unparseable
    ]
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
            assert sp.loc[u, name] == dk.loc[u, name], (name, u)
