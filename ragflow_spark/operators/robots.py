"""robots.txt politeness for the crawl loop: parse Disallow/Allow rule
groups out of robots.txt documents in the corpus and filter a frontier
by them — the counterpart of the per-host cap and the meta-robots
noindex gate (which govern what we KEEP; this governs what we FETCH).

Implements the modern Robots Exclusion Protocol subset (RFC 9309 /
Google REP, public spec):

- ``User-agent`` lines open a group; consecutive agent lines share the
  following rules; ``*`` is the catch-all group.
- ``Allow`` / ``Disallow`` rules are PATH MATCHES with ``*`` wildcards
  and the ``$`` end anchor; an empty Disallow value allows everything.
- Precedence: the MOST SPECIFIC matching rule wins (longest pattern
  sans wildcards); on a tie, Allow wins. No matching rule → allowed.
- Group selection: a host's group for the crawler's agent token if one
  exists, else the ``*`` group, never both (RFC 9309 §2.2.1).

Note: CPython's ``urllib.robotparser`` follows the 1994 first-match
ordering, NOT RFC 9309 longest-match — the tests pin the RFC examples,
so the two deliberately diverge on order-sensitive files.

Plan shape at 100 TB: parsing is per-document sequential group-state —
an Arrow-batched ``mapInPandas`` over ONLY the robots documents (a
``/robots.txt`` path filter rides the scan; the rule table is O(hosts),
slim). Matching is native: rules aggregate to one array per (host,
agent-scope) row, the frontier joins on host (one shuffle of slim keys)
and a ``filter``/``aggregate`` higher-order expression picks the
winning rule per URL — no per-row Python in the hot path, no explode of
frontier × rules.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from ragflow_spark.operators.weburl import _URL_RE, host_of

# rule rows: one per (host, agent, rule); match_pattern is a SQL LIKE
# pattern compiled at parse time (robots '*' -> '%', literal %/_ escaped
# with backslash), anchored: trailing '$' pins the end, otherwise a
# trailing '%' makes it a prefix match. spec_len = pattern length
# without wildcards (the RFC's specificity measure).
ROBOTS_SCHEMA = (
    "host string, agent string, allow int, path string, "
    "like_pattern string, spec_len int"
)


def _compile_like(path: str) -> str:
    """robots path pattern -> SQL LIKE pattern (escape \\, %, _; * -> %;
    trailing $ anchors the end, else prefix semantics)."""
    anchored = path.endswith("$")
    if anchored:
        path = path[:-1]
    out = []
    for ch in path:
        if ch in ("\\", "%", "_"):
            out.append("\\" + ch)
        elif ch == "*":
            out.append("%")
        else:
            out.append(ch)
    if not anchored:
        out.append("%")
    return "".join(out)


def _parse_one(host: str, text: str) -> list[tuple]:
    rows: list[tuple] = []
    agents: list[str] = []
    group_open = False  # collecting consecutive user-agent lines
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not group_open:
                agents = []
                group_open = True
            agents.append(val.lower())
            continue
        if key in ("allow", "disallow"):
            group_open = False
            if not agents:
                continue  # rule before any user-agent line: ignored
            if val == "":
                # empty Disallow = allow all (the classic permit file);
                # empty Allow matches nothing — skip both as no-ops
                continue
            spec = len(val.replace("*", "").rstrip("$"))
            like = _compile_like(val)
            for a in agents:
                rows.append(
                    (host, a, 1 if key == "allow" else 0, val, like, spec)
                )
        else:
            # sitemap:, crawl-delay:, unknown keys — end the agent run
            # but do not close the group's rule collection
            group_open = False
    return rows


def parse_robots(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One rule row per (host, agent, Allow/Disallow) parsed from every
    ``/robots.txt`` document in the corpus. The path filter rides the
    scan; only robots bodies reach the (tiny) Python parse."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in ("host", "agent", "allow", "path",
                                "like_pattern", "spec_len")
            }
            for row in pdf.itertuples():
                body = row.html
                text = (
                    bytes(body).decode("utf-8", "replace")
                    if body is not None else ""
                )
                for tup in _parse_one(row.host, text):
                    for k, v in zip(out, tup):
                        out[k].append(v)
            yield pd.DataFrame(out)

    robots = (
        df.filter(
            F.lower(F.regexp_extract(F.col(url_col), _URL_RE, 3))
            == "/robots.txt"
        )
        .select(
            host_of(F.col(url_col)).alias("host"),
            F.col(html_col).alias("html"),
        )
    )
    return robots.mapInPandas(run, schema=ROBOTS_SCHEMA)


def frontier_allowed(
    frontier: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "dst_url",
    host_col: str = "host",
) -> DataFrame:
    """Filter a frontier to the URLs the crawler may fetch under
    ``rules`` (a ``parse_robots`` output) for ``agent``.

    RFC 9309 evaluation as native expressions: per host the applicable
    group is the agent's own if it exists else ``*`` (never both;
    simplification vs the RFC: the agent token must match the group's
    token EXACTLY — product-token prefix matching, where group
    ``googlebot`` governs agent ``googlebot-news``, is not modeled); the
    host's rules arrive as ONE array column via a slim host-keyed join;
    the verdict is ``aggregate`` over the matching rules keeping the
    (spec_len, allow) maximum — struct max implements longest-match
    with Allow winning ties. Hosts with no robots file (or no matching
    rule) are allowed."""
    a = agent.lower()
    per_host = (
        rules.filter(F.col("agent").isin(a, "*"))
        .groupBy(F.col("host"))
        .agg(
            F.max(F.when(F.col("agent") == a, 1).otherwise(0)).alias(
                "_has_own"
            ),
            F.collect_list(
                F.struct("agent", "allow", "like_pattern", "spec_len")
            ).alias("_rules"),
        )
        .select(
            F.col("host").alias(host_col),
            F.filter(
                F.col("_rules"),
                lambda r: F.when(
                    F.col("_has_own") == 1, r["agent"] == a
                ).otherwise(r["agent"] == "*"),
            ).alias("_rules"),
        )
    )
    path = F.regexp_extract(F.col(url_col), _URL_RE, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # also match against path+query (rules may constrain query strings)
    q = F.regexp_extract(F.col(url_col), _URL_RE, 4)
    target = F.concat(path, q)
    matching = F.filter(
        F.col("_rules"), lambda r: F.like(target, r["like_pattern"])
    )
    # (spec_len, allow) max: longest match wins, Allow beats Disallow on
    # ties; sentinel (-1, 1) = "no rule" = allowed
    best = F.aggregate(
        matching,
        F.struct(
            F.lit(-1).alias("spec_len"), F.lit(1).alias("allow")
        ),
        lambda acc, r: F.when(
            (r["spec_len"] > acc["spec_len"])
            | (
                (r["spec_len"] == acc["spec_len"])
                & (r["allow"] > acc["allow"])
            ),
            F.struct(
                r["spec_len"].alias("spec_len"), r["allow"].alias("allow")
            ),
        ).otherwise(acc),
    )
    joined = frontier.join(per_host, on=host_col, how="left")
    return (
        joined.withColumn(
            "_verdict",
            F.when(F.col("_rules").isNull(), F.lit(1)).otherwise(
                best["allow"]
            ),
        )
        .filter(F.col("_verdict") == 1)
        .drop("_rules", "_verdict")
    )


ROBOTS_META_SCHEMA = "host string, sitemap_url string, agent string, crawl_delay double"


def robots_metadata(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """The non-rule robots.txt signals: ``Sitemap:`` URLs (host-global
    per RFC 9309 — they seed the sitemap harvest) and per-agent-group
    ``Crawl-delay`` (non-standard but ubiquitous; the fetch scheduler's
    pacing input). One row per (host, sitemap) and one per (host,
    agent) with a delay — the two signals share the parse pass; fields
    not applicable to a row are NULL."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in ("host", "sitemap_url", "agent",
                                "crawl_delay")
            }

            def emit(host, sm, agent, delay):
                out["host"].append(host)
                out["sitemap_url"].append(sm)
                out["agent"].append(agent)
                out["crawl_delay"].append(delay)

            for row in pdf.itertuples():
                body = row.html
                text = (
                    bytes(body).decode("utf-8", "replace")
                    if body is not None else ""
                )
                agents: list[str] = []
                group_open = False
                for raw_line in text.splitlines():
                    line = raw_line.split("#", 1)[0].strip()
                    if not line or ":" not in line:
                        continue
                    key, _, val = line.partition(":")
                    key = key.strip().lower()
                    val = val.strip()
                    if key == "user-agent":
                        if not group_open:
                            agents = []
                            group_open = True
                        agents.append(val.lower())
                        continue
                    group_open = False
                    if key == "sitemap" and val:
                        emit(row.host, val, None, None)
                    elif key == "crawl-delay" and agents:
                        try:
                            d = float(val)
                        except ValueError:
                            continue
                        for a in agents:
                            emit(row.host, None, a, d)
            yield pd.DataFrame(out)

    robots = (
        df.filter(
            F.lower(F.regexp_extract(F.col(url_col), _URL_RE, 3))
            == "/robots.txt"
        )
        .select(
            host_of(F.col(url_col)).alias("host"),
            F.col(html_col).alias("html"),
        )
    )
    return robots.mapInPandas(run, schema=ROBOTS_META_SCHEMA)


def allowed_py(
    rules: list[tuple], agent: str, url: str
) -> bool:
    """Sequential reference twin of ``frontier_allowed`` for one URL —
    the oracle the fuzz suite checks the distributed expression against.
    ``rules`` rows are ``parse_robots`` tuples (host, agent, allow,
    path, like_pattern, spec_len); host selection is the caller's job
    (pass one host's rows)."""
    import re as _re

    a = agent.lower()
    own = [r for r in rules if r[1] == a]
    group = own if own else [r for r in rules if r[1] == "*"]
    m = _re.match(
        r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?", url
    )
    path = (m.group(3) or "") if m else ""
    path = path or "/"
    target = path + ((m.group(4) or "") if m else "")
    best = (-1, 1)  # (spec_len, allow): no rule -> allowed
    for _h, _a, allow, pat, _like, spec in group:
        anchored = pat.endswith("$")
        core = pat[:-1] if anchored else pat
        rx = "".join(".*" if c == "*" else _re.escape(c) for c in core)
        rx = "^" + rx + ("$" if anchored else ".*")
        if _re.match(rx, target):
            if (spec, allow) > best:
                best = (spec, allow)
    return best[1] == 1
