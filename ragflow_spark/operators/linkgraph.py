"""Web link-graph tier: outlink harvest, host-graph aggregation, degree
stats and fixed-point PageRank centrality.

The reference parses one page at a time and has no link-graph stage
(its HTML path, deepdoc/parser/html_parser.py:26-46, never looks at
anchors); this tier fills the training-data-pipeline gap — the
host-level quality / crawl-prioritization signal every CC-scale
curation stack derives from the anchor graph (Common Crawl publishes
exactly this as its host-level web graph; CCNet/RefinedWeb use host
reputation as a filter input alongside the content signals this repo
already computes in weburl.host_stats).

Plan shapes at 100 TB:

- ``extract_outlinks`` is one native projection (``regexp_extract_all``
  -> ``explode`` -> resolve/canonicalize expression tree): zero Python,
  zero shuffles, runs inside whole-stage codegen right off the page
  scan; column pruning reaches the parquet reader (only url + html are
  read).
- ``host_edges`` is one groupBy(src,dst) with map-side partial
  aggregation — the same single-shuffle shape as exact dedup.
- ``degree_stats`` is two aliased aggregations of the (already tiny)
  edge table joined host-to-host.
- ``pagerank`` keeps two distributed tables (ranks, out-weighted
  edges); each iteration is one join (shuffle on src) + one aggregation
  (shuffle on dst). The only driver traffic is N (one count) and the
  dangling-mass scalar per iteration — the dup_clusters precedent.
  ``localCheckpoint`` per iteration cuts the growing lineage. Hot
  destination hosts skew the dst aggregation, but sum is algebraic so
  map-side partial aggregation absorbs the skew before the shuffle; no
  salting needed.
- All rank mass is BIGINT nano-units with floor division (``div``), so
  sums are order-free and the DuckDB oracle matches bit-exact — the
  DSIR micro-nat / winnowing HUGEINT pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ragflow_spark.operators.weburl import _URL_RE, canonical_url, host_of

# href values: group 1 of the first href attribute inside an <a ...> tag;
# both quote styles, attribute order free. Java regex only (codegen).
_HREF_RE = r"(?i)<a\s[^>]*?href\s*=\s*[\"']([^\"'<>]*)[\"']"
# the unquoted variant browsers/libxml2 also accept (<a href=/x rel=y>):
# value runs to the first whitespace or '>', first char must not be a
# quote so the two patterns never double-count one anchor
_HREF_UNQ_RE = r"(?i)<a\s[^>]*?href\s*=\s*([^\"'\s>][^\s>]*)"

# schemes that never yield a fetchable document edge
_NON_FETCH_RE = r"(?i)^(javascript|mailto|tel|data|about):"

# whole <a ...> open tags, for the rel-aware harvest (skip_nofollow)
_A_TAG_RE = r"(?i)(<a\s[^>]*>)"
# rel values that opt the link out of endorsement semantics: nofollow
# (the original), plus the ugc/sponsored refinements that rank pipelines
# treat the same way
_REL_NOFOLLOW_RE = r"(?i)\brel\s*=\s*[\"']?[^\"'>]*\b(nofollow|ugc|sponsored)\b"


def resolve_href(base_url: Column, href: Column) -> Column:
    """Absolutize ``href`` against ``base_url`` (RFC 3986 §5 merge, the
    subset real anchors hit): full URLs pass through, ``//host/x`` takes
    the base scheme, ``/x`` takes the base origin, relative paths merge
    onto the base path's directory. Pure expression tree, no UDF."""
    href = F.trim(F.regexp_replace(href, r"#.*$", ""))  # fragment: client-side only
    scheme = F.lower(F.regexp_extract(base_url, _URL_RE, 1))
    origin = F.concat(
        scheme, F.lit("://"), F.lower(F.regexp_extract(base_url, _URL_RE, 2))
    )
    base_dir = F.regexp_replace(
        F.regexp_extract(base_url, _URL_RE, 3), r"[^/]*$", ""
    )
    base_dir = F.when(base_dir == "", F.lit("/")).otherwise(base_dir)
    return (
        F.when(href.rlike(r"(?i)^[a-z][a-z0-9+.\-]*:"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(origin, base_dir, href))
    )


def extract_outlinks(
    df: DataFrame, url_col: str = "url", html_col: str = "html",
    skip_nofollow: bool = False,
) -> DataFrame:
    """One row per (page, anchor): src_url, raw href, resolved canonical
    dst_url, src_host, dst_host. Binary html decodes as UTF-8 (the pages
    contract); empty/fragment-only/non-fetchable hrefs are dropped.

    ``skip_nofollow`` drops anchors whose rel carries a
    nofollow/ugc/sponsored token — the standard rank-pipeline reading of
    the author's non-endorsement — by harvesting whole ``<a>`` open tags
    and extracting each tag's href (quoted form first, else unquoted),
    so the rel test binds to its own anchor. Default OFF: the plain
    harvest keeps every edge (a crawl-frontier consumer wants them all)
    and is the oracle-pinned shape."""
    html_str = F.col(html_col).cast("string")
    if skip_nofollow:
        tags = F.filter(
            F.regexp_extract_all(html_str, F.lit(_A_TAG_RE), F.lit(1)),
            lambda t: ~t.rlike(_REL_NOFOLLOW_RE),
        )
        quoted = F.regexp_extract(F.col("_tag"), _HREF_RE, 1)
        unq = F.regexp_extract(F.col("_tag"), _HREF_UNQ_RE, 1)
        raw = df.select(
            F.col(url_col).alias("src_url"),
            F.explode(tags).alias("_tag"),
        ).select(
            "src_url",
            F.when(quoted != "", quoted).otherwise(unq).alias("href"),
        )
    else:
        raw = df.select(
            F.col(url_col).alias("src_url"),
            F.explode(
                F.concat(
                    F.regexp_extract_all(html_str, F.lit(_HREF_RE), F.lit(1)),
                    F.regexp_extract_all(
                        html_str, F.lit(_HREF_UNQ_RE), F.lit(1)
                    ),
                )
            ).alias("href"),
        )
    href = F.trim(F.regexp_replace(F.col("href"), r"#.*$", ""))
    resolved = resolve_href(F.col("src_url"), F.col("href"))
    return (
        raw.where(
            (href != "") & ~href.rlike(_NON_FETCH_RE)
        )
        .select(
            "src_url",
            "href",
            canonical_url(resolved).alias("dst_url"),
            host_of(F.col("src_url")).alias("src_host"),
            host_of(resolved).alias("dst_host"),
        )
    )


# a WELL-FORMED anchor: opening tag with href + inner content + close.
# Two extract_all runs over the same pattern align index-for-index, so
# arrays_zip pairs each href with its own inner HTML. Unclosed anchors
# (which extract_outlinks still harvests) simply don't match here.
_ANCHOR_RE = (
    r"(?i)<a\s[^>]*?href\s*=\s*[\"']([^\"'<>]*)[\"'][^>]*>"
    r"((?:(?!</?a[\s>/]).)*)</a>"  # inner run stops at any nested <a
)  # -- so an unclosed anchor never swallows its well-formed successor


def extract_anchor_texts(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per well-formed anchor: (src_url, href, text) with inner
    tags stripped and whitespace collapsed — the anchor-text signal
    (link-context quality, title enrichment, anchor-based labels).
    Same zero-UDF / zero-shuffle projection shape as the href harvest;
    non-fetchable and empty hrefs drop under the same rules."""
    html_str = F.col(html_col).cast("string")
    pairs = F.arrays_zip(
        F.regexp_extract_all(html_str, F.lit(_ANCHOR_RE), F.lit(1)),
        F.regexp_extract_all(html_str, F.lit(_ANCHOR_RE), F.lit(2)),
    )
    raw = df.select(
        F.col(url_col).alias("src_url"), F.explode(pairs).alias("pr")
    ).select(
        "src_url",
        F.col("pr")["0"].alias("href"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("pr")["1"], r"<[^>]*>", " "),
                r"\s+", " ",
            )
        ).alias("text"),
    )
    href = F.trim(F.regexp_replace(F.col("href"), r"#.*$", ""))
    return raw.where((href != "") & ~href.rlike(_NON_FETCH_RE))


def host_edges(outlinks: DataFrame) -> DataFrame:
    """Host-level weighted edge list: one shuffle with map-side combine.
    Self-edges are kept (they carry the root-relative-link signal and
    PageRank handles them like any edge); unparseable hosts drop."""
    return (
        outlinks.where((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-host link-weight totals: out_w / in_w (0 when absent). The
    classic spam shape is high out_w with near-zero in_w."""
    out_w = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.sum("weight").alias("out_w")
    )
    in_w = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.sum("weight").alias("in_w")
    )
    return (
        out_w.join(in_w, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_w", F.lit(0)).cast("long").alias("out_w"),
            F.coalesce("in_w", F.lit(0)).cast("long").alias("in_w"),
        )
    )


SCALE = 10**9  # total rank mass in nano-units


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Weighted PageRank by power iteration in exact BIGINT nano-units.

    rank_0(v)   = SCALE div N
    contrib(v)  = sum over in-edges (u,v,w): rank(u) * w div out_w(u)
    rank_i+1(v) = SCALE*(den-num) div (den*N)
                  + num * (contrib(v) + dangling div N) div den

    where dangling is the rank mass sitting on hosts with no out-edges,
    redistributed uniformly. Every operation is integer floor division
    on non-negative values, so Spark ``div`` and DuckDB ``//`` agree
    bit-for-bit and sums are order-independent — the oracle needs no
    float rounding. Total mass stays <= SCALE (floors only shed mass),
    so rank_u * w stays far under bigint range for any real host fan-in.

    Returns (host, rank_u) with sum(rank_u) ~= SCALE.
    """
    e = edges.select(
        F.col("src_host").alias("src"),
        F.col("dst_host").alias("dst"),
        F.col("weight").cast("long").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("host", F.lit(0).cast("long").alias("rank_u"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e_n = e.join(out_w, "src").localCheckpoint()  # reused every iteration
    out_hosts = out_w.select(F.col("src").alias("host")).localCheckpoint()
    base = (SCALE * (damping_den - damping_num)) // (damping_den * n)
    r = nodes.select(
        "host", F.lit(SCALE // n).cast("long").alias("rank_u")
    ).localCheckpoint()
    for _ in range(iterations):
        dangling = (
            r.join(out_hosts, "host", "left_anti")
            .agg(F.coalesce(F.sum("rank_u"), F.lit(0)).alias("d"))
            .collect()[0]["d"]
        )  # one scalar to the driver per iteration
        share = int(dangling) // n
        contrib = (
            e_n.join(r.withColumnRenamed("host", "src"), "src")
            .select(
                "dst", F.expr("(rank_u * w) div out_w").alias("c")
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        r = (
            nodes.join(
                contrib, nodes["host"] == contrib["dst"], "left"
            )
            .select(
                "host",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * (coalesce(contrib, 0L) + {share}))"
                        f" div {damping_den}"
                    )
                )
                .cast("long")
                .alias("rank_u"),
            )
            .localCheckpoint()
        )
    return r


def frontier_urls(
    outlinks: DataFrame,
    pages: DataFrame,
    url_col: str = "url",
    max_per_host: int | None = None,
) -> DataFrame:
    """Crawl-frontier discovery: canonical dst URLs harvested from the
    corpus that the corpus does not yet contain — the next fetch list of
    the crawl loop. One row per new URL with its host, in-corpus
    citation count, and distinct citing hosts (the standard frontier
    priority signals).

    Plan shape at 100 TB: the outlink side aggregates FIRST (one shuffle
    on dst_url, map-side combined — the hub page cited everywhere
    collapses to one row before any join), then LEFT ANTI against the
    corpus's canonical keys on the same key — Catalyst plans a shuffle
    join with the already-partitioned aggregate reused. ``max_per_host``
    adds the per-domain politeness cap (one window shuffle, the
    cap_per_host shape) so a link-farm host can't flood the frontier."""
    from ragflow_spark.operators.weburl import canonical_url

    known = pages.select(canonical_url(F.col(url_col)).alias("dst_url"))
    cand = (
        outlinks.where(F.col("dst_url").rlike(r"^https?://"))
        .groupBy("dst_url")
        .agg(
            F.count(F.lit(1)).alias("n_citations"),
            F.countDistinct("src_host").alias("n_citing_hosts"),
            F.min("dst_host").alias("host"),
        )
    )
    out = cand.join(known, "dst_url", "left_anti")
    if max_per_host is not None:
        w = Window.partitionBy("host").orderBy(
            F.desc("n_citations"), F.asc("dst_url")
        )
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_per_host)
            .drop("_rn")
        )
    return out


# sitemap <loc> values; (?is) lets the value's entity run cross lines
_SITEMAP_LOC_RE = r"(?is)<loc>\s*([^<]*?)\s*</loc>"
_SITEMAP_DOC_RE = r"(?is)<\s*(urlset|sitemapindex)[\s>]"


def extract_sitemap_urls(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per ``<loc>`` of every sitemap document in the corpus
    (``<urlset>`` page lists and ``<sitemapindex>`` nested indexes) —
    the OTHER standard frontier seed beside anchor outlinks: src_url,
    canonical dst_url, and ``is_nested_sitemap`` (the loc points at a
    further sitemap to fetch, by the sitemap.xml[.gz] name convention).

    Same zero-UDF projection shape as ``extract_outlinks``; the five XML
    character entities are decoded (sitemap locs legally carry
    ``&amp;`` in query strings), non-http(s) locs drop."""
    body = F.col(html_col).cast("string")
    loc = F.col("loc")
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&apos;", "'")):
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    return (
        df.where(body.rlike(_SITEMAP_DOC_RE))
        .select(
            F.col(url_col).alias("src_url"),
            F.explode(
                F.regexp_extract_all(body, F.lit(_SITEMAP_LOC_RE), F.lit(1))
            ).alias("loc"),
        )
        .where(loc.rlike(r"(?i)^https?://"))
        .select(
            "src_url",
            canonical_url(loc).alias("dst_url"),
            loc.rlike(r"(?i)sitemap[^/]*\.xml(\.gz)?([?#].*)?$")
            .cast("int")
            .alias("is_nested_sitemap"),
        )
    )
