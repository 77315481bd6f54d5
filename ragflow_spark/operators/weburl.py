"""URL canonicalization + URL-level exact dedup: the first identity pass
of a Common-Crawl-style pipeline. The north-rule input table is keyed by
``url`` (BASELINE.json input_hint), and real crawls re-fetch the same page
under trivially-different URLs — case-shuffled hosts, default ports,
tracking parameters, reordered query strings, fragments, trailing
slashes. Canonicalizing before content dedup collapses those re-fetches
with pure string arithmetic, orders of magnitude cheaper than minhash.

The reference has no crawl tier (SURVEY S13 out of scope); this covers
the training-data gap alongside exact/minhash/simhash dedup, following
the normalization steps shared by the public pipelines (CCNet's URL
dedup, Dolma §2.1; RFC 3986 §6 syntax-based normalization).

Plan shape at 100 TB: ``canonical_url`` is one native expression tree —
regexp field splits, an array filter/sort over query params, string
rebuild — running inside whole-stage codegen with zero UDFs and zero
shuffles; ``url_dedup_groups`` adds the same single 16-byte-key shuffle
as content exact-dedup. Nothing here ever collects.

Canonical form (applied to absolute http(s) URLs; anything unparseable
passes through unchanged so the op never destroys a key):
- scheme and host lowercased
- default ports stripped (``:80`` for http, ``:443`` for https); any
  other explicit port kept
- tracking params dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``mc_eid``, ``igshid``, ``ref``), the rest sorted
  bytewise so param order can't split a group
- fragment dropped (never sent to the server)
- trailing slashes collapsed: path ``/a/b/`` -> ``/a/b``, empty path ->
  ``/``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Shared verbatim with the DuckDB oracle in __spark_entry__ — prefix
# match for utm_, exact match for the rest (Java regex and RE2 agree on
# every construct used here).
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid|ref)="

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def canonical_url(url: Column) -> Column:
    """RFC-3986-style syntax canonicalization as ONE native expression.

    Each piece is a regexp_extract over the raw string (cheap, codegen),
    so the expression tree stays flat instead of threading one giant
    nested replace chain."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    authority = F.regexp_extract(url, _URL_RE, 2)
    raw_path = F.regexp_extract(url, _URL_RE, 3)
    raw_query = F.regexp_extract(url, _URL_RE, 4)  # includes leading '?'

    # userinfo (user:pass@) is stripped from the key — credentials never
    # distinguish a page; the port regex is '@'-safe already (digits-only
    # anchored at end). IPv6 bracket hosts pass through unchanged below.
    host = F.lower(
        F.regexp_extract(authority, r"^(?:[^@]*@)?([^:@]*)", 1)
    )
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))

    path = F.regexp_replace(raw_path, r"/+$", "")
    path_part = F.when(path == "", F.lit("/")).otherwise(path)

    kept = F.array_sort(
        F.filter(
            F.split(F.regexp_replace(raw_query, r"^\?", ""), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))

    canon = F.concat(
        scheme, F.lit("://"), host, port_part, path_part, query_part
    )
    # non-absolute / unparseable input passes through as identity, never
    # a mangled key; IPv6 bracket authorities too (the ':'-based
    # host/port split above doesn't apply to them)
    return F.when(
        (scheme == "")
        | ~scheme.isin("http", "https")
        | authority.contains("["),
        url,
    ).otherwise(canon)


def url_dedup_groups(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """One row per canonical URL: keeper id (min), dup count — the URL
    twin of ``dedup.exact_dedup_groups`` and the same 100 TB shape (one
    shuffle on the canonical key with map-side partial aggregation)."""
    return (
        df.select(F.col(id_col), canonical_url(F.col(url_col)).alias("url"))
        .groupBy("url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Keep one row per canonical-URL group (the min-id row)."""
    keep = url_dedup_groups(df, id_col, url_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def host_of(url: Column) -> Column:
    """Lowercased host of an absolute URL ('' when unparseable) — the
    grouping key for per-domain stats and caps. Userinfo-safe (r7,
    matching ``canonical_url``): ``user:pass@host`` yields ``host``,
    not ``user``."""
    return F.lower(
        F.regexp_extract(
            F.regexp_extract(url, _URL_RE, 2), r"^(?:[^@]*@)?([^:@]*)", 1
        )
    )


def cap_per_host(
    df: DataFrame,
    url_col: str,
    max_per_host: int,
    order_col: str | None = None,
) -> DataFrame:
    """Per-domain cap — the standard anti-spam down-sampling step: keep at
    most ``max_per_host`` docs per host, chosen deterministically (by
    ``order_col`` ascending, default the raw url bytewise, ties broken by
    the url) so the same corpus always yields the same survivors
    regardless of partitioning.

    One window shuffle on the host. A mega-host (the skew case: one
    domain with 10^8 pages at crawl scale) funnels into one partition
    ONLY to rank its rows — the window carries just the sort keys, and
    everything past rank ``max_per_host`` drops immediately; if a single
    host's keys outgrow an executor, pre-filter with a per-partition
    approximate cap before the exact pass."""
    order = (
        [F.col(order_col).asc(), F.col(url_col).asc()]
        if order_col
        else [F.col(url_col).asc()]
    )
    w = Window.partitionBy("_host").orderBy(*order)
    return (
        df.withColumn("_host", host_of(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_host)
        .drop("_rn", "_host")
    )


def url_dedup_latest(df: DataFrame, url_col: str, ts_col: str) -> DataFrame:
    """Keep ONE fetch per canonical URL — the newest by ``ts_col``, ties
    broken by smallest raw url bytewise (deterministic across runs and
    layouts). The crawl-ingest variant of ``url_dedup``: a crawl re-fetches
    the same page under param-shuffled URLs over time and the freshest
    body wins.

    One window shuffle on the canonical key. Per-key fan-in is the
    re-fetch count of one page — naturally bounded, no skew lane needed;
    row_number (not rank) guarantees exactly one survivor per group."""
    w = Window.partitionBy("_canon").orderBy(
        F.col(ts_col).desc(), F.col(url_col).asc()
    )
    return (
        df.withColumn("_canon", canonical_url(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_canon")
    )


def host_stats(
    df: DataFrame,
    host_col: str,
    id_col: str,
    text_col: str,
    max_dup_share: float = 0.5,
    max_quality_fail_share: float = 0.5,
) -> DataFrame:
    """Per-host corpus rollup — the host-level blocklist signal every
    web pipeline computes before document-level work (CCNet/Dolma drop
    whole domains whose pages are mostly duplicated or low-quality;
    Gopher §A.1.1 keeps a manual domain blocklist): document and char
    volume, quality-fail share (the C4-style ``quality_keep`` heuristic
    from ``textstats.quality_features``), exact-dup-loser share (a doc
    loses if it is not the min-id holder of its normalized-text
    fingerprint group — identical to ``dedup.exact_dedup`` keeper
    choice), language profile (distinct langs, modal lang with bytewise
    tie-break, its share), and a composed ``host_keep`` verdict.

    Plan shape at 100 TB: ONE scan, one projection (quality columns
    ride the ``quality_features`` passthrough — no self-join back to
    the scan for them); the dup-loser bit is ``min(id) over (partition
    by fp)`` — the same single 16-byte-key shuffle class as exact
    dedup, no join-back; then ONE (host, lang) groupBy with map-side
    partial aggregation collapses the corpus to hosts x langs rows, and
    the host rollup — modal lang included, as ``min(struct(-n, lang))``
    so no window, no join, no second branch re-scanning the table —
    runs on that tiny relation. All shares are exact integer-sum /
    count divisions — no float-accumulation order sensitivity. No
    collects, no UDFs, whole-stage codegen throughout.
    """
    from ragflow_spark.operators.textstats import quality_features
    from ragflow_spark.functions.text import fingerprint_md5

    base = quality_features(
        df, id_col, text_col,
        passthrough=(
            F.col(host_col).alias("host"),
            F.col("lang"),
            fingerprint_md5(F.col(text_col)).alias("_fp"),
        ),
    ).withColumn(
        "_dup_loser",
        (
            F.col(id_col)
            != F.min(id_col).over(Window.partitionBy("_fp"))
        ).cast("int"),
    )
    per_lang = base.groupBy("host", "lang").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("n_chars").alias("_chars"),
        F.sum("n_tokens").alias("_toks"),
        F.sum("quality_keep").alias("_keep"),
        F.sum("_dup_loser").alias("_dl"),
    )
    # modal lang as an aggregate: struct ordering is field-by-field, so
    # min over (-count, lang) is "max count, ties to the bytewise-least
    # lang" — no window, no join-back, no second pass over per_lang
    modal = F.min(
        F.struct(
            (-F.col("_n")).alias("neg_n"), F.col("lang").alias("lang")
        )
    )
    return (
        per_lang.groupBy("host")
        .agg(
            F.sum("_n").alias("n_docs"),
            F.sum("_chars").alias("n_chars"),
            F.round(F.sum("_toks") / F.sum("_n"), 6).alias("mean_tokens"),
            F.round(1.0 - F.sum("_keep") / F.sum("_n"), 6).alias(
                "quality_fail_share"
            ),
            F.round(F.sum("_dl") / F.sum("_n"), 6).alias(
                "dup_loser_share"
            ),
            F.count(F.lit(1)).alias("n_langs"),
            modal.alias("_modal"),
        )
        .withColumn("top_lang", F.col("_modal.lang"))
        .withColumn(
            "top_lang_share",
            F.round(-F.col("_modal.neg_n") / F.col("n_docs"), 6),
        )
        .withColumn(
            "host_keep",
            (
                (F.col("dup_loser_share") <= max_dup_share)
                & (F.col("quality_fail_share") <= max_quality_fail_share)
            ).cast("int"),
        )
        .drop("_modal")
    )


# ------------------------------------------------------------ URL quality

# (word, weight_milli, hard) — the RefinedWeb-style URL word bank
# (Penedo et al. 2023 §3.1: URL filtering by a weighted banned-word
# score BEFORE any content is parsed; C4 applied the same idea with its
# public badwords list). HARD words are unambiguous and also match as
# SUBSTRINGS of the host (concatenated-word domains); SOFT words are
# ambiguous in isolation and match only as whole URL words — substring
# matching of soft words is deliberately off (the documented C4 failure
# mode: "sex" as a substring bans essex.ac.uk / sussex.ac.uk). One hard
# hit reaches the default fail threshold on its own; soft words need
# three distinct hits. The bank is a PARAMETER (production swaps in the
# UT1-scale list); this built-in set is the demo default, sized for
# tests.
URL_WORD_BANK: list[tuple[str, int, bool]] = [
    ("porn", 1000, True),
    ("xxx", 1000, True),
    ("hentai", 1000, True),
    ("viagra", 1000, True),
    ("warez", 1000, True),
    ("sex", 334, False),
    ("adult", 334, False),
    ("escort", 334, False),
    ("casino", 334, False),
    ("poker", 334, False),
    ("torrent", 334, False),
    ("pills", 334, False),
    ("dating", 334, False),
    ("webcam", 334, False),
]

URL_FAIL_MILLI = 1000

# shared verbatim with the DuckDB twin: URL words are the non-empty
# maximal [a-z0-9] runs of the lowercased URL
_URL_WORD_SPLIT = r"[^a-z0-9]+"


def url_words(url: Column) -> Column:
    """The URL's word array (non-empty maximal [a-z0-9] runs of the
    lowercased URL) — pre-stage this in a narrow select when the bank is
    scored over it: the lambda-filter keeps the projection out of
    whole-stage codegen, so subexpression elimination never runs and an
    inlined copy would re-split the URL once per bank word.
    CollapseProject leaves a staged non-cheap column alone when it is
    referenced more than once, so the stage survives optimization."""
    return F.filter(F.split(F.lower(url), _URL_WORD_SPLIT), lambda x: x != "")


def url_quality_columns(
    url: Column,
    bank: list[tuple[str, int, bool]] | None = None,
    fail_milli: int = URL_FAIL_MILLI,
    words: Column | None = None,
    host: Column | None = None,
) -> dict[str, Column]:
    """URL-only quality signals as named native expressions — the
    cheapest filter a web pipeline owns, running before a single content
    byte is parsed (RefinedWeb §3.1 runs it first for exactly that
    reason). Zero UDFs, zero shuffles: a word-array build, a flat sum of
    presence terms over the bank, and a few host regexes, one projection.

    Pass pre-staged ``words`` / ``host`` columns (``url_words`` /
    ``host_of`` selected once in a parent projection) so the split and
    the host extraction run once per row instead of once per bank word —
    see ``url_words`` for why codegen can't do this for free here.

    Columns: ``url_host`` (userinfo-safe lowercased host), ``url_len``,
    ``is_ip_host`` (dotted-quad host), ``host_digit_milli`` (per-mille
    digit share of the host), ``n_path_segments``, ``url_score_milli``
    (Σ weight over distinct bank hits; hard words also substring-match
    the host, counted once), ``url_keep`` (score < ``fail_milli``).
    All integer arithmetic — bit-exact across engines."""
    if bank is None:
        bank = URL_WORD_BANK
    if host is None:
        host = host_of(url)
    if words is None:
        words = url_words(url)
    score = F.lit(0)
    for word, weight, hard in bank:
        word_hit = F.array_contains(words, word)
        hit = (word_hit | (F.instr(host, word) > 0)) if hard else word_hit
        score = score + F.when(hit, F.lit(weight)).otherwise(F.lit(0))
    score = score.cast("int")
    path = F.regexp_extract(url, _URL_RE, 3)
    return {
        "url_host": host,
        "url_len": F.length(url).cast("int"),
        "is_ip_host": host.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$").cast(
            "int"
        ),
        "host_digit_milli": F.when(
            F.length(host) > 0,
            F.floor(
                F.length(F.regexp_replace(host, r"[^0-9]", "")) * 1000
                / F.length(host)
            ),
        ).otherwise(F.lit(0)).cast("int"),
        "n_path_segments": F.size(
            F.filter(F.split(path, "/"), lambda x: x != "")
        ).cast("int"),
        "url_score_milli": score,
        "url_keep": (score < F.lit(fail_milli)).cast("int"),
    }


def url_quality_flags(
    df: DataFrame,
    url_col: str,
    id_col: str | None = None,
    bank: list[tuple[str, int, bool]] | None = None,
    fail_milli: int = URL_FAIL_MILLI,
) -> DataFrame:
    """One row per input row: the URL plus every ``url_quality_columns``
    signal — the auditable URL-scrub table. Two-level projection: the
    word array and host are staged once per row, the bank scores over
    the staged columns (see ``url_words``)."""
    head = [F.col(id_col)] if id_col else []
    staged = df.select(
        *head,
        F.col(url_col),
        url_words(F.col(url_col)).alias("_words"),
        host_of(F.col(url_col)).alias("_host"),
    )
    cols = url_quality_columns(
        F.col(url_col), bank, fail_milli,
        words=F.col("_words"), host=F.col("_host"),
    )
    return staged.select(
        *head, F.col(url_col), *[c.alias(n) for n, c in cols.items()]
    )


def url_quality_oracle_exprs(
    url_sql: str,
    bank: list[tuple[str, int, bool]] | None = None,
    fail_milli: int = URL_FAIL_MILLI,
) -> dict[str, str]:
    """DuckDB twins of ``url_quality_columns`` over the SQL expression
    ``url_sql`` — same split regex, same bank, same integer arithmetic
    (used by the pytest twin gate; kept next to the Spark expressions so
    the two banks can never drift)."""
    if bank is None:
        bank = URL_WORD_BANK
    host = (
        "lower(coalesce(regexp_extract(regexp_extract({u}, "
        "'^([A-Za-z][A-Za-z0-9+.\\-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$', 2), "
        "'^(?:[^@]*@)?([^:@]*)', 1), ''))"
    ).format(u=url_sql)
    words = (
        "list_filter(string_split_regex(lower({u}), '[^a-z0-9]+'), "
        "x -> x <> '')"
    ).format(u=url_sql)
    terms = []
    for word, weight, hard in bank:
        word_hit = f"list_contains({words}, '{word}')"
        hit = (
            f"({word_hit} or position('{word}' in {host}) > 0)"
            if hard
            else word_hit
        )
        terms.append(f"case when {hit} then {weight} else 0 end")
    score = "(" + " + ".join(terms) + ")::int"
    path = (
        "coalesce(regexp_extract({u}, "
        "'^([A-Za-z][A-Za-z0-9+.\\-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$', 3), '')"
    ).format(u=url_sql)
    return {
        "url_host": host,
        "url_len": f"length({url_sql})::int",
        "is_ip_host": (
            f"(regexp_matches({host}, "
            "'^[0-9]{1,3}(\\.[0-9]{1,3}){3}$'))::int"
        ),
        "host_digit_milli": (
            f"case when length({host}) > 0 then "
            f"floor(length(regexp_replace({host}, '[^0-9]', '', 'g')) "
            f"* 1000 / length({host})) else 0 end::int"
        ),
        "n_path_segments": (
            f"length(list_filter(string_split({path}, '/'), "
            "x -> x <> ''))::int"
        ),
        "url_score_milli": score,
        "url_keep": f"({score} < {fail_milli})::int",
    }
