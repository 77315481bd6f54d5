"""PII redaction: the standard CC-pipeline scrub step that runs beside
quality/dedup/decontamination before a corpus ships to training — mask
emails, phone numbers, IP addresses, and ID-number shapes, and report
per-category hit counters so the redaction volume is auditable.

The reference pipeline has no PII tier (its extraction stops at chunking,
``/root/reference/rag/app/naive.py``); this operator covers the
training-data gap the task brief names explicitly, in the same spirit as
the public C4/CCNet/Dolma scrub passes (e.g. Dolma's regex-based PII
taggers, Soldaini et al. 2024 §2.3).

Plan shape at 100 TB: one projection, zero UDFs, zero shuffles — every
category is a native ``regexp_count`` + ``regexp_replace`` pair running
inside whole-stage codegen, so the scrub rides the same scan as the rest
of curation and costs one pass over the text bytes. Category order is
fixed (email -> ip -> ssn -> card -> phone) and each counter is measured
on the text AFTER the previous categories were masked, so a token is
attributed to exactly one category and the counts sum to the number of
replacements actually made.

Cross-engine regex contract (the DuckDB oracle runs the same bank): only
constructs with identical semantics in Java regex (Spark) and RE2
(DuckDB) are allowed — character classes, bounded repetition,
non-capturing groups, ASCII ``\\b``. No backreferences, no lookaround,
no inline flags. Both engines match leftmost-first with greedy
quantifiers, so the same pattern masks the same spans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (category, pattern, replacement) — order is part of the contract:
# earlier categories mask first, so e.g. an SSN never double-counts as a
# phone fragment and a card number is not eaten digit-group-wise by the
# phone rule. Patterns are shared verbatim with the DuckDB oracle.
PII_BANK: list[tuple[str, str, str]] = [
    # local@domain.tld — the dot-TLD anchor keeps bare '@handle' mentions
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # dotted quad (also masks version-quads like 1.2.3.4 — the standard
    # conservative CC-pipeline tradeoff: over-mask, never leak)
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # ddd-dd-dddd US-SSN shape
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # dddd[ -]dddd[ -]dddd[ -]dddd card shape (separator required: a bare
    # 16-digit integer is more often an id/hash than a PAN)
    ("card", r"\b(?:[0-9]{4}[ -]){3}[0-9]{4}\b", "<CARD>"),
    # NANP-style 3-3-4 with optional +CC / (area) — runs LAST so the
    # looser digit-group shape only sees what no richer rule claimed
    (
        "phone",
        r"(?:\+[0-9]{1,3}[ -])?(?:\([0-9]{3}\)[ -]|[0-9]{3}[ -])[0-9]{3}[ -][0-9]{4}\b",
        "<PHONE>",
    ),
]


def pii_hit_columns(text: Column) -> tuple[list[Column], Column]:
    """(per-category hit counters, fully scrubbed text) for one text
    expression. Counters are staged: category i counts on the text with
    categories 0..i-1 already masked (single-attribution contract above).
    Everything is a nested native expression — Catalyst folds the chain
    into one codegen'd projection."""
    cur = text
    hits: list[Column] = []
    for name, pat, repl in PII_BANK:
        hits.append(F.regexp_count(cur, F.lit(pat)).cast("int").alias(f"{name}_hits"))
        cur = F.regexp_replace(cur, pat, repl)
    return hits, cur


def pii_total(text: Column) -> Column:
    """Total PII hits across the bank (the auditable curation signal)."""
    hits, _ = pii_hit_columns(text)
    total = hits[0]
    for h in hits[1:]:
        total = total + h
    return total.cast("int")


def pii_scrub(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep_text: bool = False,
) -> DataFrame:
    """One row per document: per-category hit counters, the total, and
    the scrubbed text (as ``scrubbed`` when ``keep_text``, always pinned
    by ``scrub_md5`` so an oracle can gate the exact replacement bytes
    without hauling the text through the compare)."""
    hits, scrubbed = pii_hit_columns(F.col(text_col))
    total = hits[0].cast("int")
    for h in hits[1:]:
        total = total + h.cast("int")
    cols = [F.col(id_col), *hits, total.cast("int").alias("pii_hits"),
            F.md5(F.encode(scrubbed, "UTF-8")).alias("scrub_md5")]
    if keep_text:
        cols.append(scrubbed.alias("scrubbed"))
    return df.select(*cols)


def pii_oracle_ctes(text_sql: str = "text") -> str:
    """DuckDB CTE chain mirroring :func:`pii_hit_columns` stage-for-stage
    over ``documents``-shaped input named ``p0``: each stage counts with
    ``len(regexp_extract_all(...))`` then masks with ``regexp_replace(...,
    'g')``, the same leftmost-first greedy RE2/Java-common bank."""
    lines = []
    prev = "p0"
    cur_text = text_sql
    for i, (name, pat, repl) in enumerate(PII_BANK):
        nxt = f"p{i + 1}"
        lines.append(
            f"{nxt} as (select *,"
            f" cast(len(regexp_extract_all({cur_text}, '{pat}')) as int)"
            f" as {name}_hits,"
            f" regexp_replace({cur_text}, '{pat}', '{repl}', 'g') as t{i + 1}"
            f" from {prev})"
        )
        prev, cur_text = nxt, f"t{i + 1}"
    return ",\n            ".join(lines)


PII_FINAL_STAGE = f"p{len(PII_BANK)}"
PII_FINAL_TEXT = f"t{len(PII_BANK)}"
PII_HIT_COLS = [f"{name}_hits" for name, _, _ in PII_BANK]
