"""Native (JVM-side, zero-UDF) text Column helpers.

These are the scalar functions of SURVEY.md §2.7 that ARE expressible in
Catalyst (X3 rmSpace, X7 md5 ids) plus the text-statistics primitives the
training-data tier needs (token counts, shingles, quality ratios, language
scores). Everything here compiles into whole-stage codegen — no Python in
the hot path; the same formulas are mirrored 1:1 in the DuckDB oracle SQL
strings in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# X4 _strQ2B (rag_tokenizer.py:88-102): any char whose code minus 0xFEE0
# lands in [0x20, 0x7E] folds to half-width (that is U+FF00..U+FF5E); the
# ideographic space U+3000 maps to a plain space; everything else passes
# through. Both sides are precomputed so the Spark expression is a single
# native translate().
_Q2B_FROM = "　" + "".join(chr(c) for c in range(0xFF00, 0xFF5F))
_Q2B_TO = " " + "".join(chr(c - 0xFEE0) for c in range(0xFF00, 0xFF5F))


def str_q2b(s: str) -> str:
    """Scalar reference of the Q2B mapping (rag_tokenizer.py:88-93), used by
    tests to pin the Column version."""
    return s.translate(str.maketrans(_Q2B_FROM, _Q2B_TO))


def q2b(col) -> Column:
    """X4 full-width → half-width as ONE codegen'd translate()."""
    return F.translate(col, _Q2B_FROM, _Q2B_TO)


def normalize_text(col, q2b_fold: bool = False) -> Column:
    """lower + collapse whitespace + trim — the canonical form used for
    fingerprints and exact dedup. ``q2b_fold=True`` additionally folds
    full-width chars (X4) before normalizing, for corpora where the same
    content appears in both widths; default OFF to keep fingerprints stable
    with the round-1 oracles."""
    c = q2b(col) if q2b_fold else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def rm_space_cjk(col) -> Column:
    """X3 ``rmSpace`` (rag/utils/__init__.py:34-38): drop spaces touching a
    CJK char on either side — native regexp_replace pair, no UDF."""
    c = F.regexp_replace(
        col, r"([一-龥　-〿]) +([一-龥　-〿])", r"$1$2"
    )
    return F.regexp_replace(
        c, r"([一-龥　-〿]) +([一-龥　-〿])", r"$1$2"
    )


def ws_tokens(col) -> Column:
    """Whitespace tokens, empties removed (matches DuckDB
    regexp_split_to_array(trim(x), '\\s+'))."""
    return F.split(F.trim(col), r"\s+")


def token_count(col) -> Column:
    return F.size(ws_tokens(col))


def char_count(col) -> Column:
    return F.length(col)


#: chars counted as word/whitespace by punct_ratio — exactly Java regex
#: ``[\w\s]`` without UNICODE_CHARACTER_CLASS: [a-zA-Z0-9_] + [ \t\n\x0B\f\r].
_WORD_WS_CHARS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
    " \t\n\x0b\f\r"
)


def punct_ratio(col) -> Column:
    """punctuation chars / total chars — quality signal.

    Counted via ``translate`` (plain char-map deletion), bit-identical to
    the definitional ``length(c) - length(regexp_replace(c, '[^\\w\\s]',
    ''))`` but deliberately NOT regex: java.util.regex match loops lose
    their JIT specialization when this class-complement pattern alternates
    per-row with the PII bank's EMAIL pattern in one projection (measured
    15× on the whole stage — tools/diag_pii_codegen.py; curate()'s
    pii_hits signal made the pipeline 4× superadditive until this
    rewrite). translate shares no code path with the regex engine, so the
    pairing cost is additive again."""
    total = F.length(col)
    punct = F.length(F.translate(col, _WORD_WS_CHARS, ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def stopword_hits(col, words: list[str]) -> Column:
    """Total occurrences of any word in ``words`` as whole tokens.
    Implemented as size(regexp_extract_all) — single pass, codegen'd."""
    pattern = r"\b(?:" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), F.lit(0)))


def word_shingles(col, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> — the MinHash /
    Jaccard unit. Built from native transform over a sequence; no UDF."""
    toks = ws_tokens(col)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def fingerprint_md5(col) -> Column:
    """X7-style deterministic document fingerprint over normalized text."""
    return F.md5(normalize_text(col))


MINHASH_MOD = 4294967296  # 2^32


def minhash_signature(col, num_hashes: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature as array<long>.

    One md5 per shingle; the k hash family is Carter-Wegman double hashing
    h_i = (a + i·b) mod 2^32 with (a, b) the two 32-bit halves of the md5 —
    so the whole signature is ONE md5 pass + ONE aggregate pass keeping all
    k running minima in an array accumulator (k·|shingles| adds, no k·md5).
    md5 and the modular arithmetic are identical in DuckDB, keeping the
    oracle bit-exact."""
    sh = word_shingles(col, shingle_n)
    ab = F.transform(
        F.transform(sh, F.md5),
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("a"),
            F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("b"),
        ),
    )
    init = F.array_repeat(F.lit(MINHASH_MOD).cast("long"), num_hashes)
    return F.aggregate(
        ab,
        init,
        lambda acc, st: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda m, i: F.least(
                m,
                F.pmod(st["a"] + i.cast("long") * st["b"], F.lit(MINHASH_MOD)),
            ),
        ),
    )


def lsh_bands(sig_col, bands: int, rows_per_band: int) -> Column:
    """Band hashes from a minhash signature: md5 over each contiguous
    rows_per_band slice (comma-joined) → array<string> of band keys."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(sig_col, b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    ),
                )
            )
            for b in range(bands)
        ]
    )
