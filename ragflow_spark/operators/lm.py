"""Corpus-trained character-bigram language model scoring (CCNet-style
perplexity filtering, Wenzek et al. 2020, public): train a smoothed
bigram LM over the (normalized) corpus, then score every document by its
average negative log-likelihood. CCNet buckets Common-Crawl docs by LM
perplexity into head/middle/tail quality tiers; this is the same shape
with the corpus itself as training text (reference has no LM tier — this
belongs to the training-data-pipeline layer alongside Gopher/C4/PII).

Numerics contract (shared with the DuckDB oracle in __spark_entry__.py):

- normalize = ``regexp_replace(lower(text), '[^a-z0-9 ]', '#')`` — a
  fixed 38-char alphabet (26 letters + 10 digits + space + '#' OOV), so
  every post-normalization char is ASCII and Java/RE2/numpy agree
  byte-for-byte.
- model: add-one smoothing over the FIXED alphabet,
  ``p(b|a) = (c(ab) + 1) / (c(a·) + 38)``, log-probs quantized to
  integer micro-nats ``L = round(ln(p) * 1e6)`` (half-away-from-zero).
  Counts are exact integers in both engines, the division is a single
  correctly-rounded double op, and ln's 1-ulp cross-engine wobble only
  matters within 1e-9 of a micro-nat boundary — measure-zero for a
  transcendental.
- per-doc score: ``nll_micro = -Σ L(bigram)`` summed as int64 —
  EXACT and order-independent, so Spark partial aggregation order,
  numpy pairwise summation, and DuckDB's parallel groups all agree
  bit-for-bit. Floats appear only in the last mile
  (``ce_nats = nll_micro/1e6/n_bigrams``, ``ppl = exp(ce)``), computed
  from identical doubles in both engines and rounded (6 / 4 dp).

Scale shape (100 TB):

- training is one narrow map-only pass (``mapInPandas``; per batch one
  ``np.bincount`` over bigram indices) producing ≤ 38² = 1,444 partial
  rows per partition; the groupBy that merges them shuffles O(K²) rows
  per partition, and the driver collect is O(K²) — independent of
  corpus size. At 100 TB train on a deterministic hash sample
  (``train_frac``) — the model saturates long before 1% of the corpus.
- scoring is ZERO-shuffle: the 1,444-entry int64 table rides the
  closure into one vectorized Arrow pass (bytes → code LUT → table
  gather → int64 sum). No explode, no regroup, no skew surface.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 #"
K = len(ALPHABET)  # 38; also the add-one smoothing vocabulary size


def normalize_text_col(col: Column) -> Column:
    """The shared normalization CONTRACT: lowercase, every char outside
    [a-z0-9 ] becomes '#' (one '#' per codepoint). Output is pure ASCII
    from the fixed alphabet. This Column form documents the contract and
    is what the DuckDB oracle runs; the HOT path applies the identical
    mapping inside the Arrow pass (``_batch_codes``) because a JVM
    regexp_replace over every byte of a corpus costs ~10x the entire
    numpy stage (measured 34.5 s of a 35 s pass at 131k docs)."""
    return F.regexp_replace(F.lower(col), "[^a-z0-9 ]", "#")


def _byte_lut() -> np.ndarray:
    """byte value -> alphabet code, normalization fused in: A-Z fold to
    the a-z codes, alphabet bytes map to themselves, every other byte
    (incl. the '?' that ascii-replace substitutes one-per-codepoint for
    non-ASCII) maps to the '#' code."""
    lut = np.full(256, ALPHABET.index("#"), dtype=np.uint8)
    for i, ch in enumerate(ALPHABET):
        lut[ord(ch)] = i
    for i in range(26):
        lut[ord("A") + i] = i
    return lut


def _batch_codes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Normalize + concatenate a batch of RAW texts into one code array
    + row offsets. ``str.lower`` and ``encode('ascii', 'replace')`` are
    C-speed and emit exactly one byte per codepoint ('?' for non-ASCII,
    which the LUT sends to '#'), so this is byte-for-byte the
    ``normalize_text_col`` contract; the residual lower() edge (chars
    whose lowercase differs across Python/JVM/utf8proc) only moves
    non-ASCII to non-ASCII — both sides land on '#'."""
    blobs = [
        (t or "").lower().encode("ascii", "replace") for t in texts
    ]
    lens = np.fromiter(
        (len(b) for b in blobs), dtype=np.int64, count=len(blobs)
    )
    offsets = np.concatenate([[0], np.cumsum(lens)])
    codes = _byte_lut()[np.frombuffer(b"".join(blobs), dtype=np.uint8)]
    return codes, offsets


def charlm_bigram_counts(
    df: DataFrame, text_col: str, train_frac: float | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Global bigram counts over the normalized corpus: one map-only
    Arrow pass emitting ≤ K² partial (idx, c) rows per partition, then a
    tiny groupBy. ``train_frac`` takes a deterministic hash sample
    (requires ``id_col``) — the 100 TB path."""
    if train_frac is not None:
        if id_col is None:
            raise ValueError("train_frac requires id_col")
        mod = 1_000_000
        df = df.filter(
            F.pmod(F.xxhash64(F.col(id_col), F.lit(41)), mod)
            < int(train_frac * mod)
        )
    norm = df.select(F.col(text_col).alias("t"))  # normalization is fused
    # into the Arrow pass (_batch_codes) — see normalize_text_col

    def _count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(K * K, dtype=np.int64)
        for pdf in batches:
            codes, offsets = _batch_codes(pdf["t"].tolist())
            if len(codes) == 0:
                continue
            idx = codes[:-1].astype(np.int64) * K + codes[1:]
            # drop seam bigrams that straddle row boundaries: every
            # inner offset o marks a row start, so the bigram at o-1
            # crosses rows (empty rows collapse onto the same seam —
            # masking it twice is idempotent)
            seams = offsets[1:-1] - 1
            seams = seams[(seams >= 0) & (seams < len(idx))]
            keep = np.ones(len(idx), dtype=bool)
            keep[seams] = False
            acc += np.bincount(idx[keep], minlength=K * K)
        nz = np.nonzero(acc)[0]
        yield pd.DataFrame({"idx": nz.astype(np.int32), "c": acc[nz]})

    partial = norm.mapInPandas(_count, "idx int, c long")
    return partial.groupBy("idx").agg(F.sum("c").alias("c"))


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def charlm_model(counts: list[tuple[int, int]]) -> np.ndarray:
    """Quantized log-prob table from (bigram idx, count) pairs:
    int64[K*K] of micro-nats, add-one smoothed over the fixed
    alphabet. Pure driver-side arithmetic on an O(K²) input."""
    c = np.zeros(K * K, dtype=np.int64)
    for idx, n in counts:
        c[idx] = n
    ctx = c.reshape(K, K).sum(axis=1)  # c(a·)
    p = (c.reshape(K, K) + 1.0) / (ctx[:, None] + float(K))
    return _round_half_away(np.log(p) * 1e6).astype(np.int64).ravel()


def charlm_score(
    df: DataFrame, id_col: str, text_col: str, model: np.ndarray
) -> DataFrame:
    """Per-doc LM score against a trained micro-nat table: one
    zero-shuffle Arrow pass. Returns (id, n_bigrams, nll_micro,
    ce_nats, ppl); docs with < 2 normalized chars get n_bigrams = 0 and
    null ce/ppl."""
    if model.shape != (K * K,) or model.dtype != np.int64:
        raise ValueError("model must be int64[K*K] micro-nats")
    norm = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("t"),  # normalization fused into the
        # Arrow pass (_batch_codes) — see normalize_text_col
    )
    mod = model  # closure capture; K² int64 — rides the task binary

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codes, offsets = _batch_codes(pdf["t"].tolist())
            idx = (
                codes[:-1].astype(np.int64) * K + codes[1:]
                if len(codes) else np.empty(0, dtype=np.int64)
            )
            terms = mod[idx] if len(idx) else idx
            # prefix sums make per-row range sums O(1); int64 exact
            ps = np.concatenate([[0], np.cumsum(terms)])
            n = len(pdf)
            nb = np.maximum(offsets[1:] - offsets[:-1] - 1, 0)
            starts = offsets[:-1]
            ends = starts + nb
            smic = ps[np.minimum(ends, len(terms))] - ps[
                np.minimum(starts, len(terms))
            ]
            nll = -smic
            with np.errstate(divide="ignore", invalid="ignore"):
                ce = nll / 1e6 / nb
            # DuckDB's round(x, n) scales then rounds HALF-AWAY; numpy's
            # np.round is half-even, and nll/nb lands on exact .5
            # micro-nat ties often enough to matter (sf0.01 hit one) —
            # replicate the oracle's arithmetic exactly
            ce_r = _round_half_away(ce * 1e6) / 1e6
            ppl = _round_half_away(np.exp(ce) * 1e4) / 1e4
            out = pd.DataFrame(
                {
                    "_id": pdf["_id"].values,
                    "n_bigrams": nb,
                    "nll_micro": nll,
                    "ce_nats": np.where(nb > 0, ce_r, np.nan),
                    "ppl": np.where(nb > 0, ppl, np.nan),
                }
            )
            yield out

    scored = norm.mapInPandas(
        _score,
        f"_id long, n_bigrams long, nll_micro long, "
        f"ce_nats double, ppl double",
    )
    return scored.withColumnRenamed("_id", id_col)


def charlm_score_corpus(
    df: DataFrame, id_col: str, text_col: str,
    train_frac: float | None = None,
) -> DataFrame:
    """Train-on-corpus + score-corpus in one call (the CCNet shape with
    the corpus as its own training text). Two jobs: an O(K²)-collect
    training pass, then the zero-shuffle scoring pass."""
    counts_df = charlm_bigram_counts(
        df, text_col, train_frac=train_frac, id_col=id_col
    )
    counts = [(r["idx"], r["c"]) for r in counts_df.collect()]
    return charlm_score(df, id_col, text_col, charlm_model(counts))


def charlm_reference(texts: list[str]) -> list[dict]:
    """Pure-Python twin of train+score for tests: same normalization,
    same smoothing, same micro-nat quantization, sequential arithmetic
    only (no numpy). Returns one dict per input text."""
    def norm(t: str) -> str:
        return "".join(
            ch if ch in ALPHABET[:-1] else "#" for ch in t.lower()
        )

    normed = [norm(t or "") for t in texts]
    c: dict[tuple[str, str], int] = {}
    for t in normed:
        for a, b in zip(t, t[1:]):
            c[(a, b)] = c.get((a, b), 0) + 1
    ctx: dict[str, int] = {}
    for (a, _), n in c.items():
        ctx[a] = ctx.get(a, 0) + n

    def lmic(a: str, b: str) -> int:
        p = (c.get((a, b), 0) + 1.0) / (ctx.get(a, 0) + float(K))
        x = math.log(p) * 1e6
        return int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))

    out = []
    for t in normed:
        nb = max(len(t) - 1, 0)
        s = sum(lmic(a, b) for a, b in zip(t, t[1:]))
        nll = -s
        if nb:
            ce = nll / 1e6 / nb

            def half_away(x: float, scale: float) -> float:
                s = x * scale
                return (
                    math.floor(s + 0.5) if s >= 0 else math.ceil(s - 0.5)
                ) / scale

            out.append(
                {
                    "n_bigrams": nb,
                    "nll_micro": nll,
                    "ce_nats": half_away(ce, 1e6),
                    "ppl": half_away(math.exp(ce), 1e4),
                }
            )
        else:
            out.append(
                {
                    "n_bigrams": 0,
                    "nll_micro": 0,
                    "ce_nats": None,
                    "ppl": None,
                }
            )
    return out


def ppl_tiers(
    scored: DataFrame,
    ce_col: str = "ce_nats",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet's defining curation step (Wenzek et al. 2020 §4.3): bucket
    documents into head/middle/tail quality tiers by LM score terciles —
    head trains the model, tail gets dropped or down-weighted. Input is
    ``charlm_score``/``charlm_score_corpus`` output (or anything with a
    per-doc score column); null scores (docs below 2 normalized chars)
    tier as 'tail'.

    ``exact=True`` computes true terciles (Spark's ``percentile``
    aggregate — a per-partition value-counts map, fine into the tens of
    millions of distinct rounded scores; the DuckDB oracle reproduces it
    bit-for-bit via ``quantile_cont``, both engines applying the same
    (n-1)*q linear interpolation over identical 6dp-rounded doubles).
    At 100 TB set ``exact=False``: ``approx_percentile`` with
    ``accuracy`` (bounded-memory KLL-style sketch; tier boundaries move
    within the sketch's rank-error guarantee — a boundary shift, not a
    correctness failure, since the tiers are quantile DEFINITIONS).
    Either way the boundary collect is O(1) and tagging is one
    zero-shuffle literal-comparison projection."""
    if exact:
        q = scored.agg(
            F.expr(
                f"percentile({ce_col}, array(cast(1 as double)/3, "
                f"cast(2 as double)/3))"
            ).alias("q")
        ).first()["q"]
    else:
        q = scored.agg(
            F.expr(
                f"approx_percentile({ce_col}, array(cast(1 as double)/3, "
                f"cast(2 as double)/3), {int(accuracy)})"
            ).alias("q")
        ).first()["q"]
    q1, q2 = (float(q[0]), float(q[1])) if q is not None else (None, None)
    if q1 is None:
        return scored.withColumn("tier", F.lit("tail"))
    tier = (
        F.when(F.col(ce_col).isNull(), "tail")
        .when(F.col(ce_col) <= q1, "head")
        .when(F.col(ce_col) <= q2, "middle")
        .otherwise("tail")
    )
    return scored.withColumn("tier", tier)


def charlm_save(spark, model: np.ndarray, path: str) -> None:
    """Persist a trained micro-nat table as a (idx, lmic) parquet — the
    incremental-crawl path: train once on the historical corpus, score
    every increment against the stored model (one zero-shuffle pass,
    history never re-read; same shape as dedup's exact/minhash stores)."""
    if model.shape != (K * K,) or model.dtype != np.int64:
        raise ValueError("model must be int64[K*K] micro-nats")
    spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(model)],
        "idx int, lmic long",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def charlm_load(spark, path: str) -> np.ndarray:
    """Load a charlm_save table back into the int64[K*K] closure form."""
    model = np.zeros(K * K, dtype=np.int64)
    for r in spark.read.parquet(path).collect():
        model[int(r["idx"])] = int(r["lmic"])
    return model
