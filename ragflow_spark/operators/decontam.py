"""Eval-set decontamination: find training documents that contain n-grams
from a benchmark/eval set (the GPT-3/PaLM-style 13-gram collision test —
Brown et al. 2020 appendix C use 13-gram overlap; the n is a parameter).

Scale shape: the eval side is small by construction (benchmarks are KBs
to MBs), so its n-gram set broadcasts; the training side explodes its
n-grams ONCE and inner-joins against the broadcast — shuffle-free on the
broadcast plan, linear in training n-grams. Output is per-doc collision
stats, not a filter, so callers can audit before dropping (the no-silent-
caps principle applies to decontamination more than anywhere: dropping a
doc because it quotes a benchmark question is a judgment call).

Hashes, not raw n-grams, cross the wire: md5 halves the shuffle/broadcast
bytes and makes the join key fixed-width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _ngram_hashes(col, n: int):
    """Distinct md5 hashes of word n-grams of the lowered, whitespace-split
    text; texts shorter than n words yield no n-grams (too short to
    meaningfully collide)."""
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    k = F.size(toks)
    grams = F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(1), k - n + 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_text_col: str | None = None,
    n: int = 13,
) -> DataFrame:
    """Per-training-doc contamination stats against the eval set:
    (id, n_collisions = distinct colliding n-grams, n_ngrams = the doc's
    distinct n-gram count, contaminated = any collision). Docs with zero
    collisions are included (count 0) so the report is a full audit."""
    eval_text_col = eval_text_col or text_col
    eval_grams = (
        eval_df.select(
            F.explode(_ngram_hashes(F.col(eval_text_col), n)).alias("_g")
        )
        .distinct()
    )
    doc_grams = train.select(
        F.col(id_col),
        _ngram_hashes(F.col(text_col), n).alias("_grams"),
    )
    exploded = doc_grams.select(
        id_col, F.size("_grams").alias("n_ngrams"),
        F.explode_outer("_grams").alias("_g"),
    )
    hits = exploded.join(
        F.broadcast(eval_grams.withColumn("_hit", F.lit(1))), "_g", "left"
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.max("n_ngrams").alias("n_ngrams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_collisions"),
        )
        .select(
            id_col,
            F.col("n_ngrams"),
            F.col("n_collisions").cast("long").alias("n_collisions"),
            (F.col("n_collisions") > 0).cast("int").alias("contaminated"),
        )
    )
