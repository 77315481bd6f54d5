"""Deterministic sampling & splitting for training-data pipelines.

Everything here is hash-derived — no RNG state, no ordering dependence —
so assignments are reproducible across runs, cluster sizes, and input
partitionings (the property that matters when a 100 TB corpus is re-split
after a backfill: yesterday's train doc must not wander into today's
eval split).

- ``hash_split``: weighted train/val/test assignment from
  xxhash64(id, seed) buckets.
- ``stratified_sample``: per-group deterministic top-fraction by hash —
  every group keeps ~fraction of its rows, small groups keep at least
  ``min_rows`` (the per-language floor a multilingual corpus needs).

Plan shapes: hash_split is a pure projection (zero shuffle — it composes
with any downstream write's partitioning); stratified_sample is one
window shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

BUCKETS = 1_000_000


def _bucket(id_col: str, seed: int):
    """md5-derived bucket in [0, BUCKETS): engine-portable (the DuckDB
    oracles reproduce it bit-exactly; xxhash64 would be Spark-only) and
    still a single JVM-native expression."""
    h8 = F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                          F.lit(str(seed)))),
        1, 8,
    )
    return F.pmod(F.conv(h8, 16, 10).cast("long"), F.lit(BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Assign every row to a named split with probability proportional to
    its weight, deterministically from xxhash64(id, seed). Weights are
    normalized; bucket boundaries are cumulative over the dict's insertion
    order."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    b = _bucket(id_col, seed)
    acc = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bound = int(acc * BUCKETS)
        expr = (F.when(b < bound, name) if expr is None
                else expr.when(b < bound, name))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1]))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    fraction: float,
    seed: int = 42,
    min_rows: int = 1,
) -> DataFrame:
    """Keep ~``fraction`` of every group, deterministically: rows are
    ranked by hash within their group and the top ceil(max(n*fraction,
    min_rows)) survive. Rank-based (not threshold-based) so small groups
    are never emptied and the kept count per group is exact."""
    if not 0 < fraction <= 1:
        raise ValueError("fraction must be in (0, 1]")
    w = Window.partitionBy(group_col).orderBy(
        _bucket(id_col, seed), F.col(id_col)
    )
    ranked = df.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
    )
    quota = F.greatest(
        F.ceil(F.col("_n") * F.lit(float(fraction))), F.lit(min_rows)
    )
    return ranked.filter(F.col("_rk") <= quota).drop("_rk", "_n")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    rate,
    seed: int = 42,
) -> DataFrame:
    """Keep each row independently with its OWN probability — the
    per-tier/per-domain downsampling step (CCNet keeps head+middle and
    samples the tail; Gopher/Dolma re-weight domains): ``rate`` is a
    Column (or column name) in [0, 1] per row, and a row survives iff
    ``bucket(id, seed) < rate * BUCKETS``. Hash-deterministic like
    everything in this module — re-running on a backfilled corpus keeps
    exactly the same survivors for unchanged rows, and nested rates
    compose (sampling at 0.5 then 0.5 again over the same seed keeps the
    SAME half, not a quarter — pass distinct seeds for independent
    draws). Zero shuffle: one projection + filter that composes with the
    scan (predicate pushdown applies)."""
    r = F.col(rate) if isinstance(rate, str) else rate
    return df.filter(
        _bucket(id_col, seed) < (r * F.lit(BUCKETS)).cast("long")
    )
