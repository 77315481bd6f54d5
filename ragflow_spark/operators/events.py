"""Event-stream operators (batch forms; streaming variants in
``ragflow_spark.streaming.events``).

The reference's only stream-like machinery is its Redis task queue
(SURVEY.md §1.3); these operators cover the standard event-analytics
surface a pipeline at this scale needs: tumbling-window aggregation and
gap-based sessionization — both single-shuffle window/groupBy plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def windowed_counts(df: DataFrame, ts_col: str = "ts",
                    type_col: str = "event_type") -> DataFrame:
    """Tumbling 1-hour window per event type: count + value sum."""
    return (
        df.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("window_start"),
            F.col(type_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sessionize(df: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions: a new session starts when the inter-event gap
    exceeds ``gap_minutes``. lag + running sum over a per-user window —
    one shuffle on user_id."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # cast via timestamp_ltz: TIMESTAMP_NTZ has no direct → long cast; the
    # session timezone is pinned to UTC so epochs match DuckDB's epoch()
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_breaks = df.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    with_ids = with_breaks.withColumn(
        "session_seq", F.sum("_new_session").over(w)
    )
    return (
        with_ids.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
