"""Checkpoint manifest + resume protocol (SURVEY.md §2.1 K3, §4).

The reference gets at-least-once resume from a Redis consumer group with
manual ack (rag/svr/task_executor.py:137-188, 582-585). The Spark-native
equivalent is a *manifest table* keyed by the data-derived ``partition_id``:

- after the chunk table is written, a second aggregation job derives one
  manifest row per partition: doc/chunk counts, bytes, an order-independent
  content hash (bit_xor of per-chunk xxhash64), status='done';
- a relaunch anti-joins pages against done partitions and reprocesses only
  the remainder;
- idempotency comes from deterministic chunk ids — ``md5(chunk_text||url)``
  mirrors the reference's ``md5(content + doc_id)``
  (rag/svr/task_executor.py:260-263) — so re-writing a partition produces
  identical rows and dynamic partition overwrite (or an Iceberg
  ``overwritePartitions``) is exact.

On Iceberg the chunk write + manifest append become a single atomic
snapshot commit; parquet mode (this sandbox) writes chunks first, manifest
second, and resume trusts only manifested partitions — the same
crash-consistency contract at-least-once semantics require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "partition_id int, doc_count long, chunk_count long, bytes long, "
    "content_hash string, status string, attempt int, num_partitions int, "
    "ts timestamp"
)


def build_manifest(chunks: DataFrame, attempt: int = 1,
                   num_partitions: int | None = None) -> DataFrame:
    """One row per partition_id over an extracted-chunk DataFrame.

    ``num_partitions`` is the modulus used by ``with_partition_id`` when the
    chunks were produced. It is RECORDED in every row because partition_id =
    pmod(xxhash64(url), num_partitions): resuming under a different modulus
    would remap every id, silently skipping never-processed documents —
    ``check_resume_compatible`` fails fast on that instead."""
    return (
        chunks.groupBy("partition_id")
        .agg(
            F.countDistinct("url").alias("doc_count"),
            F.count(F.lit(1)).alias("chunk_count"),
            F.sum(F.length("chunk_text")).cast("long").alias("bytes"),
            F.conv(
                F.expr("bit_xor(xxhash64(content_hash))").cast("string"), 10, 16
            ).alias("content_hash"),
        )
        .withColumn("status", F.lit("done"))
        .withColumn("attempt", F.lit(attempt))
        .withColumn(
            "num_partitions",
            F.lit(-1 if num_partitions is None else int(num_partitions)),
        )
        .withColumn("ts", F.current_timestamp())
    )


def write_manifest(chunks: DataFrame, path: str, attempt: int = 1,
                   num_partitions: int | None = None) -> None:
    build_manifest(chunks, attempt, num_partitions).write.mode(
        "append").parquet(path)


def check_resume_compatible(manifest: DataFrame | None,
                            num_partitions: int) -> None:
    """Fail fast when a prior manifest was written under a different
    partition modulus (see build_manifest). Legacy manifests without the
    column (or rows recorded as -1) are accepted for backward compat."""
    if manifest is None or "num_partitions" not in manifest.columns:
        return
    prior = [
        r.num_partitions
        for r in manifest.select("num_partitions").distinct().collect()
        if r.num_partitions is not None and r.num_partitions >= 0
    ]
    bad = [p for p in prior if p != num_partitions]
    if bad:
        raise ValueError(
            f"manifest was written with num_partitions={sorted(set(bad))} "
            f"but this run uses {num_partitions}; partition ids would remap "
            "and resume would silently skip documents. Re-run with the "
            "recorded value or start a fresh manifest path."
        )


def read_manifest(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def resume_filter(
    pages_with_pid: DataFrame,
    manifest: DataFrame | None,
    url_col: str = "url",
    verify_counts: bool = True,
) -> DataFrame:
    """Drop pages whose partition is already manifested as done. A broadcast
    left-anti join — the manifest has one row per partition, always tiny
    relative to the pages table, so no shuffle of the big side's rows beyond
    the hash-exchange Spark already plans.

    ``verify_counts`` (default on) closes the input-drift foot-gun: a doc
    APPENDED to the input after a partition was manifested hashes into that
    done partition and a naive anti-join would silently skip it forever.
    With verification, a done partition only counts as done while the
    input's distinct-doc count still equals the manifest's recorded
    doc_count — drifted partitions reprocess wholesale, which is exact
    because chunk ids are deterministic and the write is a dynamic
    partition overwrite. Cost: one count-distinct aggregation over
    (partition_id, url) — map-side combinable, no text bytes shuffled."""
    if manifest is None:
        return pages_with_pid
    done = (
        manifest.filter(F.col("status") == "done")
        .groupBy("partition_id")
        .agg(F.max_by("doc_count", "attempt").alias("_mdocs"))
    )
    if verify_counts:
        counts = pages_with_pid.groupBy("partition_id").agg(
            F.countDistinct(url_col).alias("_ndocs")
        )
        done = (
            done.join(counts, "partition_id")
            .filter(F.col("_mdocs") == F.col("_ndocs"))
        )
    return pages_with_pid.join(
        F.broadcast(done.select("partition_id")),
        on="partition_id", how="left_anti",
    )
