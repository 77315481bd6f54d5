"""Sequence packing: the concat-and-chunk training-window planner.

The last stage of a training-data pipeline turns a curated document set
into fixed-length token windows (GPT-style data loaders: concatenate all
documents in a deterministic order, then split the token stream every
``ctx_len`` tokens — a document may straddle a window boundary). This
module plans that packing WITHOUT materializing token ids: given a token
count per document it emits one row per (document, window) overlap —
exactly what a loader needs to slice each document into its windows —
so the expensive tokenized payload is only touched once, at read time.

Scale design (the whole point — a naive cumulative sum is a single
unpartitioned Window over the full corpus, i.e. one task at 100 TB):

1. one range exchange on the document id (``repartitionByRange`` would
   do, but we never need physical adjacency — only the ARITHMETIC order
   of ids — so no exchange of the payload happens at all);
2. within-bucket cumulative sums, bucket = ``id // bucket_span``
   (order-preserving for any numeric id), via a Window partitioned by
   bucket — fully parallel;
3. cross-bucket prefix offsets over the TINY per-bucket totals frame
   (``n_buckets = id_range / bucket_span`` rows — the only
   single-partition Window, explicitly bounded; pick ``bucket_span`` ~
   sqrt(N) to keep it millions of rows at 10^12 docs, or stack the same
   trick twice for another sqrt factor), broadcast-joined back;
4. ``explode(sequence(first_window, last_window))`` fans a straddling
   document into one row per covered window — output-proportional, no
   shuffle.

Determinism: the packing order is ascending ``id_col``, so assignments
are reproducible across runs, cluster sizes, and input partitionings —
the same contract as operators/sampling.py (yesterday's window plan must
survive a backfill re-run bit-identically).

Reference scope: the reference (RAGFlow) stops at chunking; packing is
part of the "operations a large-scale training-data pipeline would
need" tier (build brief), modeled on the concat-and-split loaders of
GPT-2/GPT-3-style pretraining (public: Radford et al. 2019 §2,
Brown et al. 2020 §2.1 "we pack multiple documents per sequence").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_windows(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    ctx_len: int,
    bucket_span: int = 1 << 20,
) -> DataFrame:
    """Plan concat-and-chunk packing of documents into ``ctx_len``-token
    windows.

    Documents are concatenated in ascending ``id_col`` order (ids must be
    numeric and unique; zero-token documents are skipped). Returns one
    row per (document, window) overlap:

    - ``window_id``   : 0-based fixed-size window index
    - ``<id_col>``    : the document
    - ``doc_tok_start`` / ``doc_tok_end`` : the [start, end) token slice
      of THIS document that lands in this window
    - ``win_tok_start``: position inside the window where the slice
      begins (0 unless the document started in an earlier position of
      this window's stream)

    Every window is exactly ``ctx_len`` tokens except possibly the last.
    ``bucket_span`` bounds the cross-bucket prefix frame (see module
    docstring); results are bit-identical for ANY bucket_span.
    """
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    if bucket_span <= 0:
        raise ValueError("bucket_span must be positive")

    t = (
        df.select(
            F.col(id_col).cast("long").alias("__id"),
            F.col(tokens_col).cast("long").alias("__toks"),
        )
        .where(F.col("__toks") > 0)
        .withColumn("__bucket", F.floor(F.col("__id") / bucket_span))
    )

    # within-bucket inclusive running sum — parallel across buckets
    w_in = Window.partitionBy("__bucket").orderBy("__id")
    t = t.withColumn("__run", F.sum("__toks").over(w_in))

    # cross-bucket prefix: tiny frame (one row per bucket); the
    # unpartitioned Window is over THIS frame only, never the corpus
    totals = t.groupBy("__bucket").agg(F.sum("__toks").alias("__btoks"))
    w_pre = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = totals.select(
        "__bucket",
        F.coalesce(F.sum("__btoks").over(w_pre), F.lit(0)).alias("__base"),
    )

    t = t.join(F.broadcast(prefix), "__bucket").withColumn(
        "__off", F.col("__base") + F.col("__run") - F.col("__toks")
    )

    first = F.floor(F.col("__off") / ctx_len)
    last = F.floor((F.col("__off") + F.col("__toks") - 1) / ctx_len)
    c = F.lit(ctx_len).cast("long")
    out = t.withColumn("window_id", F.explode(F.sequence(first, last)))
    return out.select(
        F.col("window_id").cast("long").alias("window_id"),
        F.col("__id").alias(id_col),
        F.greatest(
            F.lit(0).cast("long"), F.col("window_id") * c - F.col("__off")
        ).alias("doc_tok_start"),
        F.least(
            F.col("__toks"), (F.col("window_id") + 1) * c - F.col("__off")
        ).alias("doc_tok_end"),
        F.greatest(
            F.lit(0).cast("long"), F.col("__off") - F.col("window_id") * c
        ).alias("win_tok_start"),
    )


def window_fill_stats(packed: DataFrame, ctx_len: int) -> DataFrame:
    """Per-window audit over a ``pack_windows`` plan: documents per
    window, filled token count, and whether the window is full (every
    window but the last must be). One groupBy on window_id — the natural
    key, already well-distributed."""
    return (
        packed.groupBy("window_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias(
                "filled_tokens"
            ),
        )
        .withColumn("is_full", F.col("filled_tokens") == ctx_len)
    )
