"""The extraction operator: pages → chunks, as one Spark stage.

Maps the reference's whole task_executor orchestration
(rag/svr/task_executor.py:449-558 — fetch blob → FACTORY[parser].chunk →
per-chunk md5 id) onto a single ``mapInPandas`` over the salted/size-bucketed
repartition from ``ragflow_spark.plans.partitioning``:

    pages (url, warc_ts, html, text, lang, parser, fmt)
      │ F1 size-cap filter (native Catalyst filter → parquet pushdown)
      │ with_partition_id  (stable resume key)
      │ partition_for_extract (physical skew-aware shuffle)
      ▼ mapInPandas(extract)   — Arrow batches, per-doc parity core
    chunks (url, warc_ts, chunk_idx, chunk_text, tag_text, spans, title,
            parser, fmt, content_hash, partition_id, error)

Per-document failures NEVER kill the job: a failing doc emits one row with
``error`` set and chunk_idx = -1 (the 100 TB contract — one malformed PDF
out of 10^12 docs must not fail a stage). ``content_hash`` =
``md5(chunk_text || url)`` mirrors the reference's deterministic chunk id
(task_executor.py:260-263), making re-runs idempotent.

``tag_text`` (text incl. @@..## span tags) is stored as NULL whenever it
equals ``chunk_text`` — read it back as coalesce(tag_text, chunk_text).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ragflow_spark.plans.partitioning import (
    partition_for_extract,
    with_partition_id,
)

# F1: reject docs over the reference's 128 MB cap (rag/settings.py:33)
DOC_MAXIMUM_SIZE = 128 * 1024 * 1024

# meta-robots gate: bytes of the page head scanned for the directive —
# real documents declare it inside <head>, far under this
NOINDEX_HEAD_BYTES = 8192

# shared verbatim with the DuckDB twin in tests/test_noindex.py — only
# RE2-compatible constructs (no lookaround, inline (?i) only)
NOINDEX_META_TAG_RE = r"(?i)(<meta[^>]*>)"
NOINDEX_NAME_RE = r"(?i)\bname\s*=\s*['\"]?robots\b"
NOINDEX_CONTENT_RE = r"(?i)\bcontent\s*=\s*['\"]?[^'\">]*\b(noindex|none)\b"


def page_noindex(html, head_bytes: int = NOINDEX_HEAD_BYTES):
    """True when the page head carries a ``<meta name=robots>`` directive
    with a ``noindex`` (or the ``none`` shorthand) token — the standard
    crawl-pipeline exclusion every CC-derived corpus honors (the page
    author opted out of indexing; Common Crawl itself ships such pages,
    the curation step drops them).

    Native and RE2-portable: extract every ``<meta ...>`` tag from the
    decoded head slice, then test each for BOTH the robots name and the
    noindex token — two independent per-tag regexes instead of one
    lookahead (RE2, hence the DuckDB twin, has no lookahead), so
    attribute order never matters. The head slice is decoded as
    ISO-8859-1: every byte is a valid char there (UTF-8 decode throws on
    malformed input under ANSI), and the directive tokens being matched
    are pure ASCII, where the two encodings agree byte-for-byte — so
    arbitrary binary (truncated multibyte, legacy codepages) can neither
    error nor corrupt a match. Reads the STORED bytes: a row whose html
    is gzip-member-compressed (transparently decoded later in the parse
    UDF) passes the gate unexamined — there is no native gunzip
    expression, and the conservative failure mode there is keep-then-
    parse, never a wrong drop. Known overreach: a literal
    ``<meta name=robots content=noindex>`` inside a code sample in the
    first 8 KB also matches — the conservative direction (over-drop,
    never over-keep)."""
    head = F.decode(F.substring(html, 1, head_bytes), "ISO-8859-1")
    tags = F.regexp_extract_all(head, F.lit(NOINDEX_META_TAG_RE), 1)
    return F.exists(
        tags,
        lambda t: t.rlike(NOINDEX_NAME_RE) & t.rlike(NOINDEX_CONTENT_RE),
    )

CHUNKS_SCHEMA = (
    "url string, warc_ts timestamp, chunk_idx int, chunk_text string, "
    "tag_text string, "
    "spans array<struct<page:int,left:double,right:double,top:double,bottom:double>>, "
    "title string, parser string, fmt string, content_hash string, "
    "partition_id int, error string"
)


def _extract_batches(batches, template_cfg: dict | None = None) -> Iterator:
    """Executor-side worker. Imports the parity core lazily so the module
    ships cleanly via --py-files; template dispatch per row, Arrow batch in,
    Arrow batch out. ``template_cfg`` is the job-level parser config
    (the reference's per-task ``parser_config``, task_executor.py) — e.g.
    ``{"ocr_backend": "fake"}`` to enable the scanned-PDF OCR fallback."""
    import gzip
    import zlib

    import pandas as pd

    from ragflow_spark.core.templates import run_template

    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "url", "warc_ts", "chunk_idx", "chunk_text", "tag_text", "spans",
            "title", "parser", "fmt", "content_hash", "partition_id", "error",
        )}

        def emit(row, idx, text, tag_text, spans, title, err):
            out["url"].append(row.url)
            out["warc_ts"].append(row.warc_ts)
            out["chunk_idx"].append(idx)
            out["chunk_text"].append(text)
            out["tag_text"].append(tag_text)
            out["spans"].append(spans)
            out["title"].append(title)
            out["parser"].append(row.parser)
            out["fmt"].append(row.fmt)
            out["content_hash"].append(
                hashlib.md5((text + row.url).encode("utf-8", "ignore")).hexdigest()
                if err is None else ""
            )
            out["partition_id"].append(row.partition_id)
            out["error"].append(err)

        for row in pdf.itertuples():
            try:
                blob = bytes(row.html) if row.html is not None else b""
                if blob[:2] == b"\x1f\x8b":
                    # transparent per-row gzip: CC-style landing zones
                    # often store the WARC payload member-compressed; a
                    # corrupt member falls through to run_template, whose
                    # format-level error path reports it per doc. (The
                    # 128 MB size cap and the noindex gate read the
                    # STORED bytes — both documented as pre-decode.)
                    try:
                        blob = gzip.decompress(blob)
                    except (OSError, EOFError, zlib.error):
                        pass
                chunks = run_template(
                    row.parser, blob, row.fmt, row.lang,
                    cfg=dict(template_cfg) if template_cfg else None,
                )
                if not chunks:
                    # visibility row: every staged doc must appear in the
                    # chunk table or the manifest's doc_count undercounts
                    # and count-verified resume reprocesses the partition
                    # forever (manifest.resume_filter)
                    emit(row, -1, "", "", [], "",
                         "EmptyDocument: 0 chunks")
                    continue
                for ck in chunks:
                    # tag_text is NULL when identical to chunk_text (the
                    # tag-free formats) — halves output bytes; consumers
                    # read coalesce(tag_text, chunk_text)
                    tag = ck.tag_text if ck.tag_text != ck.chunk_text else None
                    emit(
                        row, ck.chunk_idx, ck.chunk_text, tag,
                        [s._asdict() for s in ck.spans], ck.title, None,
                    )
            except Exception as exc:  # per-doc failure isolation
                emit(row, -1, "", "", [], "", f"{type(exc).__name__}: {exc}")
        yield pd.DataFrame(out)


def _size_str_to_bytes(v: str) -> int:
    v = v.strip().lower().rstrip("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if v.endswith(suffix):
            mult, v = m, v[:-1]
            break
    return int(float(v) * mult)


def _estimate_scan_tasks(df: DataFrame) -> int:
    """Metadata-only estimate of the scan's task count: input bytes /
    spark.sql.files.maxPartitionBytes. Input bytes come from the optimizer's
    statistics (file-source relations report file sizes there) — no RDD
    materialization, no job. Unknown stats (the 8 EiB default of non-file
    relations) → assume fine-grained, skip the extra exchange."""
    spark = df.sparkSession
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        mpb = _size_str_to_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        if size <= 0 or size >= (1 << 60):  # unknown / default-huge stats
            return 1 << 30
        return max(1, size // max(1, mpb))
    except Exception:
        return 1 << 30


def extract_chunks(
    pages: DataFrame,
    num_partitions: int | None = None,
    skip_errors_column: bool = False,
    repartition: bool | str = True,
    template_cfg: dict | None = None,
) -> DataFrame:
    """The end-to-end extraction plan. ``num_partitions`` defaults to the
    session's shuffle partitions.

    ``repartition`` controls the physical size-bucketing exchange:
    - True (default): always shuffle. Scan splits bound BYTES, not parse
      COST — parse cost per byte varies 10-100× across formats, so
      byte-bounded splits inherit the corpus layout's cost skew. Measured
      at 1M docs / local[32]: forced shuffle 8 702 docs/s with task
      p99/median 1.69, vs 6 899 docs/s at 2.13 without — the exchange
      pays for itself (+26%) on top of equalizing the tail; at 131k it
      ties-or-wins. The shuffle is linear in input bytes with no
      degenerate keys (url hash + giant lane), so this holds at any scale.
    - "auto" (deprecated heuristic, kept for comparison runs): shuffle
      only when the scan is coarser than the target parallelism.
    - False: never (pre-partitioned inputs)."""
    spark = pages.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    plan = (
        pages
        # column pruning: only what the UDF consumes crosses the scan
        .select("url", "warc_ts", "html", "lang", "parser", "fmt")
        .filter(F.length(F.col("html")) <= DOC_MAXIMUM_SIZE)
    )
    plan = with_partition_id(plan, num_partitions)
    do_shuffle = repartition
    if repartition == "auto":
        do_shuffle = _estimate_scan_tasks(plan) < max(2, num_partitions // 2)
    if do_shuffle:
        plan = partition_for_extract(plan, num_partitions)
    chunks = plan.mapInPandas(
        lambda batches: _extract_batches(batches, template_cfg),
        schema=CHUNKS_SCHEMA,
    )
    if skip_errors_column:
        chunks = chunks.filter(F.col("error").isNull()).drop("error")
    return chunks


def run_extraction_job(
    pages: DataFrame,
    out_path: str,
    manifest_path: str,
    num_partitions: int | None = None,
    attempt: int = 1,
    template_cfg: dict | None = None,
    respect_noindex: bool = False,
) -> None:
    """Full resumable job: resume-filter → extract → write chunks (dynamic
    partition overwrite on partition_id) → append manifest.

    ``respect_noindex`` drops pages whose head carries a meta-robots
    noindex directive (``page_noindex``) — the filter rides the same
    scan as the size cap, before any parse work."""
    from ragflow_spark.plans.manifest import (
        check_resume_compatible,
        read_manifest,
        resume_filter,
        write_manifest,
    )

    spark = pages.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    pruned = pages.select(
        "url", "warc_ts", "html", "lang", "parser", "fmt"
    ).filter(F.length(F.col("html")) <= DOC_MAXIMUM_SIZE)
    if respect_noindex:
        pruned = pruned.filter(~page_noindex(F.col("html")))
    staged = with_partition_id(pruned, num_partitions)
    manifest = read_manifest(spark, manifest_path)
    # partition_id = pmod(xxhash64(url), num_partitions): resuming under a
    # different modulus remaps ids → silent skips; refuse instead
    check_resume_compatible(manifest, num_partitions)
    todo = resume_filter(staged, manifest)
    chunks = partition_for_extract(todo, num_partitions).mapInPandas(
        lambda batches: _extract_batches(batches, template_cfg),
        schema=CHUNKS_SCHEMA,
    )
    # idempotent per-partition overwrite: rerunning a partition rewrites the
    # exact same deterministic rows
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        chunks.write.mode("overwrite")
        .partitionBy("partition_id")
        .parquet(out_path)
    )
    # manifest only the partitions this attempt processed; the id list is
    # bounded by num_partitions, so an isin() filter gives real partition
    # pruning on the readback scan (a semi-join would read every partition)
    todo_pids = [r.partition_id for r in todo.select("partition_id").distinct().collect()]
    if todo_pids:
        written = spark.read.parquet(out_path).filter(
            F.col("partition_id").isin(todo_pids)
        )
        write_manifest(written, manifest_path, attempt=attempt,
                       num_partitions=num_partitions)
