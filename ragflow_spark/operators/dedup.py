"""Deduplication operator family for training-data pipelines.

All variants are DataFrame-native (the LSH family uses only md5/array
higher-order functions, so results are engine-portable and DuckDB-checkable).
Scale notes per operator are in each docstring — these run as
shuffle-on-key jobs with no driver state, sized for 10^9+ docs.

- exact:     hash-groupBy on normalized text (1 shuffle)
- minhash:   shingle → K md5-minima → B band keys → explode + self-join on
             band (candidate pairs ∝ true dups, not n²) → exact Jaccard
             verify on the pair
- simhash:   64-bit sign-aggregated fingerprint, candidates via 4×16-bit
             chunk banding, hamming ≤ d verify (bit_count is native)
- ngram:     exact n-gram Jaccard within a blocking group (for modest
             group sizes; the honest O(g²) baseline the LSH variants beat)
- embedding: cosine ≥ τ pairs within a blocking group over array<float>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ragflow_spark.functions.text import (
    fingerprint_md5,
    lsh_bands,
    minhash_signature,
    word_shingles,
)
from ragflow_spark.functions.vectors import cosine

# default hot-band cap for the LSH pair joins (minhash + simhash). A band
# key shared by k docs emits k² candidate pairs; above this cap the band is
# boilerplate-degenerate (navigation chrome, legal footers at web scale) and
# is dropped — exact dedup owns identical content. Default-ON because an
# unguarded band join is the one thing that turns these from O(n) into
# O(n²) on a real crawl; callers can pass None to disable for small audits.
DEFAULT_MAX_BAND_SIZE = 1024


def release(df: DataFrame) -> None:
    """Unpersist any cached intermediates a dedup operator attached to its
    result (``_rs_cached``). Call after the consuming action in long-lived
    sessions; harmless no-op otherwise."""
    for handle in getattr(df, "_rs_cached", []):
        try:
            handle.unpersist()
        except Exception:
            pass


# ------------------------------------------------------------------ exact

def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct normalized text: keeper id (min), dup count.
    At 100 TB this is the cheapest pass: one shuffle on a 16-byte key with
    map-side partial aggregation."""
    return (
        df.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per duplicate group (the min-id row)."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------- minhash

def minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    max_band_size: int | None = DEFAULT_MAX_BAND_SIZE,
    persist_base: bool = True,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b) whose shingle-set Jaccard ≥ threshold,
    found via minhash-LSH banding.

    Scale: the self-join is on the band key with id-only rows, so shuffle
    volume is O(n·bands) plus O(candidates); shingle arrays are re-attached
    only to surviving candidates. A band shared by k docs yields k²
    candidates — ``max_band_size`` drops such degenerate bands (identical
    boilerplate belongs to exact dedup)."""
    rows = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_n).alias("_sh"),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("_sig"),
    )
    if persist_base:
        # the signature table feeds three consumers (both band-join sides +
        # the verify re-attach); without persist the shingle/minhash pass
        # runs 3-4×. MEMORY_AND_DISK spills cleanly; on a 100 TB run you
        # would materialize this as its own parquet/Iceberg signature table
        # (one write, reread by key) instead of an executor cache.
        base = base.persist()
    # candidate generation on (id, band) ONLY — the shingle arrays must not
    # ride through the k² band join (they dominate shuffle bytes otherwise)
    band_rows = base.withColumn(
        "_bands", lsh_bands(F.col("_sig"), bands, rows)
    ).select("_id", F.explode("_bands").alias("_band"))
    if max_band_size is not None:
        # hot-band guard: a band shared by k docs emits k² candidates; bands
        # over the cap are boilerplate-degenerate (at web scale: navigation
        # chrome, legal footers) and are handled by exact dedup instead
        hot = (
            band_rows.groupBy("_band")
            .count()
            .filter(F.col("count") > max_band_size)
            .select("_band")
        )
        band_rows = band_rows.join(F.broadcast(hot), "_band", "left_anti")
    cand = (
        band_rows.alias("a")
        .join(band_rows.alias("b"), on="_band")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify: re-attach shingles to the (much smaller) candidate set
    sh = base.select("_id", "_sh")
    pairs = (
        cand.join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    out = (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if persist_base:
        out._rs_cached = [base]  # caller releases via dedup.release(out)
    return out


# ---------------------------------------------------------------- simhash

def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash, fully native: per token take 16 hex chars of md5 as
    a 64-bit integer; for each bit, majority vote weighted ±1 across
    tokens; pack sign bits. aggregate() keeps the 64 counters in an
    array<int> accumulator — one pass, no UDF."""
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    # two 32-bit halves from the md5 hex (conv() on full 64-bit hex would
    # overflow LongType for values with the top bit set)
    half1 = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"))
    half2 = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 9, 8), 16, 10).cast("long"))

    def pack(half_col):
        # (h >> b) & 1 spelled as floor(h / 2^b) % 2 because shiftright()
        # requires a literal shift amount; 2^b ≤ 2^31 and h < 2^32 are both
        # exact in doubles
        def bit(h, b):
            return F.pmod(
                F.floor(h / F.pow(F.lit(2.0), b.cast("double"))).cast("long"),
                F.lit(2),
            )

        cnt = F.aggregate(
            half_col,
            F.array_repeat(F.lit(0), 32),
            lambda acc, h: F.zip_with(
                acc,
                F.sequence(F.lit(0), F.lit(31)),
                lambda c, b: c + F.when(bit(h, b) == 1, 1).otherwise(-1),
            ),
        )
        return F.aggregate(
            F.zip_with(
                cnt,
                F.sequence(F.lit(0), F.lit(31)),
                lambda c, b: F.when(
                    c > 0, F.pow(F.lit(2.0), b.cast("double")).cast("long")
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    return df.select(
        F.col(id_col),
        pack(half1).alias("simhash_hi"),
        pack(half2).alias("simhash_lo"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    max_band_size: int | None = DEFAULT_MAX_BAND_SIZE,
    persist_base: bool = True,
) -> DataFrame:
    """Candidate pairs via 16-bit chunk banding over the 64-bit simhash
    (pigeonhole: hamming ≤ 6 over 4 chunks → some chunk differs ≤1; we use
    exact-chunk-match banding which catches hamming ≤ 3 guaranteed and most
    ≤ 6), then exact hamming verify with native bit_count.

    Scale: a raw 16-bit chunk value collects ~n/65536 docs at web scale, so
    the band self-join is k²-degenerate without the same hot-band guard
    minhash_pairs uses — ``max_band_size`` (default-on) anti-joins those
    chunks away; identical docs are exact dedup's job. The simhash table is
    persisted (three consumers: both join sides + the guard) — without it
    the per-token aggregate tree runs 3×; release via ``release()``."""
    sh = simhash64(df, id_col, text_col)
    if persist_base:
        sh = sh.persist()
    chunks = sh.select(
        F.col(id_col).alias("_id"), "simhash_hi", "simhash_lo",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":", F.lit(str(i)),
                        F.shiftright(F.col(c), s).bitwiseAND(F.lit(0xFFFF)).cast("string"),
                    )
                    for i, (c, s) in enumerate(
                        [("simhash_hi", 0), ("simhash_hi", 16),
                         ("simhash_lo", 0), ("simhash_lo", 16)]
                    )
                ]
            )
        ).alias("_chunk"),
    )
    if max_band_size is not None:
        hot = (
            chunks.groupBy("_chunk")
            .count()
            .filter(F.col("count") > max_band_size)
            .select("_chunk")
        )
        chunks = chunks.join(F.broadcast(hot), "_chunk", "left_anti")
    a = chunks.select(
        F.col("_id").alias("id_a"),
        F.col("simhash_hi").alias("hi_a"), F.col("simhash_lo").alias("lo_a"),
        "_chunk",
    )
    b = chunks.select(
        F.col("_id").alias("id_b"),
        F.col("simhash_hi").alias("hi_b"), F.col("simhash_lo").alias("lo_b"),
        "_chunk",
    )
    ham = (
        F.expr("bit_count(hi_a ^ hi_b)") + F.expr("bit_count(lo_a ^ lo_b)")
    )
    out = (
        a.join(b, on="_chunk")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    if persist_base:
        out._rs_cached = [sh]  # caller releases via dedup.release(out)
    return out


# ------------------------------------------------------------ ngram exact

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact pairwise Jaccard within a blocking group — the O(g²) baseline.
    Use only when groups are bounded (e.g. same host); at web scale prefer
    minhash_pairs.

    Plan shape: ONE self-join on the group key (shuffle volume is the n
    input rows per side — the g² blowup is streamed join output, never
    shuffled). All pair predicates go into a SINGLE conjunction ordered
    cheap→expensive, because Catalyst pushes them into the join condition
    in chained-filter order REVERSED (CombineFilters prepends): chaining
    .filter(id<).filter(jaccard) puts the O(L) jaccard set ops FIRST and
    evaluates them on every ordered pair — measured 40% slower at sf0.1.
    With the explicit order below, id_a<id_b halves the pairs and the exact
    size prune (jaccard = |∩|/|∪| ≤ min/max sizes) drops unreachable ones
    before any intersect/union runs."""
    sh = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_n).alias("_sh"),
    ).withColumn("_n", F.size("_sh")).persist()  # see release()
    a = sh.select(
        F.col("_g"), F.col("_id").alias("id_a"),
        F.col("_sh").alias("sh_a"), F.col("_n").alias("n_a"),
    )
    b = sh.select(
        F.col("_g"), F.col("_id").alias("id_b"),
        F.col("_sh").alias("sh_b"), F.col("_n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    cond = (
        (F.col("id_a") < F.col("id_b"))
        & (
            F.least("n_a", "n_b").cast("double")
            >= F.lit(threshold) * F.greatest("n_a", "n_b").cast("double")
        )
        & (F.round(inter / union, 6) >= threshold)
    )
    out = (
        a.join(b, on="_g")
        .filter(cond)
        .select(
            F.col("_g").alias(group_col), "id_a", "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
    )
    out._rs_cached = [sh]  # caller releases via dedup.release(out)
    return out


# -------------------------------------------------- paragraph-level dedup

def drop_common_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delim: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """CCNet-style cross-document boilerplate removal: segments (split on
    ``delim``) that appear in ≥ ``min_docs`` DISTINCT documents are dropped
    from every document; the rest reassemble in order.

    Scale shape: one explode + one groupBy(segment) with a countDistinct
    partial agg (the distinct-id set stays map-side-combined per segment),
    one join back on the segment hash, one groupBy(doc) reassembly. The
    common-segment set is tiny by construction (it IS the boilerplate), so
    AQE turns the join broadcast at runtime. Output is compact:
    (doc_id, n_kept, n_dropped, clean_md5) — the md5 gates reassembly order
    without shipping the cleaned text."""
    segs = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), F.lit(delim))).alias("pos", "seg"),
    )
    counts = segs.groupBy("seg").agg(
        F.countDistinct("_id").alias("_ndocs")
    )
    tagged = segs.join(counts, "seg")
    kept_struct = F.when(
        F.col("_ndocs") < min_docs, F.struct("pos", "seg")
    )  # null (dropped by collect_list) when the segment is common
    return (
        tagged.groupBy("_id")
        .agg(
            F.sum((F.col("_ndocs") < min_docs).cast("long")).alias("n_kept"),
            F.sum((F.col("_ndocs") >= min_docs).cast("long")).alias("n_dropped"),
            F.md5(
                F.concat_ws(
                    delim,
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["seg"],
                    ),
                )
            ).alias("clean_md5"),
        )
        .select(
            F.col("_id").alias(id_col), "n_kept", "n_dropped", "clean_md5"
        )
    )


# ------------------------------------------------------ duplicate clusters

def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id) with
    cluster_id = min doc id in the component (the canonical keeper, matching
    ``exact_dedup_groups``'s min-id convention).

    Algorithm: min-label propagation — each round every node takes the min
    label among itself and its neighbors; converges in O(component diameter)
    rounds (near-dup clusters are shallow: a chain of pairwise-similar docs).
    Each round is ONE shuffle join + map-side-combined min agg; labels are
    persisted per round and the previous round released, so executor memory
    holds 2×|nodes| small rows regardless of input scale. The driver only
    reads a 1-row convergence count per round. For adversarial long-chain
    graphs swap in large-star/small-star (Kiveris et al., SoCC'14) — same
    join shape, O(log n) rounds."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    labels.count()
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    out._rs_cached = [edges, labels]
    return out


# -------------------------------------------------------------- embedding

def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    group_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine ≥ τ pairs, blocked by ``group_col`` when given (otherwise a
    full self-join — only for bounded inputs; at scale, block by an
    LSH/IVF bucket first, see operators.similarity)."""
    cols = [F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")]
    if group_col:
        cols.append(F.col(group_col).alias("_g"))
    base = df.select(*cols)
    on = ["_g"] if group_col else None
    a = base.select(*(["_g"] if group_col else []), F.col("_id").alias("id_a"), F.col("_v").alias("va"))
    b = base.select(*(["_g"] if group_col else []), F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
    joined = a.join(b, on=on) if on else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-dup at scale: hyperplane-LSH bucket blocking instead
    of a group/full self-join. Vectors with cosine ≥ cos(θ) agree on a
    random hyperplane sign with probability 1-θ/π, so near-identical pairs
    share the full sign pattern with high probability; the self-join runs
    on the bucket key only and exact cosine verifies survivors."""
    from ragflow_spark.operators.similarity import hyperplane_lsh_bucket

    bucketed = hyperplane_lsh_bucket(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
        "_v", planes,
    )
    a = bucketed.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"), "bucket")
    b = bucketed.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"), "bucket")
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("bucket", "id_a", "id_b", "cos")
    )
