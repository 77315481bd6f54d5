"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``      brute-force scan — the exact baseline. Spark plans it
  as per-partition partial top-k (TakeOrderedAndProject), so the full table
  is read once and only k rows per partition reach the driver-side merge.
- ``ivf_build/ivf_topk`` IVF-style bucketing: assign every vector to its
  nearest centroid once (the "index"), then a query probes only the
  ``nprobe`` nearest clusters — the 100 TB scale path (scan shrinks by
  ~n_clusters/nprobe; the assignment join is broadcast because centroids
  are tiny).
- ``hyperplane_lsh_bucket`` sign-of-dot-product bucketing with
  deterministic pseudo-random hyperplanes (seeded, engine-independent) —
  an alternative sublinear path; same-bucket search only.

No UDFs anywhere — all zip_with/aggregate expressions.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window, functions as F

from ragflow_spark.functions.vectors import dot, norm


_EXPR_CACHE: dict = {}


def _expr_cached(s: str):
    """Memoized ``F.expr``: the literal-LUT / literal-centroid expression
    strings these operators build run to ~50 KB, and the JVM SQL parse of
    such a string costs ~0.3-0.5 s of DRIVER time per construction (r8
    profile: ivf_build spent 0.85 s building a plan that executes in
    ~0.2 s). The parsed Column is an unresolved expression — reusable
    across queries — so identical strings (same centroids/codebooks, the
    steady-state index-serving case) parse once per SparkContext. Keyed
    by context identity so a restarted JVM never sees a stale handle;
    this caches PLAN CONSTRUCTION only, never data or results."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    key = (id(sc), s)
    col = _EXPR_CACHE.get(key)
    if col is None:
        col = F.expr(s)
        if len(_EXPR_CACHE) > 256:  # bound driver memory across corpora
            _EXPR_CACHE.clear()
        _EXPR_CACHE[key] = col
    return col


def _fold_norm(vec: list[float]) -> float:
    """L2 norm as the exact IEEE left-fold the SQL ``aggregate`` performs
    (((0+x₀²)+x₁²)+…, then sqrt — both correctly rounded), so inlining the
    result as a literal is bit-identical to evaluating norm(q) per row."""
    acc = 0.0
    for v in vec:
        acc += float(v) * float(v)
    return math.sqrt(acc)


def _cosine_q(vec_col, query_vec: list[float]):
    """cosine(vec, literal-query) with the query norm pre-folded in Python.
    Catalyst does NOT constant-fold higher-order functions (checked on the
    optimized plan: ``SQRT(aggregate([…literal…]))`` survives), so the
    plain ``cosine(col, q)`` re-aggregates the query array on EVERY row;
    this keeps the identical FP sequence at one multiply instead."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return dot(c, q) / (norm(c) * F.lit(_fold_norm(query_vec)))


def cosine_topk(
    df: DataFrame, vec_col: str, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    return (
        df.select(
            F.col(id_col),
            F.round(_cosine_q(vec_col, query_vec), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_build(
    df: DataFrame, vec_col: str, id_col: str, centroids: DataFrame
) -> DataFrame:
    """Assign each vector its nearest centroid id (max cosine, ties → lower
    cluster_id). ``centroids`` is tiny BY DEFINITION (it is the index), so
    it is collected and baked into ONE argmin projection — the plan is
    scan → project with no exchange at all. (The previous crossJoin +
    row_number window did the same 64 cosines per row AND shuffled the
    ×n_clusters exploded table to rank them: 95 s → project-only at 1M
    vectors.)"""
    cents = [
        (int(r["cluster_id"]), [float(x) for x in r["centroid"]])
        for r in centroids.select("cluster_id", "centroid").collect()
    ]
    # one expr string instead of ~1,500 py4j Column calls (same tree —
    # see _sql_sq_l2 on why construction cost matters)
    norm_vec = (
        f"sqrt(aggregate(`{vec_col}`, CAST(0.0 AS DOUBLE), "
        f"(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )
    entries = []
    for cid, vec in cents:
        lit = "array(" + ", ".join(_dlit(x) for x in vec) + ")"
        dot = (
            f"aggregate(zip_with(`{vec_col}`, {lit}, "
            f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        # centroid norm pre-folded in Python (_fold_norm: identical IEEE
        # sequence) — higher-order functions are NOT constant-folded, so
        # the sqrt(aggregate(literal…)) form re-ran per row per centroid.
        # The row's own norm is hoisted to ONE `_nv` projection below
        # instead of re-aggregating inside every centroid entry.
        entries.append(
            f"named_struct('nc', -(({dot}) / ((`_nv`) * "
            f"({_dlit(_fold_norm(vec))}))), 'cid', {cid})"
        )
    best = _expr_cached(f"array_min(array({', '.join(entries)})).cid")
    return df.withColumn("_nv", _expr_cached(norm_vec)).select(
        F.col(id_col), best.alias("cluster_id"), F.col(vec_col)
    )


def ivf_build_arrow(df: DataFrame, vec_col: str, id_col: str,
                    centroids: DataFrame) -> DataFrame:
    """Bulk IVF assignment: one numpy matmul per Arrow batch (cosine =
    normalized dot). Same assignment as ivf_build up to float-summation
    ties; the Catalyst version stays as the oracle-exact path (higher-order
    cosine expressions run interpreted — 78 s vs ~8 s at 1M vectors)."""
    cents = sorted(
        (int(r["cluster_id"]), [float(x) for x in r["centroid"]])
        for r in centroids.select("cluster_id", "centroid").collect()
    )
    cids = [c for c, _ in cents]

    def run(batches):
        import numpy as np
        import pandas as pd

        C = np.stack([np.asarray(v, dtype=np.float64) for _c, v in cents])
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        cid_arr = np.asarray(cids)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = Vn @ Cn.T
            # argmax cosine, ties → lower cluster_id (cents sorted by cid)
            assign = cid_arr[sims.argmax(axis=1)]
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "cluster_id": assign.astype("int64"),
                vec_col: pdf[vec_col],
            })

    return df.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, cluster_id long, {vec_col} array<float>"
    )


def ivf_topk(
    indexed: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    probe = (
        centroids.select(
            "cluster_id", _cosine_q("centroid", query_vec).alias("_cc")
        )
        .orderBy(F.col("_cc").desc(), F.col("cluster_id"))
        .limit(nprobe)
        .select("cluster_id")
    )
    return (
        indexed.join(F.broadcast(probe), on="cluster_id")
        .select(
            F.col(id_col),
            F.round(_cosine_q(vec_col, query_vec), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def make_centroids_from_rows(df: DataFrame, vec_col: str, id_col: str,
                             n_clusters: int) -> DataFrame:
    """Deterministic seed centroids: the n lowest-id vectors. (A k-means
    refinement loop is a straightforward extension — each iteration is one
    broadcast join + groupBy avg — but seeded centroids keep the oracle
    comparable.)"""
    return (
        df.orderBy(id_col)
        .limit(n_clusters)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cluster_id"),
            F.col(vec_col).alias("centroid"),
        )
    )


def kmeans_refine(
    indexed: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """One Lloyd iteration over an ivf_build assignment: new centroid =
    element-wise mean of each cluster's vectors. Fully native: posexplode →
    groupBy(cluster, dim) avg → re-assemble ordered arrays. Each iteration
    is one shuffle on (cluster_id, dim) + one on cluster_id; loop as many
    times as convergence needs (each iteration re-runs ivf_build with the
    returned centroids)."""
    dims = (
        indexed.select(
            "cluster_id", F.posexplode(F.col(vec_col)).alias("dim", "val")
        )
        .groupBy("cluster_id", "dim")
        .agg(F.avg(F.col("val").cast("double")).alias("mean_val"))
    )
    return (
        dims.groupBy("cluster_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_val"))
            ).alias("_pairs")
        )
        .select(
            "cluster_id",
            F.transform(F.col("_pairs"), lambda p: p["mean_val"]).alias("centroid"),
        )
    )


def deterministic_hyperplanes(dim: int, n_planes: int, seed: int = 42
                              ) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def hyperplane_lsh_bucket(
    df: DataFrame, vec_col: str, planes: list[list[float]]
) -> DataFrame:
    """Add a ``bucket`` string column: the sign pattern of dot products with
    each hyperplane."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return df.withColumn("bucket", F.concat(*bits))


# --------------------------------------------------- product quantization

def pq_codebooks_from_rows(df: DataFrame, vec_col: str, id_col: str,
                           m: int = 4, k: int = 8) -> list:
    """Deterministic PQ codebooks: per subspace j, the k centroids are the
    j-th subvectors of the k lowest-id rows (the same seeding convention as
    make_centroids_from_rows, keeping the oracle expressible). Returns
    books[m][k][sub_dim] as python floats; a k-means refinement per subspace
    would slot in front without changing encode/search."""
    rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    dim = len(rows[0][0])
    sub = dim // m
    return [
        [[float(x) for x in r[0][j * sub:(j + 1) * sub]] for r in rows]
        for j in range(m)
    ]


def _dlit(x) -> str:
    """SQL double literal (``repr`` round-trips IEEE doubles exactly; the
    ``D`` suffix keeps Spark's parser from reading it as DECIMAL)."""
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"non-finite literal {v!r} in codebook/centroid")
    return repr(v) + "D"


def _sql_sq_l2(slice_sql: str, centroid: list) -> str:
    """Squared L2 between an array slice and a literal centroid — summed
    left-to-right (matches DuckDB list_sum order for bit-equal oracles).
    Emitted as SQL text: plan CONSTRUCTION was the dominant cost of the
    PQ queries (2-5 s of py4j round trips per call building ~1,600 Column
    nodes, vs ~0.5 s of actual execution at sf0.1 — the r5→r6 regression
    chase); one expr string is a single JVM parse of the same tree."""
    lit = "array(" + ", ".join(_dlit(x) for x in centroid) + ")"
    return (
        f"aggregate(zip_with({slice_sql}, {lit}, "
        f"(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def pq_encode(df: DataFrame, vec_col: str, id_col: str, books: list,
              keep_cols: tuple = ()) -> DataFrame:
    """Encode every vector as m small codes: per subspace, argmin squared-L2
    over the codebook (tie → lower code). Pure Catalyst expressions (bit-
    exact vs the DuckDB oracle) but higher-order functions run interpreted —
    use ``pq_encode_arrow`` for bulk encoding (~50× faster measured). Output
    is m·log2(k) bits per vector — the 64-float embedding becomes a few
    bytes, which is what makes billion-scale ANN shippable. The whole codes
    projection is ONE ``F.expr`` string (see ``_sql_sq_l2`` on why)."""
    m = len(books)
    k = len(books[0])
    sub = len(books[0][0])
    code_exprs = []
    for j in range(m):
        sl = f"slice(`{vec_col}`, {j * sub + 1}, {sub})"
        entries = [
            f"named_struct('d', round({_sql_sq_l2(sl, books[j][c])}, 9), "
            f"'c', {c})"
            for c in range(k)
        ]
        code_exprs.append(f"array_min(array({', '.join(entries)})).c")
    codes = _expr_cached("array(" + ", ".join(code_exprs) + ")").alias("codes")
    return df.select(F.col(id_col), *[F.col(c) for c in keep_cols], codes)


def pq_train_codebooks(df: DataFrame, vec_col: str, id_col: str,
                       m: int = 8, k: int = 64, sample: int = 16384,
                       iters: int = 8) -> list:
    """Trained PQ codebooks: k-means per subspace over a deterministic
    sample (every ``step``-th id, driver-side numpy — the sample is
    O(sample·dim) bytes regardless of table size; the reference pattern for
    billion-vector PQ where training data is always a sample). Seeds from
    the first k sample rows, runs ``iters`` Lloyd steps per subspace."""
    import numpy as np

    n = df.count()
    step = max(1, n // sample)
    rows = (
        df.filter((F.col(id_col) % step) == 0)
        .orderBy(id_col)
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    X = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    dim = X.shape[1]
    sub = dim // m
    books = []
    for j in range(m):
        S = X[:, j * sub:(j + 1) * sub]
        C = S[:k].copy()
        for _ in range(iters):
            d = (
                (S * S).sum(axis=1)[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2.0 * (S @ C.T)
            )
            assign = d.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_encode_arrow(df: DataFrame, vec_col: str, id_col: str, books: list,
                    keep_cols: tuple = ()) -> DataFrame:
    """The scale path for PQ encoding: vectorized numpy argmin over Arrow
    batches (the native literal-expression version is exact vs the DuckDB
    oracle but runs interpreted — higher-order functions don't codegen —
    and measured ~50× slower per row at 64k vectors). Same codes up to
    float-summation-order ties. ``keep_cols`` rides extra columns through
    (e.g. cluster_id + the vector itself for the composed IVF→PQ index)."""
    keep = [c for c in keep_cols if c != id_col]
    keep_schema = "".join(
        f", {name} {dtype}" for name, dtype in df.select(*keep).dtypes
    ) if keep else ""

    def run(batches):
        import numpy as np
        import pandas as pd

        B = [np.asarray(b, dtype=np.float64) for b in books]  # [m](k, sub)
        sub = B[0].shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([
                np.asarray(v, dtype=np.float64) for v in pdf[vec_col]
            ])
            codes = np.empty((len(V), len(B)), dtype=np.int32)
            for j, cb in enumerate(B):
                s = V[:, j * sub:(j + 1) * sub]
                # ||a-b||² = ||a||² + ||b||² - 2a·b as ONE matmul instead of
                # materializing the (batch, k, sub) broadcast difference
                d = (
                    (s * s).sum(axis=1)[:, None]
                    + (cb * cb).sum(axis=1)[None, :]
                    - 2.0 * (s @ cb.T)
                )
                codes[:, j] = d.argmin(axis=1)
            out = {id_col: pdf[id_col].astype("int64")}
            for c in keep:
                out[c] = pdf[c]
            out["codes"] = [c.tolist() for c in codes]
            yield pd.DataFrame(out)

    in_cols = [id_col] + keep + ([vec_col] if vec_col not in keep else [])
    return df.select(*in_cols).mapInPandas(
        run, schema=f"{id_col} long{keep_schema}, codes array<int>"
    )


def _adc_expr(books: list, query_vec: list):
    """Literal-LUT asymmetric-distance expression over a ``codes`` column:
    query→centroid distances precomputed on the driver (m·k doubles),
    scoring = m array lookups + adds, no per-row vector math."""
    m = len(books)
    sub = len(books[0][0])
    adc = None
    for j in range(m):
        q = [float(x) for x in query_vec[j * sub:(j + 1) * sub]]
        dists = [
            sum((a - b) * (a - b) for a, b in zip(q, cent))
            for cent in books[j]
        ]
        lut = F.array(*[F.lit(d) for d in dists])
        term = F.element_at(lut, F.element_at("codes", j + 1) + 1)
        adc = term if adc is None else adc + term
    return adc


def ivf_pq_topk(
    indexed_enc: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
    books: list,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    rerank: int = 100,
) -> DataFrame:
    """The composed billion-vector query path: IVF probe prunes to
    ``nprobe`` clusters (broadcast semi-join on cluster_id — partition
    pruning if the index is written partitioned by cluster), PQ ADC ranks
    the candidates with a literal-LUT projection, and exact cosine
    re-scores only the ``rerank``-row shortlist. ``indexed_enc`` is the
    materialized index: (id, vec, cluster_id, codes) from
    ivf_build + pq_encode — built once, queried many times.

    Plan shape: scan → broadcast probe join → TakeOrderedAndProject
    (rerank) → exact cosine over ≤rerank rows → TakeOrderedAndProject (k).
    No shuffle wider than the rerank shortlist."""
    probe = (
        centroids.select(
            "cluster_id", _cosine_q("centroid", query_vec).alias("_cc")
        )
        .orderBy(F.col("_cc").desc(), F.col("cluster_id"))
        .limit(nprobe)
        .select("cluster_id")
    )
    shortlist = (
        indexed_enc.join(F.broadcast(probe), on="cluster_id")
        .select(F.col(id_col), F.col(vec_col),
                _adc_expr(books, query_vec).alias("_adc"))
        .orderBy(F.col("_adc").asc(), F.col(id_col))
        .limit(rerank)
    )
    return (
        shortlist.select(
            F.col(id_col),
            F.round(_cosine_q(vec_col, query_vec), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def pq_adc_topk(encoded: DataFrame, books: list, query_vec: list,
                topk: int = 10, id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query's distance to
    every codebook centroid is precomputed on the driver (m·k doubles) and
    baked into the plan as literals, so scoring a row is m array lookups +
    adds — no vector math per row. Plans as TakeOrderedAndProject: only k
    rows per partition reach the merge."""
    adc = _adc_expr(books, query_vec)
    return (
        encoded.select(F.col(id_col), F.round(adc, 6).alias("adc"))
        .orderBy(F.col("adc").asc(), F.col(id_col))
        .limit(topk)
    )
