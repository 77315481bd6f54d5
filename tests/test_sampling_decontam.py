"""Deterministic sampling/splitting + decontamination operators."""

from pyspark.sql import functions as F

from ragflow_spark.operators.decontam import contamination_report
from ragflow_spark.operators.sampling import hash_split, stratified_sample


def test_hash_split_deterministic_and_weighted(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02
    # repartition must not change any assignment (stable across layouts)
    b = hash_split(df.repartition(7), "doc_id",
                   {"train": 0.8, "val": 0.1, "test": 0.1})
    assert a.select("doc_id", "split").exceptAll(
        b.select("doc_id", "split")).count() == 0
    # a different seed reassigns some rows
    c = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
                   seed=7)
    assert a.select("doc_id", "split").exceptAll(
        c.select("doc_id", "split")).count() > 0


def test_stratified_sample_quota_and_floor(spark):
    rows = [(i, "big") for i in range(100)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = stratified_sample(df, "doc_id", "grp", 0.1)
    got = {r.grp: 0 for r in out.collect()}
    for r in out.collect():
        got[r.grp] = got.get(r.grp, 0) + 1
    assert got["big"] == 10          # exact ceil(100 * 0.1)
    assert got["tiny"] == 1          # min_rows floor: never emptied
    # deterministic: same call → same ids
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {r.doc_id for r in
            stratified_sample(df, "doc_id", "grp", 0.1).collect()}
    assert ids1 == ids2


def test_contamination_report_flags_eval_quotes(spark):
    eval_q = ("what is the capital of france and why does the river "
              "seine flow through the city of paris today")
    rows = [
        (1, f"intro text then {eval_q} then more body words follow here"),
        (2, "completely unrelated content about spark shuffles and "
            "partitioning strategies for large scale jobs"),
        (3, "short doc"),
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame([(eval_q,)], "text string")
    rep = {r.doc_id: r for r in
           contamination_report(train, ev, "doc_id", "text", n=13).collect()}
    assert rep[1].contaminated == 1 and rep[1].n_collisions > 0
    assert rep[2].contaminated == 0
    assert rep[3].contaminated == 0 and rep[3].n_ngrams == 0
    assert len(rep) == 3  # zero-collision docs stay in the audit


# ------------------------------------------------------------- weighted


def _wdf(spark, n=400):
    return spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(n)],
        "doc_id long, lang string",
    )


def test_weighted_sample_rates_and_determinism(spark):
    """Per-row rates hold in expectation and survivors are identical
    across runs and partitionings (hash-deterministic)."""
    from ragflow_spark.operators.sampling import weighted_sample
    from pyspark.sql import functions as F

    df = _wdf(spark)
    rate = F.when(F.col("lang") == "en", 0.9).otherwise(0.1)
    kept = weighted_sample(df.withColumn("r", rate), "doc_id", "r")
    rows = kept.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in rows}
    assert 150 <= by.get("en", 0) <= 200  # 200 docs at 0.9
    assert 5 <= by.get("zh", 0) <= 40     # 200 docs at 0.1
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in weighted_sample(
            df.repartition(13).withColumn("r", rate), "doc_id", "r"
        ).collect()
    )
    assert a == b


def test_weighted_sample_nested_same_seed_is_idempotent(spark):
    """Sampling at 0.5 twice over the SAME seed keeps the same half
    (documented composition property); a distinct seed draws
    independently."""
    from ragflow_spark.operators.sampling import weighted_sample
    from pyspark.sql import functions as F

    df = _wdf(spark).withColumn("r", F.lit(0.5))
    once = weighted_sample(df, "doc_id", "r")
    twice = weighted_sample(once, "doc_id", "r")
    assert sorted(r["doc_id"] for r in once.collect()) == sorted(
        r["doc_id"] for r in twice.collect()
    )
    other = weighted_sample(once, "doc_id", "r", seed=99)
    assert other.count() < once.count()


def test_weighted_sample_extreme_rates(spark):
    from ragflow_spark.operators.sampling import weighted_sample
    from pyspark.sql import functions as F

    df = _wdf(spark, 50)
    assert weighted_sample(
        df.withColumn("r", F.lit(1.0)), "doc_id", "r"
    ).count() == 50
    assert weighted_sample(
        df.withColumn("r", F.lit(0.0)), "doc_id", "r"
    ).count() == 0


# ------------------------------------------------ keep_best (r7 late)


def test_keep_best_argmax_and_tiebreak(spark):
    from ragflow_spark.operators.dedup import keep_best

    rows = [
        # cluster A: 11 wins on score
        (1, "A", 5), (2, "A", 9), (11, "A", 12),
        # cluster B: score tie 7-7 -> min id 3 wins
        (3, "B", 7), (4, "B", 7),
        # singleton keeps itself
        (9, "C", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, cl string, score long")
    got = {r.cl: (r.keep_id, r.n_members, r.best_score)
           for r in keep_best(df, "cl", "doc_id", "score").collect()}
    assert got == {"A": (11, 3, 12), "B": (3, 2, 7), "C": (9, 1, 1)}


def test_keep_best_single_shuffle_plan(spark):
    """One hash aggregate pair around one exchange — no window, no join."""
    from ragflow_spark.operators.dedup import keep_best

    df = spark.createDataFrame(
        [(i, f"c{i % 5}", i % 13) for i in range(60)],
        "doc_id long, cl string, score long",
    )
    plan = keep_best(df, "cl", "doc_id", "score") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan
