"""DSIR (operators/dsir.py): brute-force numeric parity, the
identical-corpus null case, directional sanity, and plan-shape guards."""

import hashlib
import math

from pyspark.sql import functions as F

from ragflow_spark.operators import dsir

B = 64
SEED = 42


# ------------------------------------------------------- python twin

def _grams(text: str) -> list[str]:
    t = text.strip().lower().split()
    if not t:
        t = [""]
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(g: str, mod: int) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % mod


def _half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _brute(raw: dict[int, str], target: dict[int, str], k: int):
    cp: dict[int, int] = {}
    cq: dict[int, int] = {}
    for txt in target.values():
        for g in _grams(txt):
            b = _bucket(g, B)
            cp[b] = cp.get(b, 0) + 1
    for txt in raw.values():
        for g in _grams(txt):
            b = _bucket(g, B)
            cq[b] = cq.get(b, 0) + 1
    n_p, n_q = sum(cp.values()), sum(cq.values())
    lam = {
        b: _half_away(1e6 * math.log(
            ((cp.get(b, 0) + 1) / float(n_p + B))
            / ((cq.get(b, 0) + 1) / float(n_q + B))
        ))
        for b in set(cp) | set(cq)
    }
    weights = {}
    for i, txt in raw.items():
        gs = _grams(txt)
        weights[i] = (len(gs), sum(lam[_bucket(g, B)] for g in gs))
    keyed = []
    for i, (ng, w) in weights.items():
        hb = int(hashlib.md5(f"{i}:{SEED}".encode()).hexdigest()[:8],
                 16) % 1_000_000
        u = (hb + 0.5) / 1_000_000.0
        g = _half_away(-math.log(-math.log(u)) * 1e6)
        keyed.append((i, ng, w, g, w + g))
    keyed.sort(key=lambda r: (-r[4], r[0]))
    return lam, weights, keyed[:k]


def _corpora():
    raw = {
        i: f"doc number {i} about "
           + ("finance markets stocks bonds " * (1 + i % 3)
              if i % 2 else "cooking recipes flour sugar " * (1 + i % 3))
        for i in range(40)
    }
    target = {j: "finance markets trading stocks bonds yields "
                 f"report {j}" for j in range(10)}
    return raw, target


def _dfs(spark, raw, target):
    rdf = spark.createDataFrame(list(raw.items()),
                                "doc_id long, text string")
    tdf = spark.createDataFrame(list(target.items()),
                                "doc_id long, text string")
    return rdf, tdf


def test_dsir_matches_brute_force(spark):
    raw, target = _corpora()
    rdf, tdf = _dfs(spark, raw, target)
    lam, weights, top = _brute(raw, target, k=10)

    raw_dbc = dsir.doc_bucket_counts(rdf, "doc_id", "text", B)
    tgt_g = dsir.gram_buckets(tdf, "doc_id", "text", B)
    ratios = dsir.dsir_log_ratios(
        dsir.bucket_counts(tgt_g),
        raw_dbc.groupBy("bucket").agg(F.sum("n").alias("n")), B,
    )
    got_lam = {r.bucket: r.lambda_micro for r in ratios.collect()}
    assert got_lam == lam

    w = dsir.dsir_weights(raw_dbc, ratios, "doc_id")
    got_w = {r.doc_id: (r.n_grams, r.weight_micro) for r in w.collect()}
    assert got_w == weights

    sel = dsir.dsir_resample(w, "doc_id", k=10, seed=SEED).collect()
    got_top = [(r.doc_id, r.n_grams, r.weight_micro, r.gumbel_micro,
                r.key_micro) for r in sel]
    assert got_top == top


def test_dsir_end_to_end_wrapper(spark):
    raw, target = _corpora()
    rdf, tdf = _dfs(spark, raw, target)
    _, _, top = _brute(raw, target, k=5)
    sel = dsir.dsir_select(rdf, tdf, "doc_id", "text", k=5,
                           num_buckets=B, seed=SEED).collect()
    assert [r.doc_id for r in sel] == [t[0] for t in top]


def test_dsir_identical_corpora_all_ratios_zero(spark):
    raw, _ = _corpora()
    rdf, _ = _dfs(spark, raw, raw)
    g = dsir.gram_buckets(rdf, "doc_id", "text", B)
    ratios = dsir.dsir_log_ratios(dsir.bucket_counts(g),
                                  dsir.bucket_counts(g), B)
    assert {r.lambda_micro for r in ratios.collect()} == {0}


def test_dsir_prefers_on_target_docs(spark):
    """Finance raw docs must out-weight cooking raw docs under a
    finance target."""
    raw, target = _corpora()
    rdf, tdf = _dfs(spark, raw, target)
    raw_dbc = dsir.doc_bucket_counts(rdf, "doc_id", "text", B)
    tgt_g = dsir.gram_buckets(tdf, "doc_id", "text", B)
    ratios = dsir.dsir_log_ratios(
        dsir.bucket_counts(tgt_g),
        raw_dbc.groupBy("bucket").agg(F.sum("n").alias("n")), B,
    )
    w = {r.doc_id: r.weight_micro
         for r in dsir.dsir_weights(raw_dbc, ratios, "doc_id").collect()}
    fin = [w[i] for i in range(40) if i % 2]
    cook = [w[i] for i in range(40) if not i % 2]
    assert min(fin) > max(cook)


def test_dsir_plan_shapes(spark):
    """λ rides a BROADCAST join onto the exploded grams, and the top-k
    compiles to TakeOrderedAndProject — never a global Sort+Limit over
    the corpus."""
    raw, target = _corpora()
    rdf, tdf = _dfs(spark, raw, target)
    sel = dsir.dsir_select(rdf, tdf, "doc_id", "text", k=5,
                           num_buckets=B, seed=SEED)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_dsir_save_load_and_unseen_default(spark, tmpdir_path):
    """The crawl-increment pattern: a saved model reloads bit-identical,
    and an increment whose grams hash to UNSEEN buckets gets the
    both-counts-zero smoothed default instead of silently dropping."""
    import os

    raw, target = _corpora()
    rdf, tdf = _dfs(spark, raw, target)
    raw_dbc = dsir.doc_bucket_counts(rdf, "doc_id", "text", B)
    ratios = dsir.dsir_log_ratios(
        dsir.bucket_counts(dsir.gram_buckets(tdf, "doc_id", "text", B)),
        raw_dbc.groupBy("bucket").agg(F.sum("n").alias("n")), B,
    )
    path = os.path.join(tmpdir_path, "dsir_model")
    dsir.dsir_save(ratios, B, path)
    loaded, nb, default = dsir.dsir_load(spark, path)
    assert nb == B
    assert (sorted(tuple(r) for r in loaded.collect())
            == sorted(tuple(r) for r in ratios.collect()))
    # default matches the hand-computed both-zero ratio
    lam, _, _ = _brute(raw, target, k=1)
    n_p = sum(len(_grams(t)) for t in target.values())
    n_q = sum(len(_grams(t)) for t in raw.values())
    assert default == _half_away(
        1e6 * math.log((1 / float(n_p + B)) / (1 / float(n_q + B))))
    # an increment doc made of unseen grams scores n_grams * default
    inc = spark.createDataFrame(
        [(999, "zzqx wvvk pplm")], "doc_id long, text string")
    inc_dbc = dsir.doc_bucket_counts(inc, "doc_id", "text", B)
    # drop its buckets from the model to force the unseen path
    inc_buckets = {r.bucket for r in inc_dbc.collect()}
    pruned = loaded.filter(~F.col("bucket").isin(*inc_buckets))
    w = dsir.dsir_weights(inc_dbc, pruned, "doc_id",
                          default_lambda_micro=default).first()
    assert w.n_grams == 5  # 3 unigrams + 2 bigrams
    assert w.weight_micro == 5 * default
    # without the default, the inner join would have dropped the doc
    assert dsir.dsir_weights(inc_dbc, pruned, "doc_id").count() == 0
