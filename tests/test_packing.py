"""Sequence packing (operators/packing.py): brute-force parity,
bucket-span invariance, fill invariants, and the plan-shape guard that
keeps the cumulative sum off a single task."""

import random
import re

from pyspark.sql import functions as F

from ragflow_spark.operators.packing import pack_windows, window_fill_stats


def _brute(toks_by_id: dict[int, int], ctx_len: int):
    """Reference packing: concat in ascending-id order, split every
    ctx_len tokens, emit (window, id, doc_start, doc_end, win_start)."""
    rows = []
    off = 0
    for i in sorted(toks_by_id):
        n = toks_by_id[i]
        if n <= 0:
            continue
        for w in range(off // ctx_len, (off + n - 1) // ctx_len + 1):
            rows.append((
                w, i,
                max(0, w * ctx_len - off),
                min(n, (w + 1) * ctx_len - off),
                max(0, off - w * ctx_len),
            ))
        off += n
    return sorted(rows)


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def _pack_input(spark, toks_by_id):
    return spark.createDataFrame(
        list(toks_by_id.items()), "doc_id long, n_tokens long"
    )


def test_pack_matches_brute_force(spark):
    rng = random.Random(7)
    toks = {i: rng.randint(0, 400) for i in range(200)}
    toks[50] = 5000        # giant doc straddling many windows
    toks[51] = 0           # zero-token doc is skipped
    df = _pack_input(spark, toks)
    got = _collect(pack_windows(df, "doc_id", "n_tokens", ctx_len=128))
    assert got == _brute(toks, 128)


def test_pack_sparse_nonuniform_ids(spark):
    rng = random.Random(11)
    ids = sorted(rng.sample(range(10_000_000), 150))
    toks = {i: rng.randint(1, 300) for i in ids}
    df = _pack_input(spark, toks)
    got = _collect(pack_windows(df, "doc_id", "n_tokens", ctx_len=256))
    assert got == _brute(toks, 256)


def test_pack_bucket_span_invariance(spark):
    """The bucket decomposition is an implementation detail: any span
    gives bit-identical window plans."""
    rng = random.Random(3)
    toks = {i: rng.randint(1, 200) for i in range(120)}
    df = _pack_input(spark, toks)
    a = _collect(pack_windows(df, "doc_id", "n_tokens", 64, bucket_span=7))
    b = _collect(pack_windows(df, "doc_id", "n_tokens", 64,
                              bucket_span=1 << 20))
    assert a == b


def test_pack_fill_invariants(spark):
    """Every window is exactly full except the last; per-doc slices
    partition [0, toks); win_tok_start is consistent with slice sizes."""
    rng = random.Random(5)
    toks = {i: rng.randint(1, 500) for i in range(80)}
    ctx = 128
    df = _pack_input(spark, toks)
    packed = pack_windows(df, "doc_id", "n_tokens", ctx)
    stats = window_fill_stats(packed, ctx).collect()
    last = max(r.window_id for r in stats)
    total = sum(toks.values())
    assert len(stats) == (total + ctx - 1) // ctx
    for r in stats:
        if r.window_id < last:
            assert r.is_full and r.filled_tokens == ctx, r
        else:
            assert r.filled_tokens == total - last * ctx, r
    # per-doc slices partition the doc
    rows = packed.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, parts in by_doc.items():
        parts.sort(key=lambda r: r.window_id)
        assert parts[0].doc_tok_start == 0
        assert parts[-1].doc_tok_end == toks[i]
        for a, b in zip(parts, parts[1:]):
            assert a.doc_tok_end == b.doc_tok_start  # contiguous
            assert b.win_tok_start == 0              # continuation rows
            assert b.window_id == a.window_id + 1    # straddle is dense


def test_pack_rejects_bad_params(spark):
    df = _pack_input(spark, {1: 10})
    for kw in ({"ctx_len": 0}, {"ctx_len": -5},
               {"ctx_len": 8, "bucket_span": 0}):
        try:
            pack_windows(df, "doc_id", "n_tokens", **kw)
            raise AssertionError(f"accepted {kw}")
        except ValueError:
            pass


def _formatted_plan(df):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_pack_plan_shape_no_global_window_over_corpus(spark):
    """The scale guard: the only unpartitioned Window runs over the
    per-bucket totals (one row per bucket), never the corpus — the
    corpus-side running sum must be partitioned by __bucket, and the
    prefix frame must come back via a BROADCAST join."""
    df = _pack_input(spark, {i: 10 for i in range(100)})
    plan = _formatted_plan(pack_windows(df, "doc_id", "n_tokens", 64))
    wins = re.findall(r"\(\d+\) Window[^\n]*\n(?:.*\n)*?(?=\(\d+\) |\Z)",
                      plan)
    assert wins, plan
    partitioned = [w for w in wins if "partitionBy" not in w.lower()]
    # formatted mode prints window spec args; the corpus window carries
    # __bucket in its partition spec, the totals window carries none
    corpus = [w for w in wins if "__run" in w]
    assert corpus and all("__bucket" in w for w in corpus), plan
    prefix = [w for w in wins if "__base" in w or "__btoks" in w]
    assert prefix, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan
    # and the broadcast side is the prefix frame, not the corpus
    assert "BroadcastExchange" in plan, plan
