"""Round-2 scale/correctness guards: winnow vectorization parity, default-on
hot-band caps in the LSH pair joins, manifest partition-modulus validation,
indirect /Length PDF streams, document-absolute page tags under from_page."""

import re

import pytest
from pyspark.sql import functions as F

from ragflow_spark.core import pdf_mini
from ragflow_spark.core.pdf_layout import layout_parse
from ragflow_spark.operators import dedup
from ragflow_spark.operators.textstats import winnow_numpy, winnow_reference


# --------------------------------------------------- winnowing parity

@pytest.mark.parametrize("text", [
    "",
    "short",
    "exactly8",
    "the quick brown fox jumps over the lazy dog " * 5,
    "UPPER and lower MiXeD with   spaces\nand\nnewlines " * 3,
    "数据查询引擎分区过滤合并文档提取内容" * 10,           # CJK (codes > 255)
    "emoji 🙂 and accents éàü " * 8,
    "a" * 7,    # len == k-1 → no k-grams
    "a" * 8,    # one k-gram, fewer hashes than window
    "a" * 11,   # exactly window hashes
    "abcdefgh" * 4,
])
def test_winnow_numpy_matches_reference(text):
    assert winnow_numpy(text) == winnow_reference(text)


def test_winnow_numpy_matches_reference_other_params():
    s = "some repeated content some repeated content tail"
    for k, w in [(4, 3), (5, 8), (12, 2)]:
        assert winnow_numpy(s, k, w) == winnow_reference(s, k, w)


# ------------------------------------------------- hot-band guards

@pytest.fixture(scope="module")
def boilerplate_df(spark):
    """1 000 docs sharing identical boilerplate (degenerate LSH bands) plus
    a genuine near-dup pair."""
    boiler = "all rights reserved navigation home about contact terms"
    rows = [(i, f"{boiler}") for i in range(1000)]
    rows.append((2000, "completely unique text alpha beta gamma delta one"))
    rows.append((2001, "completely unique text alpha beta gamma delta two"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_hot_band_guard_bounds_candidates(boilerplate_df):
    # identical docs share every band → one 1000-doc band per band-no;
    # the guard drops them (exact dedup owns identical content) while the
    # genuine near-dup pair (distinct bands, small) survives
    pairs = dedup.minhash_pairs(
        boilerplate_df, "doc_id", "text",
        jaccard_threshold=0.5, max_band_size=100,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    dedup.release(pairs)
    assert (2000, 2001) in got
    assert all(a >= 2000 for a, _ in got), "degenerate band leaked k² pairs"

    # unguarded: the same call emits ~500k pairs — assert the guard is the
    # default by checking the signature default
    import inspect

    sig = inspect.signature(dedup.minhash_pairs)
    assert sig.parameters["max_band_size"].default == dedup.DEFAULT_MAX_BAND_SIZE
    assert dedup.DEFAULT_MAX_BAND_SIZE is not None


def test_simhash_hot_band_guard_bounds_candidates(boilerplate_df):
    pairs = dedup.simhash_pairs(
        boilerplate_df, "doc_id", "text", max_hamming=6, max_band_size=100,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert all(a >= 2000 for a, _ in got), "degenerate chunk band leaked"
    import inspect

    sig = inspect.signature(dedup.simhash_pairs)
    assert sig.parameters["max_band_size"].default == dedup.DEFAULT_MAX_BAND_SIZE


def test_ngram_pairs_id_only_join_same_results(spark):
    rows = [
        (1, "g1", "alpha beta gamma delta"),
        (2, "g1", "alpha beta gamma epsilon"),
        (3, "g1", "totally different words here now"),
        (4, "g2", "alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    out = dedup.ngram_jaccard_pairs(df, "doc_id", "text", "src",
                                    threshold=0.5, shingle_n=1)
    got = {(r.src, r.id_a, r.id_b, r.jaccard) for r in out.collect()}
    dedup.release(out)
    assert got == {("g1", 1, 2, 0.6)}


def test_ngram_prefix_filter_lossless(spark):
    """The prefix-filtered path (default) must return the EXACT pair set
    of the O(g²) baseline for any threshold/shingle config — the filter
    is provably lossless (AllPairs/PPJoin prefix theorem), and this pins
    the implementation to the proof across near-dup chains, an exact-dup
    cluster, empty docs, and cross-group isolation."""
    import random

    rng = random.Random(7)
    words = [f"w{i}" for i in range(200)]
    rows = []
    for i in range(240):
        if i % 5 == 1 and i > 1:
            base = rows[i - 1][2].split()
            text = " ".join(base[:-max(1, len(base) // 6)])
        elif i % 53 == 0:
            text = ""
        elif i % 17 == 0:
            text = "common boiler plate"
        else:
            text = " ".join(rng.choices(words, k=rng.randint(4, 30)))
        rows.append((i, f"g{i % 3}", text))
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    for threshold, n in ((0.5, 1), (0.3, 2), (0.8, 1)):
        ex = dedup.ngram_jaccard_pairs(df, "doc_id", "text", "src",
                                       threshold=threshold, shingle_n=n,
                                       method="exact")
        pf = dedup.ngram_jaccard_pairs(df, "doc_id", "text", "src",
                                       threshold=threshold, shingle_n=n,
                                       method="prefix")
        mm = dedup.ngram_jaccard_pairs(df, "doc_id", "text", "src",
                                       threshold=threshold, shingle_n=n,
                                       method="matmul")
        e = sorted(map(tuple, ex.collect()))
        p = sorted(map(tuple, pf.collect()))
        m = sorted(map(tuple, mm.collect()))
        dedup.release(ex)
        dedup.release(pf)
        dedup.release(mm)
        assert e == p and e, (threshold, n, len(e), len(p))
        # r8 matmul candidates + exact-int Catalyst verify: same rows AND
        # same jaccard doubles as the join-based exact baseline
        assert e == m, (threshold, n, len(e), len(m))


def test_dup_clusters_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 7)], "id_a long, id_b long"
    )
    out = dedup.dup_clusters(pairs)
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    dedup.release(out)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 5: 5, 7: 5}


# ------------------------------------------- manifest modulus guard

def test_resume_rejects_different_num_partitions(spark, tmpdir_path):
    import os

    from ragflow_spark.operators.extract import run_extraction_job
    from ragflow_spark.sources import pages as pages_src

    pages = pages_src.generate_pages_df(spark, 24, parallelism=2)
    out = os.path.join(tmpdir_path, "chunks")
    man = os.path.join(tmpdir_path, "manifest")
    run_extraction_job(pages, out, man, num_partitions=8)
    # same modulus resumes fine (no-op: everything manifested)
    run_extraction_job(pages, out, man, num_partitions=8, attempt=2)
    with pytest.raises(ValueError, match="num_partitions"):
        run_extraction_job(pages, out, man, num_partitions=16, attempt=3)


# ------------------------------------------------- PDF edge cases

def test_indirect_length_stream_falls_back_to_endstream_scan():
    blob = pdf_mini.build_simple_pdf([["hello world", "second line"]],
                                     compress=False)
    # rewrite the direct /Length N into an indirect '/Length 99 0 R'
    patched = re.sub(rb"/Length \d+ >>", b"/Length 99 0 R >>", blob, count=1)
    assert patched != blob
    pages = pdf_mini.extract_text_lines(patched)
    assert pages[0] == ["hello world", "second line"]


def test_invisible_white_text_dropped():
    # F2: white-fill (gray=1) text never reaches the box stream; visible
    # text around it is unaffected
    items = [
        (72.0, 700.0, "visible heading text"),
        (72.0, 650.0, "hidden keyword stuffing", 1.0),
        (72.0, 600.0, "visible body text"),
    ]
    blob = pdf_mini.build_positioned_pdf([items])
    texts = [b["text"] for b in pdf_mini.extract_boxes(blob)[0]]
    assert "visible heading text" in texts
    assert "visible body text" in texts
    assert all("hidden" not in t for t in texts)


def test_layout_parse_from_page_tags_are_document_absolute():
    pages = [[f"page {p} line {i}" for i in range(3)] for p in range(1, 4)]
    blob = pdf_mini.build_simple_pdf(pages)
    secs = layout_parse(blob, from_page=1, to_page=3)
    # page field may be multi-page ("2-3") when a merge crosses pages,
    # exactly like the reference's _line_tag (pdf_parser.py:848-856)
    tag_pages = {
        int(p)
        for _text, tag in secs
        for m in [re.match(r"@@([\d-]+)\t", tag)] if m
        for p in m.group(1).split("-")
    }
    assert tag_pages and tag_pages.issubset({2, 3}), tag_pages


def test_drop_common_segments(spark):
    rows = [
        (1, "unique one\nshared footer\nunique two"),
        (2, "other text\nshared footer"),
        (3, "third doc\nno repeats here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_kept, r.n_dropped, r.clean_md5)
           for r in dedup.drop_common_segments(df, "doc_id", "text").collect()}
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1] == (2, 1, md5("unique one\nunique two"))
    assert out[2] == (1, 1, md5("other text"))
    assert out[3] == (2, 0, md5("third doc\nno repeats here"))


# ------------------------------------------- round-3 guards

def test_dup_clusters_path_graph_logarithmic_rounds(spark):
    """Adversarial 10k-node path graph: large-star/small-star must converge
    in O(log n) rounds (naive min-label propagation needs ~n rounds)."""
    import math

    n = 10_000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = dedup.dup_clusters(pairs)
    rows = out.collect()
    assert out._rs_rounds <= 2 * math.log2(n)
    assert len(rows) == n
    assert all(r.cluster_id == 0 for r in rows)
    dedup.release(out)


def test_dup_clusters_nonconvergence_raises(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="not converged"):
        dedup.dup_clusters(pairs, max_iter=0)


def test_embedding_near_dup_full_scan_requires_opt_in(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="allow_full_scan"):
        dedup.embedding_near_dup_pairs(df, "vec_id", "embedding")
    out = dedup.embedding_near_dup_pairs(
        df, "vec_id", "embedding", allow_full_scan=True
    )
    assert out.count() == 1


def test_embedding_near_dup_arrow_matches_join_path(spark):
    """r8 matmul-candidate path vs the per-pair join expression path:
    identical (id_a, id_b, cos) rows — the candidates come from BLAS but
    every emitted cosine is the same Catalyst expression, so even the
    float doubles must agree bit-for-bit. Covers near-threshold pairs,
    negative cosines and anti-parallel vectors. (Zero-norm vectors raise
    ANSI DIVIDE_BY_ZERO on BOTH paths — the arrow path keeps non-finite
    numpy cosines as candidates precisely so the exact expression fires
    for them the same way it always did.)"""
    import math
    import random

    rng = random.Random(11)
    rows = []
    for i in range(120):
        g = i % 3
        base = [math.sin(g * 7 + j) for j in range(8)]
        if i % 4 == 0:  # near-dup of the group axis
            vec = [x + rng.uniform(-0.05, 0.05) for x in base]
        elif i % 5 == 0:
            vec = [-x for x in base]  # anti-parallel
        else:
            vec = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, g, [float(x) for x in vec]))
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    for t in (0.95, 0.35, -0.5):
        ar = dedup.embedding_near_dup_pairs(
            df, "vec_id", "embedding", "label", threshold=t, use_arrow=True)
        jn = dedup.embedding_near_dup_pairs(
            df, "vec_id", "embedding", "label", threshold=t, use_arrow=False)
        a = sorted(map(tuple, ar.collect()))
        j = sorted(map(tuple, jn.collect()))
        dedup.release(ar)
        assert a == j and a, (t, len(a), len(j))


def test_dropped_band_count_audit(boilerplate_df):
    pairs = dedup.minhash_pairs(
        boilerplate_df, "doc_id", "text", max_band_size=100,
    )
    pairs.collect()
    assert dedup.dropped_band_count(pairs) > 0
    dedup.release(pairs)
    ok = dedup.minhash_pairs(
        boilerplate_df.limit(3), "doc_id", "text", max_band_size=100,
    )
    ok.collect()
    assert dedup.dropped_band_count(ok) == 0
    dedup.release(ok)


def test_drop_common_segments_regex_special_delim(spark):
    # '|' is regex-special: unescaped it splits between every character
    rows = [(1, "shared|unique one"), (2, "shared|unique two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_kept, r.n_dropped)
           for r in dedup.drop_common_segments(df, "doc_id", "text", "|").collect()}
    assert out == {1: (1, 1), 2: (1, 1)}


def test_extract_scan_prunes_unused_columns(spark, tmpdir_path):
    """The pages scan must not read the wide 'text' column (the UDF only
    consumes url/warc_ts/html/lang/parser/fmt) — column pruning reaching
    the parquet ReadSchema is the difference between scanning 100 TB and
    scanning the 60% of it the pipeline actually uses."""
    import os

    from ragflow_spark.operators.extract import extract_chunks
    from ragflow_spark.sources import pages as pages_src

    path = os.path.join(tmpdir_path, "pages_prune")
    pages_src.write_pages(spark, 32, path, parallelism=2)
    plan = extract_chunks(spark.read.parquet(path), num_partitions=4)
    explained = plan._jdf.queryExecution().explainString(
        plan._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    scan = [ln for ln in explained.split("\n") if "ReadSchema" in ln]
    assert scan, explained
    assert "text" not in scan[0].split("ReadSchema:")[1]
    assert "html" in scan[0]


def test_resume_reprocesses_drifted_partitions(spark, tmpdir_path):
    """Input drift: docs appended after a partition was manifested must be
    picked up by the next attempt (count-verified resume), not silently
    skipped by the partition-granular anti-join."""
    import os

    from ragflow_spark.operators.extract import run_extraction_job
    from ragflow_spark.sources import pages as pages_src

    out = os.path.join(tmpdir_path, "chunks_drift")
    man = os.path.join(tmpdir_path, "manifest_drift")
    first = pages_src.generate_pages_df(spark, 24, parallelism=2)
    run_extraction_job(first, out, man, num_partitions=8)
    n1 = spark.read.parquet(out).select("url").distinct().count()
    assert n1 == 24
    # append 8 more docs (they hash into already-done partitions)
    grown = pages_src.generate_pages_df(spark, 32, parallelism=2)
    run_extraction_job(grown, out, man, num_partitions=8, attempt=2)
    n2 = spark.read.parquet(out).select("url").distinct().count()
    assert n2 == 32, "appended docs were silently skipped by resume"
    # third run with unchanged input is a no-op (counts now match)
    run_extraction_job(grown, out, man, num_partitions=8, attempt=3)
    from ragflow_spark.plans.manifest import read_manifest

    m = read_manifest(spark, man)
    assert m.filter("attempt = 3").count() == 0


# ----------------------------------------- verify-join plan shape (r5)

def _formatted_plan(df):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _nodes(plan):
    """Split a formatted explain into (header, body) physical nodes."""
    out = []
    for block in re.split(r"\n(?=\(\d+\) )", plan):
        lines = block.split("\n")
        out.append((lines[0], "\n".join(lines[1:])))
    return out


def test_minhash_verify_join_plan_shape(spark):
    """The r4 1M OOM postmortem, pinned as plan shape (VERDICT r4 #8):
    (a) the hot-band guard is a BROADCAST left-anti join on _band (the
    hot set is O(dropped bands), never a shuffle side); (b) the k²
    band self-join carries ID-ONLY rows — no node that partitions or
    broadcasts on _band may carry the _sh shingle arrays or _sig
    signatures (they dominated shuffle bytes and heap in the 1M run)."""
    docs = spark.createDataFrame(
        [(i, f"some text body number {i} with shared words here")
         for i in range(50)],
        "doc_id long, text string",
    )
    out = dedup.minhash_pairs(docs, "doc_id", "text", max_band_size=16)
    plan = _formatted_plan(out)
    anti = [h for h, b in _nodes(plan)
            if "Join" in h and "LeftAnti" in b and "_band" in b]
    assert anti, plan
    assert all("Broadcast" in h for h in anti), anti
    for head, body in _nodes(plan):
        if ("Exchange" in head or "Broadcast" in head) and "_band#" in body:
            assert "_sh#" not in body and "_sig#" not in body, (head, body)
    dedup.release(out)


def test_simhash_verify_join_plan_shape(spark):
    """Same pin for the simhash chunk-band join: broadcast anti on
    _chunk, and no 64-bit signature column riding the chunk join's
    exchanges beyond the (id, sim) pair the verify needs."""
    docs = spark.createDataFrame(
        [(i, f"another text body number {i} with shared words here")
         for i in range(50)],
        "doc_id long, text string",
    )
    out = dedup.simhash_pairs(docs, "doc_id", "text", max_band_size=16)
    plan = _formatted_plan(out)
    anti = [h for h, b in _nodes(plan)
            if "Join" in h and "LeftAnti" in b and "_chunk" in b]
    assert anti, plan
    assert all("Broadcast" in h for h in anti), anti
    dedup.release(out)


def test_session_defaults_pin_aqe_skew_join(spark):
    """The dedup/extraction sizing rule (PLANS.md §memory): AQE with
    skew-join splitting is a default, not an opt-in — partition-level
    skew the static planner can't see (hot bands under the cap, giant
    docs) re-splits at runtime."""
    for key in ("spark.sql.adaptive.enabled",
                "spark.sql.adaptive.skewJoin.enabled"):
        assert spark.conf.get(key) == "true", key


def test_substring_dup_pairs_guarantee_and_guard(spark):
    """Winnowing-based exact-substring pair mining: any cross-doc
    substring >= k+window-1 chars guarantees a shared fingerprint (pair
    found); unrelated docs emit nothing; a boilerplate fingerprint
    bucket over max_bucket_size drops (hot-band policy)."""
    import random

    rng = random.Random(99)
    rand = lambda n: "".join(  # noqa: E731
        rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))
    shared = "this exact sentence is copied between the two documents"
    rows = [
        (1, rand(120) + shared + rand(120)),
        (2, rand(130) + shared + rand(110)),
        (3, rand(260)),
    ]
    # boilerplate bomb: 40 docs with identical text -> their buckets all
    # have size 40 > max_bucket_size=20 -> no pairs from them
    rows += [(100 + i, "identical boilerplate content here " * 4)
             for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.shared_fps
        for r in dedup.substring_dup_pairs(
            df, "doc_id", "text", k=8, window=4, max_bucket_size=20
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(a < 100 and b < 100 for a, b in pairs), pairs
    assert not any(3 in p for p in pairs)


def test_charlm_scoring_plan_is_zero_shuffle(spark):
    """The lm.py 100 TB contract pinned as plan shape: scoring is scan ->
    project -> one Arrow pass, with NO Exchange anywhere (the model
    rides the closure); training's only exchange merges the <=K^2
    partial count rows."""
    import numpy as np

    from ragflow_spark.operators import lm

    docs = spark.createDataFrame(
        [(i, f"text body {i}") for i in range(20)],
        "doc_id long, text string",
    )
    model = np.zeros(lm.K * lm.K, dtype=np.int64)
    plan = _formatted_plan(lm.charlm_score(docs, "doc_id", "text", model))
    assert "Exchange" not in plan, plan
    train_plan = _formatted_plan(lm.charlm_bigram_counts(docs, "text"))
    assert len([h for h, _ in _nodes(train_plan) if "Exchange" in h]) == 1, (
        train_plan
    )


def test_nb_scoring_plan_is_zero_shuffle(spark):
    """Same pin for the classifier: nb_score is scan -> bucket
    projection -> Arrow gather, no Exchange."""
    import numpy as np

    from ragflow_spark.operators import clf

    docs = spark.createDataFrame(
        [(i, f"text body {i}") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _formatted_plan(
        clf.nb_score(docs, "doc_id", "text", np.zeros(64, dtype=np.int64), 0)
    )
    assert "Exchange" not in plan, plan


def test_host_stats_plan_single_scan_no_join(spark):
    """host_stats' one-scan contract: exactly one parquet/LocalTableScan
    source, no Join nodes (modal lang is the struct-min aggregate), and
    exactly three exchanges (fp window, (host,lang) agg, host agg)."""
    from ragflow_spark.operators import weburl

    docs = spark.createDataFrame(
        [(i, f"text body {i}", "en", f"h{i % 3}") for i in range(30)],
        "doc_id long, text string, lang string, source string",
    )
    plan = _formatted_plan(
        weburl.host_stats(docs, "source", "doc_id", "text")
    )
    scans = [h for h, _ in _nodes(plan)
             if "Scan" in h and "ReusedExchange" not in h]
    assert len(scans) == 1, plan
    assert not [h for h, _ in _nodes(plan) if "Join" in h], plan
    exchanges = [h for h, _ in _nodes(plan)
                 if "Exchange" in h and "Reused" not in h]
    assert len(exchanges) == 3, (exchanges, plan)


def test_weighted_sample_plan_is_pushdown_filter(spark, tmpdir_path):
    """weighted_sample composes with the scan: over parquet the md5
    bucket predicate appears as a post-scan Filter with no Exchange
    (zero-shuffle contract)."""
    import os

    from pyspark.sql import functions as F

    from ragflow_spark.operators.sampling import weighted_sample

    path = os.path.join(tmpdir_path, "ws.parquet")
    spark.range(0, 100).withColumnRenamed("id", "doc_id").write.mode(
        "overwrite"
    ).parquet(path)
    df = spark.read.parquet(path).withColumn("r", F.lit(0.5))
    plan = _formatted_plan(weighted_sample(df, "doc_id", "r"))
    assert "Exchange" not in plan, plan
    assert "Filter" in plan, plan
