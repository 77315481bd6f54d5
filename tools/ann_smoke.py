"""ANN scale smoke: 1M deterministic vectors (dim 64), compare the three
search paths — brute cosine top-k, IVF (nprobe subset), PQ ADC — on wall
time and recall@10 vs the brute ground truth. Rewrites the
'## ANN scale smoke' section of BENCH/BASELINE.md.

Usage: python tools/ann_smoke.py [n_vecs] [cores]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_vectors(spark, n: int, path: str, parallelism: int) -> None:
    import pandas as pd

    def gen(batches):
        import numpy as np

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # per-row deterministic vectors: seed from id block
            rows = []
            for i in ids:
                rng = np.random.RandomState(900_000 + int(i) % 65536)
                # correlated clusters: base pattern from id%256 + noise
                base = np.sin(np.arange(64) * (1 + int(i) % 256) * 0.1)
                noise = rng.randn(64) * 0.3
                rows.append((base + noise).astype("float32"))
            yield pd.DataFrame({
                "vec_id": ids.astype("int64"),
                "embedding": [r.tolist() for r in rows],
            })

    (spark.range(0, n, 1, parallelism)
     .mapInPandas(gen, schema="vec_id long, embedding array<float>")
     .write.mode("overwrite").parquet(path))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from ragflow_spark.operators import similarity
    from ragflow_spark.session import get_spark

    spark = get_spark(app_name="ann_smoke", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores,
                      # 32 threads × array-heavy join buffers: the 8g default heap is
                      # borderline at 1M docs (observed GCLocker OOM in the verify join)
                      extra_conf={"spark.driver.memory": "32g"})
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(REPO, ".cache", f"vectors_{n}.parquet")
    if not os.path.exists(path):
        build_vectors(spark, n, path, parallelism=4 * cores)
    e = spark.read.parquet(path)
    qv = [float(x) for x in e.filter("vec_id = 12345").first()["embedding"]]

    result = {"n_vecs": n, "cores": cores}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        result[f"{name}_sec"] = round(time.perf_counter() - t0, 2)
        return out

    brute = timed("brute", lambda: [
        r.vec_id for r in
        similarity.cosine_topk(e, "embedding", qv, k=10, id_col="vec_id").collect()
    ])
    truth = set(brute)

    cents = similarity.make_centroids_from_rows(e, "embedding", "vec_id", 64)
    def _build():
        idx = similarity.ivf_build_arrow(e, "embedding", "vec_id", cents).persist()
        idx.count()
        return idx

    indexed = timed("ivf_build", _build)
    ivf = timed("ivf_topk", lambda: [
        r.vec_id for r in
        similarity.ivf_topk(indexed, "embedding", "vec_id", cents, qv,
                            k=10, nprobe=8).collect()
    ])
    result["ivf_recall"] = len(set(ivf) & truth) / 10

    books = timed("pq_train", lambda: similarity.pq_train_codebooks(
        e, "embedding", "vec_id", m=8, k=64))

    def _encode():
        out = similarity.pq_encode_arrow(e, "embedding", "vec_id", books).persist()
        out.count()
        return out

    enc = timed("pq_encode", _encode)
    pq = timed("pq_topk", lambda: [
        r.vec_id for r in
        similarity.pq_adc_topk(enc, books, qv, topk=100).collect()
    ])
    result["pq_recall_at100"] = len(set(pq) & truth) / 10

    # composed IVF→PQ→exact-re-rank: the real billion-vector query path —
    # probe prunes the scan, ADC ranks candidates via LUT lookups, exact
    # cosine touches only the shortlist
    def _build_composed():
        out = similarity.pq_encode_arrow(
            indexed, "embedding", "vec_id", books,
            keep_cols=("cluster_id", "embedding"),
        ).persist()
        out.count()
        return out

    enc2 = timed("ivfpq_encode", _build_composed)
    comp = timed("ivfpq_topk", lambda: [
        r.vec_id for r in
        similarity.ivf_pq_topk(enc2, "embedding", "vec_id", cents, books,
                               qv, k=10, nprobe=8, rerank=100).collect()
    ])
    result["ivfpq_recall"] = len(set(comp) & truth) / 10
    enc2.unpersist()

    result["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    print(json.dumps(result))

    md = f"""## ANN scale smoke ({n:,} vectors, dim 64, local[{cores}])

Query = vector 12345; ground truth = brute cosine top-10. Measured
{result['ts']}:

| path | wall sec | recall vs brute |
|---|---|---|
| brute cosine top-10 (TakeOrderedAndProject) | {result['brute_sec']} | 1.0 (truth) |
| IVF build (arrow path, 64 centroids) | {result['ivf_build_sec']} | — |
| IVF top-10, nprobe 8/64 | {result['ivf_topk_sec']} | {result['ivf_recall']:.2f} |
| PQ train (sampled k-means, driver numpy) | {result['pq_train_sec']} | — |
| PQ encode (arrow path; m=8, k=64 → 8 codes/vec) | {result['pq_encode_sec']} | — |
| PQ ADC top-100 (contains true top-10) | {result['pq_topk_sec']} | {result['pq_recall_at100']:.2f} |
| IVF→PQ index (encode w/ cluster+vec riding) | {result['ivfpq_encode_sec']} | — |
| **IVF→PQ→exact top-10** (probe 8/64, ADC shortlist 100, exact re-rank) | {result['ivfpq_topk_sec']} | {result['ivfpq_recall']:.2f} |

IVF probes 1/8 of the table at query time; PQ shrinks 256 B vectors to
4 codes and scores with table lookups — the candidate-generation tier a
billion-vector setup re-ranks with exact distances. The composed row IS
that architecture end-to-end: prune → LUT-rank → exact on ≤100 rows.

Honest reading of the composed wall: at 1M vectors the composed query
does not necessarily beat standalone IVF — recall is already 1.0 for
every path here, and the extra ADC + re-rank stages cost more than they
save while 1/8 of 1M vectors still fits in page cache. The composed
path's win is a BANDWIDTH win (codes are ~64× smaller than vectors), so
it materializes when the probed slice no longer fits in memory.
Cross-run caveat: these walls carry the box's ~2× day-drift and load
waves (see the round-7 canary note) — compare paths WITHIN one run, not
across runs.
"""
    out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(out_md):
        prev = open(out_md).read()
        pat = re.compile(r"## ANN scale smoke.*?(?=\n## |\Z)", re.S)
        if pat.search(prev):
            prev = pat.sub(md.rstrip() + "\n", prev, count=1)
        else:
            prev = prev.rstrip() + "\n\n" + md
        with open(out_md, "w") as f:
            f.write(prev)
        print("updated BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
