#!/usr/bin/env python
"""Measurement-only corpus scaler (optimization guide §1: measure at the
driver's scale).

The driver's round-end bench escalated to sf=1.0 (BENCH_r07.json:
"sf_escalated_from": 0.1) using a driver-generated dataset that does not
survive the round boundary, so re-measuring heavy queries at that scale
needs a stand-in. This tool synthesizes sf-N tables into a SEPARATE
directory (default /root/sfbig/sfN) with the same schemas and the same
measured distributions as the provided /root/testdata/sf0.1 (vocab-31
word texts, ~4.5% near-dup "+ dup" suffix copies, unit 64-d embeddings
with 10 labels, 5-type events, TPC-H-ish star tables at 10x row
counts). Numbers from it are for RELATIVE before/after comparison only —
it is NOT the driver's data and never replaces /root/testdata (which
stays read-only per TESTDATA.md).

Usage: python tools/gen_scale_corpus.py [--sf 1.0] [--out /root/sfbig]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

VOCAB = [
    "join", "small", "table", "data", "vector", "stream", "value", "column",
    "filter", "batch", "order", "customer", "sort", "part", "window", "line",
    "scan", "dup", "fast", "query", "index", "merge", "group", "shuffle",
    "cache", "spark", "plan", "row", "key", "hash", "agg",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.412, 0.15, 0.149, 0.148, 0.141]


def gen_documents(rng: np.random.Generator, n: int):
    import pandas as pd

    texts: list[str] = []
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    n_words = rng.integers(8, 102, size=n)
    dup_of = np.full(n, -1)
    # ~4.3% of docs are a near-copy of a random earlier doc (+" dup")
    dup_mask = rng.random(n) < 0.045
    for i in range(n):
        if dup_mask[i] and i > 10:
            j = int(rng.integers(0, i))
            dup_of[i] = j
            texts.append(texts[j] + " dup")
        else:
            idx = rng.integers(0, len(VOCAB), size=n_words[i])
            texts.append(" ".join(VOCAB[k] for k in idx))
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": ["src%d" % (i % 20) for i in range(n)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def gen_embeddings(rng: np.random.Generator, n: int):
    import pandas as pd

    V = rng.standard_normal((n, 64)).astype(np.float32)
    labels = rng.integers(0, 10, size=n)
    # ~1.5% planted near-dups of an earlier vec with the same label
    for i in range(20, n):
        if rng.random() < 0.015:
            j = int(rng.integers(0, i))
            V[i] = V[j] + 0.05 * rng.standard_normal(64).astype(np.float32)
            labels[i] = labels[j]
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(V.astype(np.float32)),
        "label": labels.astype(np.int32),
    })


def gen_events(rng: np.random.Generator, n: int, n_users: int):
    import pandas as pd

    t0 = np.datetime64("2024-01-01T00:00:00")
    ts = t0 + (rng.random(n) * 30 * 86400 * 1e6).astype("timedelta64[us]")
    ts.sort()
    types = rng.choice(["signup", "purchase", "view", "click", "error"], n)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
        "event_type": types,
        "value": np.round(rng.random(n) * 560, 2),
        "props": ['{"k": %d}' % k for k in rng.integers(0, 100, size=n)],
    })


def gen_tpch(rng: np.random.Generator, sf: float):
    import pandas as pd

    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    days = np.datetime64("1992-01-01") + rng.integers(
        0, 3650, size=n_li).astype("timedelta64[D]")
    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, n_ord, size=n_li).astype(np.int64),
        "l_partkey": rng.integers(0, n_part, size=n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, size=n_li).astype(np.int64),
        "l_linenumber": rng.integers(1, 8, size=n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, size=n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.random(n_li) * 100000 + 900, 2),
        "l_discount": np.round(rng.integers(0, 11, size=n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, size=n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["N", "A", "R"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": days,
    })
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, size=n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(["O", "F", "P"], n_ord),
        "o_totalprice": np.round(rng.random(n_ord) * 500000, 2),
        "o_orderdate": np.datetime64("1992-01-01") + rng.integers(
            0, 3650, size=n_ord).astype("timedelta64[D]"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW", "5-NONE"], n_ord),
    })
    cust = pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": ["Customer#%09d" % i for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, size=n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.random(n_cust) * 10000 - 1000, 2),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
            n_cust),
    })
    supp = pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": ["Supplier#%09d" % i for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, size=n_supp).astype(np.int32),
    })
    part = pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": ["part %d" % i for i in range(n_part)],
        "p_retailprice": np.round(rng.random(n_part) * 2000, 2),
    })
    nation = pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": ["NATION_%02d" % i for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    })
    region = pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": ["REGION_%d" % i for i in range(5)],
    })
    return {
        "lineitem": li, "orders": orders, "customer": cust,
        "supplier": supp, "part": part, "nation": nation, "region": region,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/root/sfbig")
    args = ap.parse_args()
    sf = args.sf
    out = os.path.join(args.out, f"sf{sf:g}")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    def write(name, pdf):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(out, f"{name}.parquet"))
        print(name, len(pdf))

    write("documents", gen_documents(rng, int(50_000 * sf)))
    write("embeddings", gen_embeddings(rng, int(20_000 * sf)))
    write("events", gen_events(rng, int(1_000_000 * sf),
                               int(15_000 * sf)))
    for name, pdf in gen_tpch(rng, sf).items():
        write(name, pdf)
    print("wrote", out)


if __name__ == "__main__":
    main()
