"""Link-graph tier scale smoke: anchor harvest -> host edges -> degree
stats -> 3-iteration fixed-point PageRank, end-to-end on a 1M-page
corpus with a 200k-host graph.

Corpus: pages synthesized natively from spark.range (no Python row
path) — each page carries one absolute, one protocol-relative and one
root-relative (self-host) anchor over H=200,000 hosts, every 10th page
links a sink host that never links out (dangling mass), and every 100th
page links one global hub host (hot-destination skew: the hub's
in-degree is ~10k while the median host sees ~15 — the contrib
aggregation must absorb this map-side).

Prints one JSON line and rewrites the '## Link-graph smoke' section of
BENCH/BASELINE.md (other sections preserved — keep manual notes under
their own ## headers).

Usage: python tools/linkgraph_smoke.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

H = 200_000


def build_pages(spark, n_docs: int, parallelism: int):
    d = F.col("id")
    return spark.range(0, n_docs, 1, parallelism).select(
        F.format_string(
            "https://h%d.example.com/dir/page%d.html", (d * 7) % H, d
        ).alias("url"),
        F.concat(
            F.lit('<html><body><p>t</p><a href="https://h'),
            ((d * 13 + 1) % H).cast("string"),
            F.format_string('.example.com/p%d">a</a>', d % 7),
            F.lit("<a href='//h"),
            ((d * 13 + 2) % H).cast("string"),
            F.lit(".example.com/q'>b</a>"),
            F.format_string('<a href="/local/%d">c</a>', d % 5),
            F.when(
                d % 10 == 0,
                F.lit('<a href="https://sink.example.com/s">s</a>'),
            ).otherwise(F.lit("")),
            F.when(
                d % 100 == 0,
                F.lit('<a href="https://hub.example.com/h">h</a>'),
            ).otherwise(F.lit("")),
            F.lit('<a href="javascript:void(0)">j</a>'
                  '<a href="#f">f</a></body></html>'),
        ).alias("html"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from ragflow_spark.operators import linkgraph as lg
    from ragflow_spark.session import get_spark

    spark = get_spark(app_name="linkgraph_smoke", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    spark.sparkContext.setLogLevel("ERROR")

    pages = build_pages(spark, n_docs, 4 * cores)
    pages.count()  # warm scan/JIT before timing

    result: dict = {"n_docs": n_docs, "cores": cores, "hosts": H}

    t0 = time.perf_counter()
    outlinks = lg.extract_outlinks(pages)
    result["outlink_rows"] = outlinks.count()
    result["harvest_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    edges = lg.host_edges(lg.extract_outlinks(pages)).persist()
    result["edge_rows"] = edges.count()
    result["edges_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    deg = lg.degree_stats(edges)
    hub = deg.filter(F.col("host") == "hub.example.com").first()
    result["degree_rows"] = deg.count()
    result["hub_in_w"] = int(hub["in_w"]) if hub else 0
    result["degree_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    r = lg.pagerank(edges, iterations=3)
    tot = r.agg(F.sum("rank_u").alias("s"),
                F.count(F.lit(1)).alias("n")).first()
    top = {row["host"]: row["rank_u"]
           for row in r.orderBy(F.desc("rank_u")).limit(3).collect()}
    result["rank_rows"] = int(tot["n"])
    result["rank_mass"] = int(tot["s"])
    result["rank_top"] = top
    result["pagerank_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    from ragflow_spark.operators.weburl import canonical_url

    frontier = lg.frontier_urls(outlinks, pages).persist()
    result["frontier_rows"] = frontier.count()
    result["frontier_sec"] = round(time.perf_counter() - t0, 2)
    # exactness: the anti-join admitted nothing the corpus already has
    overlap = frontier.join(
        pages.select(canonical_url(F.col("url")).alias("dst_url")),
        "dst_url",
    ).count()
    assert overlap == 0, overlap
    frontier.unpersist()

    edges.unpersist()
    result["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    print(json.dumps(result))

    rate = lambda s: f"{n_docs / s:,.0f}"  # noqa: E731
    md = f"""## Link-graph smoke ({n_docs:,} pages, {H:,} hosts, local[{cores}])

Native-synthesized anchor corpus: 3-4 anchors/page, a dangling sink
(every 10th page) and a hub host with ~{result['hub_in_w']:,} in-weight
(every 100th page) for hot-destination skew. Measured {result['ts']}:

| stage | wall sec | pages/s | output |
|---|---|---|---|
| extract_outlinks (regexp harvest + resolve + canon) | {result['harvest_sec']} | {rate(result['harvest_sec'])} | {result['outlink_rows']:,} anchors |
| host_edges (single shuffle, map-side combine) | {result['edges_sec']} | {rate(result['edges_sec'])} | {result['edge_rows']:,} edges |
| degree_stats | {result['degree_sec']} | {rate(result['degree_sec'])} | {result['degree_rows']:,} hosts |
| pagerank x3 iterations (BIGINT nano-units) | {result['pagerank_sec']} | {rate(result['pagerank_sec'])} | mass {result['rank_mass']:,}/1e9; top: {', '.join(f'{k}={v}' for k, v in result['rank_top'].items())} |
| frontier_urls (agg-first + anti-join vs corpus) | {result['frontier_sec']} | {rate(result['frontier_sec'])} | {result['frontier_rows']:,} new URLs; corpus overlap 0 (asserted) |

100 TB shapes: the harvest is one whole-stage-codegen projection (no
Python, no shuffle); host_edges is the exact-dedup shuffle shape; each
pagerank iteration is one src-join + one dst-aggregation with one
dangling scalar to the driver, localCheckpoint per round — the hub's
fan-in lands on sum(), which partial-aggregates map-side, so the skew
never concentrates a shuffle partition. Rank mass stays within floor
loss of 1e9 (conservation audit above).
"""
    out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(out_md):
        prev = open(out_md).read()
        marker = "## Link-graph smoke"
        if marker in prev:
            pat = re.compile(r"## Link-graph smoke.*?(?=\n## |\Z)", re.S)
            nxt = pat.sub(md.rstrip() + "\n", prev)
        else:
            nxt = prev.rstrip() + "\n\n" + md
        with open(out_md, "w") as f:
            f.write(nxt)


if __name__ == "__main__":
    main()
