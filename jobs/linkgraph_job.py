#!/usr/bin/env python
"""Cluster entrypoint for the link-graph tier: pages in, host graph +
centrality out — the host-reputation side-channel the curation tier
joins against (weburl.host_stats carries the content signals; this job
carries the graph signals).

    spark-submit --py-files dist/ragflow_spark.zip jobs/linkgraph_job.py \
        --input  <pages parquet: url + html(binary|string)> \
        --output <dir: edges/ degrees/ ranks/ written beneath> \
        [--url-col url] [--html-col html] [--iterations 3]
        [--anchors]   also write anchors/ (href + cleaned anchor text)

Outputs (all parquet):
- edges/    (src_host, dst_host, weight) — one aggregation shuffle
- degrees/  (host, out_w, in_w)
- ranks/    (host, rank_u) — fixed-point PageRank in nano-units of
  total mass 1e9; deterministic for a given graph regardless of
  partitioning (BIGINT floor arithmetic, order-free sums)
- anchors/  (src_url, href, text) when --anchors is given

Build the zip with: python tools/package.py
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--html-col", default="html")
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--anchors", action="store_true")
    ap.add_argument("--skip-nofollow", action="store_true",
                    help="drop anchors whose rel carries nofollow/ugc/"
                         "sponsored (rank-pipeline endorsement edges "
                         "only); default keeps every edge (frontier "
                         "semantics)")
    ap.add_argument("--frontier", action="store_true",
                    help="also write <output>/frontier: canonical dst "
                         "URLs the corpus does not yet contain, with "
                         "citation-count priority signals (the crawl "
                         "loop's next fetch list)")
    ap.add_argument("--frontier-max-per-host", type=int, default=None,
                    help="politeness cap: at most N frontier URLs per "
                         "host (top-cited first)")
    ap.add_argument("--robots-agent", default=None,
                    help="with --frontier: parse the corpus's robots.txt "
                         "documents and keep only frontier URLs this "
                         "agent may fetch (RFC 9309 longest-match; "
                         "use '*' for the generic crawler)")
    ap.add_argument("--sitemaps", action="store_true",
                    help="also write <output>/sitemap_urls: <loc> "
                         "harvest from sitemap/sitemapindex documents "
                         "in the corpus (the other frontier seed)")
    args = ap.parse_args()

    from ragflow_spark.operators import linkgraph as lg
    from ragflow_spark.session import get_spark

    spark = get_spark(app_name="ragflow_spark_linkgraph")
    pages = spark.read.parquet(args.input)

    outlinks = lg.extract_outlinks(pages, args.url_col, args.html_col,
                                   skip_nofollow=args.skip_nofollow)
    edges = lg.host_edges(outlinks)
    edges.write.mode("overwrite").parquet(
        os.path.join(args.output, "edges"))
    # reread so degree/rank iterate over the materialized (tiny) edge
    # table instead of re-scanning the page corpus per iteration
    edges = spark.read.parquet(os.path.join(args.output, "edges"))

    lg.degree_stats(edges).write.mode("overwrite").parquet(
        os.path.join(args.output, "degrees"))
    lg.pagerank(edges, iterations=args.iterations).write.mode(
        "overwrite").parquet(os.path.join(args.output, "ranks"))

    if args.anchors:
        lg.extract_anchor_texts(
            pages, args.url_col, args.html_col
        ).write.mode("overwrite").parquet(
            os.path.join(args.output, "anchors"))
    if args.frontier:
        frontier = lg.frontier_urls(
            outlinks, pages, args.url_col,
            max_per_host=args.frontier_max_per_host,
        )
        if args.robots_agent:
            from ragflow_spark.operators import robots

            frontier = robots.frontier_allowed(
                frontier,
                robots.parse_robots(pages, args.url_col, args.html_col),
                agent=args.robots_agent,
            )
        frontier.write.mode("overwrite").parquet(
            os.path.join(args.output, "frontier"))
    if args.sitemaps:
        from pyspark.sql import functions as F

        from ragflow_spark.operators import robots
        from ragflow_spark.operators.weburl import canonical_url

        locs = lg.extract_sitemap_urls(pages, args.url_col, args.html_col)
        # robots.txt Sitemap: lines are the other seed source — union
        # them in as nested-sitemap refs under their robots url
        seeds = (
            robots.robots_metadata(pages, args.url_col, args.html_col)
            .where(F.col("sitemap_url").isNotNull())
            .select(
                F.concat(F.lit("https://"), F.col("host"),
                         F.lit("/robots.txt")).alias("src_url"),
                canonical_url(F.col("sitemap_url")).alias("dst_url"),
                F.lit(1).alias("is_nested_sitemap"),
            )
        )
        locs.unionByName(seeds).write.mode("overwrite").parquet(
            os.path.join(args.output, "sitemap_urls"))
    spark.stop()


if __name__ == "__main__":
    main()
