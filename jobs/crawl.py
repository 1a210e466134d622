#!/usr/bin/env python3
"""spark-submit entrypoint: crawl-planning over two warehouse
snapshots.

One job runs the recrawl decision chain — snapshot diff (X26), robots
compliance with RFC 9309 wildcards (X38), host PageRank over the new
snapshot's outlinks (X39/X40), frontier selection (X43), politeness
fetch scheduling (X53), and the sitemap lastmod staleness report
(X111) — and writes the fetch schedule plus diagnostic reports. Every
stage is the oracle-checked operator from
`docling_serve_spark/operators/`; this file is only the plumbing.

Usage:
  spark-submit --py-files dist/docling_serve_spark.zip jobs/crawl.py \
      --prev /warehouse/snap_2024_01 --pages /warehouse/snap_2024_02 \
      --output /warehouse/crawl_plan \
      --robots /warehouse/robots_rules --delays /warehouse/crawl_delays
  python jobs/crawl.py --prev /tmp/old.parquet --pages /tmp/new.parquet \
      --output /tmp/plan
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True,
                    help="NEW snapshot parquet (url, html, text, ...)")
    ap.add_argument("--prev", default=None,
                    help="previous snapshot parquet; omit to treat every "
                         "page as newly added")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--robots", default=None,
                    help="parquet of (host, rule, path_prefix) directives; "
                         "omit to allow everything")
    ap.add_argument("--delays", default=None,
                    help="parquet of (host, delay_ms) crawl-delay overrides")
    ap.add_argument("--batch-size", type=int, default=10000)
    ap.add_argument("--per-host-cap", type=int, default=16)
    ap.add_argument("--n-fetchers", type=int, default=64)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from docling_serve_spark.operators.dedup import norm_text
    from docling_serve_spark.operators.frontier import (
        frontier_select,
        schedule_fetches,
    )
    from docling_serve_spark.operators.relational import snapshot_diff
    from docling_serve_spark.operators.urltools import (
        robots_filter,
        sitemap_staleness,
        url_host,
    )
    from docling_serve_spark.operators.webgraph import (
        extract_outlinks,
        host_pagerank,
    )
    from docling_serve_spark.session import get_spark

    spark = get_spark(master=args.master or os.environ.get("SPARK_MASTER"))
    pages = spark.read.parquet(args.pages)
    fingered = pages.select(
        "url", F.md5(norm_text(F.col("text"))).alias("fingerprint")
    )
    if args.prev:
        prev = spark.read.parquet(args.prev).select(
            "url", F.md5(norm_text(F.col("text"))).alias("fingerprint")
        )
        diff = snapshot_diff(prev, fingered)
    else:
        diff = fingered.select(
            "url", F.lit("added").alias("status"),
            F.lit(None).cast("string").alias("old_fp"),
            F.col("fingerprint").alias("new_fp"),
        )

    keyed = diff.select(
        F.monotonically_increasing_id().alias("doc_id"), "url", "status"
    )
    if args.robots:
        rules = spark.read.parquet(args.robots)
        verdicts = robots_filter(keyed, rules).select(
            "doc_id", "crawl_allowed"
        )
        candidates = keyed.join(verdicts, "doc_id").select(
            "url", url_host(F.col("url")).alias("host"), "status",
            "crawl_allowed",
        )
    else:
        candidates = keyed.select(
            "url", url_host(F.col("url")).alias("host"), "status",
            F.lit(True).alias("crawl_allowed"),
        )

    edges = extract_outlinks(pages).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    ranks = host_pagerank(edges, iterations=3)
    batch = frontier_select(candidates, ranks,
                            batch_size=args.batch_size,
                            per_host_cap=args.per_host_cap)
    delays = (
        spark.read.parquet(args.delays) if args.delays
        else spark.createDataFrame([], "host string, delay_ms bigint")
    )
    schedule = schedule_fetches(batch, n_fetchers=args.n_fetchers,
                                delays=delays)
    schedule.write.mode("overwrite").parquet(
        os.path.join(args.output, "schedule")
    )
    if "warc_ts" in pages.columns:
        # sitemap lastmod vs crawl-timestamp report needs fetch times
        staleness = sitemap_staleness(pages, pages)
        staleness.write.mode("overwrite").parquet(
            os.path.join(args.output, "staleness")
        )

    sched = spark.read.parquet(os.path.join(args.output, "schedule"))
    summary = {
        "n_candidates": candidates.count(),
        "n_allowed": candidates.filter("crawl_allowed").count(),
        "n_scheduled": sched.count(),
        "n_hosts": sched.select("host").distinct().count(),
        "n_fetchers_used": sched.select("fetcher").distinct().count(),
        "status_counts": {
            r["status"]: r["n"]
            for r in candidates.groupBy("status")
            .agg(F.count("*").alias("n")).collect()
        },
    }
    with open(os.path.join(args.output, "summary.json"), "w") as fh:
        json.dump(summary, fh)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
