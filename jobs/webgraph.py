#!/usr/bin/env python3
"""spark-submit entrypoint: the webgraph family over a crawled pages
table.

One pass over raw page bytes feeds four oracle-checked operators —
host-level outlink edges (X40), damped integer-exact PageRank (X39),
link-farm reciprocity flags (X47), and inbound anchor-text top-k
(X41) — and writes each as a parquet table. The html column is read
once per regexp family; everything that shuffles is host/anchor
strings, never page bytes. This file is only the plumbing.

Usage:
  spark-submit --py-files dist/docling_serve_spark.zip jobs/webgraph.py \
      --input /warehouse/pages --output /warehouse/webgraph \
      --iterations 3 --anchor-k 3
  python jobs/webgraph.py --input /tmp/pages.parquet --output /tmp/wg
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="pages table (parquet path) with url + html")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--iterations", type=int, default=3,
                    help="PageRank power-iteration rounds")
    ap.add_argument("--anchor-k", type=int, default=3,
                    help="anchor strings kept per target host")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from docling_serve_spark.operators import webgraph
    from docling_serve_spark.session import get_spark

    spark = get_spark(master=args.master)
    pages = spark.read.parquet(args.input)

    edges = webgraph.extract_outlinks(pages)
    # the edge list is the shared upstream of rank + farm analysis:
    # persist it to parquet first and reread, so PageRank's k rounds
    # and the reciprocity join re-scan a host-pair table, not the
    # page bytes
    edges_path = os.path.join(args.output, "edges")
    edges.write.mode("overwrite").parquet(edges_path)
    e = spark.read.parquet(edges_path).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )

    ranks = webgraph.host_pagerank(e, iterations=args.iterations)
    ranks.write.mode("overwrite").parquet(os.path.join(args.output, "ranks"))

    farms = webgraph.reciprocal_link_stats(e)
    farms.write.mode("overwrite").parquet(os.path.join(args.output, "farms"))

    anchors = webgraph.extract_anchor_texts(pages, k=args.anchor_k)
    anchors.write.mode("overwrite").parquet(
        os.path.join(args.output, "anchors")
    )

    ranks_r = spark.read.parquet(os.path.join(args.output, "ranks"))
    top = ranks_r.orderBy(F.col("rank_nano").desc(), "host").first()
    summary = {
        "n_edges": spark.read.parquet(edges_path).count(),
        "n_hosts": ranks_r.count(),
        "top_host": top["host"] if top else None,
        "top_rank_nano": top["rank_nano"] if top else None,
        "n_farm_hosts": spark.read.parquet(
            os.path.join(args.output, "farms")
        ).filter("is_farm").count(),
        "n_anchor_rows": spark.read.parquet(
            os.path.join(args.output, "anchors")
        ).count(),
    }
    with open(os.path.join(args.output, "summary.json"), "w") as fh:
        json.dump(summary, fh)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
