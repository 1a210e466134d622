#!/usr/bin/env python3
"""spark-submit entrypoint: ingest-compliance report over a pages
table (and optionally the hosts' robots.txt bodies).

One job runs the opt-out/consent tier from SURVEY §2.10 — per-host
publication health (noindex / parked, X44/X51/X73), declared-license
signals (X156), and — when robots bodies are provided — the AI-crawler
opt-out audit (X165) with its token-mass impact (X168) — and writes
one parquet report per signal family plus a one-row JSON summary.
Every stage is the oracle-checked operator from
`docling_serve_spark/operators/`; this file is only the plumbing.

Usage:
  spark-submit --py-files dist/docling_serve_spark.zip jobs/compliance.py \
      --pages /warehouse/pages --output /warehouse/compliance \
      --robots /warehouse/robots
  python jobs/compliance.py --pages /tmp/pages.parquet --output /tmp/comp
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
                    help="pages parquet with url + html (text optional, "
                         "used for token-mass weighting when present)")
    ap.add_argument("--robots", default=None,
                    help="parquet of (host, body) robots.txt fetches; "
                         "omit to skip the AI opt-out sections")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from docling_serve_spark.operators.pagemeta import (
        host_health, license_signal_stats,
    )
    from docling_serve_spark.operators.textstats import token_count
    from docling_serve_spark.operators.urltools import (
        ai_optout, optout_impact, url_host,
    )
    from docling_serve_spark.session import get_spark

    spark = get_spark(master=args.master or os.environ.get("SPARK_MASTER"))
    pages = spark.read.parquet(args.pages)

    health = host_health(pages)
    health.write.mode("overwrite").parquet(os.path.join(args.output, "health"))
    licenses = license_signal_stats(pages)
    licenses.write.mode("overwrite").parquet(
        os.path.join(args.output, "licenses")
    )

    health_r = spark.read.parquet(os.path.join(args.output, "health"))
    lic_r = spark.read.parquet(os.path.join(args.output, "licenses"))
    summary: dict = {
        "n_hosts": health_r.count(),
        "n_hosts_mostly_noindex":
            health_r.filter("noindex_bp >= 5000").count(),
        "n_hosts_open_license":
            lic_r.filter("open_bp >= 5000").count(),
        "n_hosts_restrictive":
            lic_r.filter("n_restrictive > n_open").count(),
    }

    if args.robots:
        robots = spark.read.parquet(args.robots)
        audit = ai_optout(robots)
        audit.write.mode("overwrite").parquet(
            os.path.join(args.output, "ai_optout")
        )
        # token mass per host: real token counts when the pages carry
        # extracted text, page counts otherwise (a documented proxy —
        # the impact report is then host-weighted, not token-weighted)
        mass_col = (
            token_count(F.col("text")) if "text" in pages.columns
            else F.lit(1).cast("bigint")
        )
        host_tokens = pages.select(
            url_host(F.col("url")).alias("host"), mass_col.alias("__t")
        ).groupBy("host").agg(F.sum("__t").cast("bigint").alias("n_tokens"))
        impact = optout_impact(
            spark.read.parquet(os.path.join(args.output, "ai_optout")),
            host_tokens,
        )
        impact.write.mode("overwrite").parquet(
            os.path.join(args.output, "optout_impact")
        )
        imp_r = spark.read.parquet(os.path.join(args.output, "optout_impact"))
        summary["token_weighted"] = "text" in pages.columns
        summary["max_optout_share_bp"] = (
            imp_r.agg(F.max("token_share_bp")).first()[0] or 0
        )
        summary["agents_with_optouts"] = (
            imp_r.filter("n_hosts_blocked > 0").count()
        )

    with open(os.path.join(args.output, "summary.json"), "w") as fh:
        json.dump(summary, fh)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
