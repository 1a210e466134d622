#!/usr/bin/env python3
"""spark-submit entrypoint: parallel-corpus (bitext) mining over a
crawled pages table — the CCAligned shape (El-Kishky et al., EMNLP
2020) as one job.

Three oracle-checked operators compose: URL-pattern candidate pairs
(X139 — same host, path differing only by a language segment), a
text join that attaches both sides' extracted text, and alignment
plausibility scoring (X63 — length band + numeral-set Jaccard). The
output is the candidate table, the plausible subset (the rows a
sentence aligner would be pointed at), and counters. Page text joins
by url twice — both joins equi-keyed, candidates are langs²-bounded
per (host, path_key), so nothing here is pages×pages. This file is
only the plumbing.

Usage:
  spark-submit --py-files dist/docling_serve_spark.zip jobs/bitext.py \
      --input /warehouse/pages --output /warehouse/bitext
  python jobs/bitext.py --input /tmp/pages.parquet --output /tmp/bt
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
                    help="pages table (parquet) with url + text columns")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--min-num-jaccard-bp", type=int, default=5000)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from docling_serve_spark.operators.bitext import (
        bitext_align_scores, bitext_url_pairs,
    )
    from docling_serve_spark.session import get_spark

    spark = get_spark(master=args.master)
    pages = spark.read.parquet(args.input)

    cands = bitext_url_pairs(pages)
    texts = pages.select("url", F.col("text").alias("t"))
    paired = (
        cands
        .join(texts.withColumnRenamed("url", "url_a")
                   .withColumnRenamed("t", "text_a"), "url_a")
        .join(texts.withColumnRenamed("url", "url_b")
                   .withColumnRenamed("t", "text_b"), "url_b")
    )
    scored = bitext_align_scores(
        paired, min_num_jaccard_bp=args.min_num_jaccard_bp
    ).drop("text_a", "text_b")
    scored.write.mode("overwrite").parquet(
        os.path.join(args.output, "candidates")
    )

    cand_r = spark.read.parquet(os.path.join(args.output, "candidates"))
    cand_r.filter("plausible").write.mode("overwrite").parquet(
        os.path.join(args.output, "plausible")
    )

    n_cand = cand_r.count()
    n_plaus = spark.read.parquet(
        os.path.join(args.output, "plausible")
    ).count()
    by_pair = {
        f"{r['lang_a']}-{r['lang_b']}": r["n"]
        for r in cand_r.filter("plausible")
        .groupBy("lang_a", "lang_b").agg(F.count("*").alias("n"))
        .collect()
    }
    summary = {
        "n_candidates": n_cand,
        "n_plausible": n_plaus,
        "plausible_bp": (10000 * n_plaus) // max(n_cand, 1),
        "by_lang_pair": by_pair,
    }
    with open(os.path.join(args.output, "summary.json"), "w") as fh:
        json.dump(summary, fh)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
