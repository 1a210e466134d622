#!/usr/bin/env python3
"""spark-submit entrypoint: corpus-hygiene audit over an
extracted-documents table.

One job runs the hygiene tier added in SURVEY §2.10 X100–X104 —
staged dedup cascade (exact md5, then containment over survivors),
fuzzy benchmark decontamination (fractional 3-gram leakage per eval
entry), and the ingest-drift gate against an optional reference
batch — and writes three parquet reports plus a one-row JSON summary.
Every stage is the oracle-checked operator from
`docling_serve_spark/operators/`; this file is only the plumbing.

Usage:
  spark-submit --py-files dist/docling_serve_spark.zip jobs/hygiene.py \
      --input /warehouse/documents --output /warehouse/hygiene \
      --benchmark /warehouse/eval_suite --reference /warehouse/last_batch
  python jobs/hygiene.py --input /root/testdata/sf0.01/documents.parquet \
      --output /tmp/hygiene
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
                    help="documents table (parquet path) with doc_id + text")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--benchmark", default=None,
                    help="parquet of eval-suite entries (bench_id + text); "
                         "omit to skip the decontamination report")
    ap.add_argument("--reference", default=None,
                    help="parquet of the incumbent batch to drift against; "
                         "omit to skip the drift report")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--containment-bp", type=int, default=8000)
    ap.add_argument("--leak-bp", type=int, default=5000)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from docling_serve_spark.operators.corpus import batch_drift
    from docling_serve_spark.operators.decontam import contamination_ratio
    from docling_serve_spark.operators.dedup import dedup_cascade
    from docling_serve_spark.session import get_spark

    spark = get_spark(master=args.master or os.environ.get("SPARK_MASTER"))
    docs = spark.read.parquet(args.input)

    verdicts = dedup_cascade(docs, text_col=args.text_col,
                             containment_bp=args.containment_bp)
    verdicts.write.mode("overwrite").parquet(
        os.path.join(args.output, "dedup")
    )
    stage_counts = {
        r["stage"]: r["n"]
        for r in spark.read.parquet(os.path.join(args.output, "dedup"))
        .groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    summary: dict = {
        "n_docs": docs.count(),
        "n_kept": stage_counts.get("kept", 0),
        "n_exact_dups": stage_counts.get("exact", 0),
        "n_containment_dups": stage_counts.get("containment", 0),
    }

    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        if "bench_id" not in bench.columns:
            bench = bench.select(
                F.monotonically_increasing_id().alias("bench_id"),
                F.col(args.text_col),
            )
        flags = contamination_ratio(docs, bench, text_col=args.text_col,
                                    bench_text_col=args.text_col,
                                    threshold_bp=args.leak_bp)
        flags.write.mode("overwrite").parquet(
            os.path.join(args.output, "decontam")
        )
        summary["n_contaminated"] = (
            spark.read.parquet(os.path.join(args.output, "decontam"))
            .filter("contaminated").count()
        )

    if args.reference:
        ref = spark.read.parquet(args.reference)
        drift = batch_drift(ref, docs, text_col=args.text_col)
        drift.write.mode("overwrite").parquet(
            os.path.join(args.output, "drift")
        )
        summary["tv_total_bp"] = (
            spark.read.parquet(os.path.join(args.output, "drift"))
            .select("tv_total_bp").first()["tv_total_bp"]
        )

    with open(os.path.join(args.output, "summary.json"), "w") as fh:
        json.dump(summary, fh)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
