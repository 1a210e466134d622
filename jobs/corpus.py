#!/usr/bin/env python3
"""spark-submit entrypoint: training-mixture construction over an
extracted-documents table.

One job runs the full post-extraction corpus pipeline — filter chain
(length / Gopher repetition / quality gates), exact-dedup winner
selection, benchmark decontamination, deterministic domain-mix
sampling, and sequence packing — and writes the packed assignment
table plus a one-row attrition funnel. Every stage is the
oracle-checked operator from `docling_serve_spark/operators/`; this
file is only the plumbing.

Usage:
  spark-submit --py-files dist/docling_serve_spark.zip jobs/corpus.py \
      --input /warehouse/documents --output /warehouse/mixture \
      --benchmark /warehouse/eval_suite \
      --rates-json mixture.json --host-col source
  python jobs/corpus.py --input /root/testdata/sf0.01/documents.parquet \
      --output /tmp/mix

The keep decision is a pure function of doc_id (Knuth multiplicative
hash vs ppm rate), so re-running the job over a grown corpus keeps
every previously kept document — incremental crawls never reshuffle
the mixture.
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
                    help="parquet of eval-suite passages (text column); "
                         "omit to skip the decontamination gate")
    ap.add_argument("--rates-json", default=None,
                    help="JSON file {host: keep_ppm}; omit to keep every "
                         "host at ppm=1000000")
    ap.add_argument("--host-col", default="source",
                    help="column used as the mixture domain key")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--n-shards", type=int, default=256)
    ap.add_argument("--k", type=int, default=6,
                    help="decontamination n-gram size")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from docling_serve_spark.operators import corpus
    from docling_serve_spark.session import get_spark

    spark = get_spark(master=args.master)
    docs = spark.read.parquet(args.input)

    hosts = docs.select("doc_id", F.col(args.host_col).alias("host"))
    if args.rates_json:
        with open(args.rates_json) as fh:
            spec = [(h, int(p)) for h, p in json.load(fh).items()]
        rates = spark.createDataFrame(spec, "host string, keep_ppm long")
    else:
        rates = hosts.select("host").distinct().select(
            "host", F.lit(1000000).cast("long").alias("keep_ppm")
        )
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark).select(args.text_col)
    else:
        # empty benchmark: the decontamination gate passes everything
        bench = spark.createDataFrame([], f"{args.text_col} string")

    packed = corpus.build_training_mixture(
        docs, bench, hosts, rates,
        text_col=args.text_col, k=args.k,
        seq_len=args.seq_len, n_shards=args.n_shards,
    )
    packed.write.mode("overwrite").parquet(
        os.path.join(args.output, "packed")
    )

    funnel = corpus.mixture_funnel(
        docs, bench, hosts, rates, text_col=args.text_col, k=args.k
    ).first().asDict()
    with open(os.path.join(args.output, "funnel.json"), "w") as fh:
        json.dump(funnel, fh)
    print(json.dumps(funnel))


if __name__ == "__main__":
    main()
