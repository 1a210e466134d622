#!/usr/bin/env python3
"""spark-submit entrypoint: the archive-interop loop — crawl pages in
(parquet or raw ``warc:`` files), extracted-results warehouse + WET
text sidecar + sorted CDX capture index out. Closes the round trip a
Common-Crawl-style consumer expects: WARC in, WET + CDX out
(SURVEY X54/X56/X58; the WET/CDX pair is exactly what CC publishes
beside each WARC segment).

Shapes, per stage:
  - CDX rides the page scan (zero shuffles) and is then total-sorted
    by (urlkey, ts14) the scalable way — range repartition +
    sortWithinPartitions — and written as CDXJ text lines
    (``urlkey ts14 {json}``).
  - Extraction is the single-pass mapInPandas stage (one scan, zero
    shuffles); results land in parquet FIRST and WET is serialized
    from the committed parquet, so a WET rewrite never recomputes
    extraction.
  - WET keeps only successful non-empty extractions (a conversion
    record with an empty payload is noise to downstream tooling).

Usage:
  spark-submit --py-files dist/docling_serve_spark.zip jobs/archive.py \
      --input warc:/crawl/segments/*.warc.gz --output /warehouse/archive
  python jobs/archive.py --input /tmp/pages.parquet --output /tmp/ar
  python jobs/archive.py --n-gen 300 --output /tmp/ar   # synthetic corpus
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", default=None,
                    help="pages source (catalog scheme: parquet path, "
                         "warc:<glob>, table:<name>)")
    ap.add_argument("--n-gen", type=int, default=0,
                    help="synthesize N pages instead of reading --input")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--cdx-partitions", type=int, default=0,
                    help="CDX output files (0 = current parallelism)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if not args.n_gen and not args.input:
        ap.error("one of --input / --n-gen is required")

    from pyspark.sql import functions as F

    from docling_serve_spark.operators.extract_stage import run_extraction
    from docling_serve_spark.operators.urltools import cdx_index
    from docling_serve_spark.session import get_spark
    from docling_serve_spark.sources.warc import wet_records

    spark = get_spark(master=args.master)
    if args.n_gen:
        from docling_serve_spark.sources.pages import build_pages_df

        pages = build_pages_df(spark, args.n_gen)
    else:
        from docling_serve_spark.sources.catalog import read_pages

        pages = read_pages(spark, args.input)

    # CDX: narrow map over the page scan, then the scalable total
    # sort (range exchange + in-partition sort, never a single-task
    # global sort), one CDXJ line per capture. Raw WARC input keeps
    # its HTTP layer: index the REAL status/mime via the captures
    # reader; a pages table (which drops HTTP) gets the literals.
    if args.input and args.input.startswith("warc:"):
        from docling_serve_spark.sources.warc import read_warc_captures

        cdx = cdx_index(
            read_warc_captures(spark, args.input[len("warc:"):]),
            mime_col="mime", status_col="http_status",
        )
    else:
        cdx = cdx_index(pages)
    if args.cdx_partitions:
        cdx = cdx.repartitionByRange(args.cdx_partitions, "urlkey", "ts14")
    else:
        cdx = cdx.repartitionByRange("urlkey", "ts14")
    cdx_lines = cdx.sortWithinPartitions("urlkey", "ts14").select(
        F.concat_ws(
            " ",
            F.col("urlkey"),
            F.col("ts14"),
            F.to_json(F.struct("url", "mime", "status", "digest", "length")),
        ).alias("value")
    )
    cdx_lines.write.mode("overwrite").text(os.path.join(args.output, "cdx"))

    # WAT: capture metadata (title, link count, digest) — the third
    # sidecar; rides its own pass over the page scan, still zero
    # shuffles
    from docling_serve_spark.sources.warc import wat_records

    wat_records(pages).select("wat_record").write.mode("overwrite").text(
        os.path.join(args.output, "wat")
    )

    # extraction: single-pass stage, committed to parquet before any
    # downstream serialization reads it
    results_path = os.path.join(args.output, "results")
    run_extraction(pages).write.mode("overwrite").parquet(results_path)
    results = spark.read.parquet(results_path)

    wet = wet_records(
        results.filter(
            (F.col("status") == "success") & (F.col("extracted_text") != "")
        )
    )
    wet.select("wet_record").write.mode("overwrite").text(
        os.path.join(args.output, "wet")
    )

    counts = {
        r["status"]: r["n"]
        for r in results.groupBy("status").agg(
            F.count("*").alias("n")
        ).collect()
    }
    summary = {
        "n_pages": sum(counts.values()),
        "n_captures": spark.read.text(
            os.path.join(args.output, "cdx")
        ).count(),
        # record headers end \r\n and read.text strips only \n,
        # so match the leading version line by prefix
        "n_wet_records": spark.read.text(
            os.path.join(args.output, "wet")
        ).filter(F.col("value").startswith("WARC/1.0")).count(),
        "n_wat_records": spark.read.text(
            os.path.join(args.output, "wat")
        ).filter(F.col("value").startswith("WARC/1.0")).count(),
        "status_counts": counts,
    }
    with open(os.path.join(args.output, "summary.json"), "w") as fh:
        json.dump(summary, fh)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
