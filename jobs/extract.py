#!/usr/bin/env python3
"""spark-submit entrypoint: batch extraction over a pages table.

The batch-job form of the reference's convert endpoints
(reference:docling_serve/app.py:369-428): one run = one corpus, with
ConvertDocumentsOptions surfaced as flags (defaults mirror
reference:datamodel/convert.py:114-479) and per-partition resumable
checkpointing (the durability the reference's local engine lacks).

Usage:
  spark-submit --py-files dist/docling_serve_spark.zip jobs/extract.py \
      --input  /warehouse/pages --output /warehouse/extracted \
      --chunks 256
  python jobs/extract.py --input synthetic:5000 --output /tmp/out
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
                    help="pages source: parquet path, iceberg:<tbl>, "
                         "table:<name>, or synthetic:<n>")
    ap.add_argument("--output", required=True, help="results warehouse dir")
    ap.add_argument("--chunks", type=int, default=16,
                    help="resumable checkpoint units (Iceberg-partition analog)")
    ap.add_argument("--streaming", action="store_true",
                    help="treat --input as a landing dir and drain it via "
                         "Structured Streaming (availableNow, exactly-once "
                         "sink checkpoint) instead of the chunked batch path")
    ap.add_argument("--master", default=None)
    ap.add_argument("--max-partition-bytes", type=int, default=None,
                    help="input-split size; the UDF stage is compute-bound "
                         "(~2 MB/s/core), so this sets task granularity — "
                         "default 128MB suits cluster scale, use 2-16MB for "
                         "small corpora (see BENCH.md)")
    # ConvertDocumentsOptions analog (reference defaults)
    ap.add_argument("--to-formats", default="md",
                    help="comma list of md,text,html,doctags,json "
                         "(reference default: md; text+spans always emitted)")
    ap.add_argument("--no-ocr", action="store_true", help="disable OCR dispatch (do_ocr=False)")
    ap.add_argument("--force-ocr", action="store_true")
    ap.add_argument("--no-bidi", action="store_true")
    ap.add_argument("--max-file-size-mb", type=int, default=200)
    ap.add_argument("--max-num-pages", type=int, default=0)
    ap.add_argument("--page-break-placeholder", default="")
    ap.add_argument("--table-mode", default="fast", choices=("fast", "accurate"))
    ap.add_argument("--from-formats", default=None,
                    help="comma allow-list of input formats "
                         "(default: all of html,pdf,docx,pptx,xlsx,md,asciidoc,image)")
    ap.add_argument("--ocr-engine", default="easyocr",
                    choices=("easyocr", "tesseract_cli", "tesseract",
                             "rapidocr", "ocrmac"))
    ap.add_argument("--ocr-lang", default="",
                    help="comma list of OCR language codes")
    ap.add_argument("--pdf-backend", default="dlparse_v4",
                    choices=("pypdfium2", "dlparse_v1", "dlparse_v2", "dlparse_v4"))
    ap.add_argument("--abort-on-error", action="store_true",
                    help="fail the job after the first chunk with failure rows")
    ap.add_argument("--no-table-structure", action="store_true")
    ap.add_argument("--no-images", action="store_true")
    ap.add_argument("--images-scale", type=float, default=2.0)
    ap.add_argument("--enable-ai-vision", action="store_true")
    args = ap.parse_args()

    from docling_serve_spark.extract.core import ExtractOptions
    from docling_serve_spark.session import get_spark
    from docling_serve_spark.sources.warehouse import (
        metrics_df,
        run_checkpointed,
    )

    spark = get_spark(app_name="extract-job", master=args.master,
                      files_max_partition_bytes=args.max_partition_bytes)
    opts = ExtractOptions(
        to_formats=tuple(f.strip() for f in args.to_formats.split(",") if f.strip()),
        do_ocr=not args.no_ocr,
        force_ocr=args.force_ocr,
        enable_bidi_processing=not args.no_bidi,
        max_file_size_bytes=args.max_file_size_mb * 1024 * 1024,
        max_num_pages=args.max_num_pages,
        page_break_placeholder=args.page_break_placeholder,
        table_mode=args.table_mode,
        **(
            {"from_formats": tuple(
                f.strip() for f in args.from_formats.split(",") if f.strip()
            )} if args.from_formats else {}
        ),
        ocr_engine=args.ocr_engine,
        ocr_lang=tuple(c.strip() for c in args.ocr_lang.split(",") if c.strip()),
        pdf_backend=args.pdf_backend,
        abort_on_error=args.abort_on_error,
        do_table_structure=not args.no_table_structure,
        include_images=not args.no_images,
        images_scale=args.images_scale,
        enable_ai_vision=args.enable_ai_vision,
    ).normalized()  # P2 mode-conflict resolution, driver-side once

    if args.streaming:
        from docling_serve_spark.streaming import extract_stream, stream_pages
        from docling_serve_spark.streaming.ingest import run_to_parquet

        out_data = os.path.join(args.output, "data")
        ckpt = os.path.join(args.output, "_stream_checkpoint")
        q = run_to_parquet(
            extract_stream(stream_pages(spark, args.input), opts=opts),
            out_data, ckpt,
        )
        q.awaitTermination()
        from pyspark.errors import AnalysisException
        from pyspark.sql import functions as F

        # an empty landing dir writes no files; the summary read must
        # not crash — report num_docs=0
        try:
            res = spark.read.parquet(out_data)
            counts = {
                r["status"]: r["n"]
                for r in res.groupBy("status").agg(F.count("*").alias("n")).collect()
            }
            num_docs = int(res.count())
        except AnalysisException:
            counts, num_docs = {}, 0
        print(json.dumps({
            "mode": "streaming",
            "num_docs": num_docs,
            "num_succeeded": int(counts.get("success", 0)),
            "num_failed": int(counts.get("failure", 0)),
            "num_skipped": int(counts.get("skipped", 0)),
        }))
        spark.stop()
        return

    from docling_serve_spark.sources.catalog import read_pages

    pages = read_pages(spark, args.input)

    reports = run_checkpointed(
        spark, pages, args.output, n_chunks=args.chunks, opts=opts
    )
    resumed = sum(1 for r in reports if r.skipped_resume)
    totals = metrics_df(spark, args.output).agg(
        {"num_docs": "sum", "num_succeeded": "sum", "num_failed": "sum",
         "num_skipped": "sum", "bytes_processed": "sum",
         "ocr_invocations": "sum"}
    ).collect()[0]
    print(json.dumps({
        "chunks_total": args.chunks,
        "chunks_resumed_skip": resumed,
        "num_docs": int(totals["sum(num_docs)"] or 0),
        "num_succeeded": int(totals["sum(num_succeeded)"] or 0),
        "num_failed": int(totals["sum(num_failed)"] or 0),
        "num_skipped": int(totals["sum(num_skipped)"] or 0),
        "bytes_processed": int(totals["sum(bytes_processed)"] or 0),
        "ocr_invocations": int(totals["sum(ocr_invocations)"] or 0),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
