"""docling-serve-spark: a PySpark-native batch document-extraction engine.

A from-scratch reimplementation of the capabilities of
``NikolasTh90/docling-serve`` (reference at /root/reference, read-only)
as a Spark-first batch pipeline: instead of an async FastAPI server
converting one document per request, a ``spark-submit`` job reads an
Iceberg-style table of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)`` and runs the extraction stages —
HTML DOM parse + boilerplate strip, PDF content-stream parse + layout
segmentation, text-quality analysis + OCR dispatch, BiDi / markdown
post-processing, multi-channel export — as vectorized Arrow-batched
stages over salted, size-bucketed partitions.

Layout:
    docmodel/    document model + md/text/html/doctags/json exporters
                 (reference: docling_serve/response_preparation.py:74-111)
    extract/     pure-Python deterministic extractors (the executable
                 oracle): HTML, PDF, quality analysis, BiDi, lang map
    operators/   Spark stages (mapInPandas extraction, columnar
                 analysis, post-processing, dedup, similarity, metrics)
    sources/     deterministic synthetic pages generator + warehouse
    jobs/        spark-submit entrypoints
"""

__version__ = "0.1.0"
