"""Structured-streaming form of the extraction pipeline.

The reference has NO stream surface — its async API is task-based
request/response (SURVEY.md §2.9) — but the batch job generalizes to
a continuous crawl feed for free: the extraction stage is a stateless
``mapInPandas``, so the identical ``run_extraction`` plan runs under
``readStream`` with exactly-once file-sink semantics from the
streaming checkpoint (the streaming analog of the batch job's
per-chunk manifest, sources/warehouse.py).

Deployment shapes:
  - drain-the-backlog: ``trigger(availableNow=True)`` — process every
    file currently in the landing dir, checkpoint, exit (used by the
    tests; also the idempotent "catch-up" cron job at scale)
  - continuous: default micro-batches; new crawl files picked up by
    the file source, ``maxFilesPerTrigger`` bounding batch size

Late/landing metrics use event-time windows on ``warc_ts`` with a
watermark, so a replayed crawl partition does not grow state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from docling_serve_spark.extract.core import ExtractOptions
from docling_serve_spark.operators.extract_stage import run_extraction

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a landing directory of pages parquet."""
    reader = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


def extract_stream(pages: DataFrame, opts: ExtractOptions | None = None) -> DataFrame:
    """The batch extraction plan, unchanged, over a streaming source —
    stateless stages (filter/repartition/mapInPandas/union) are
    streaming-compatible as-is."""
    return run_extraction(pages, opts=opts)


def windowed_status_counts(
    results: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window conversion counters (the streaming form of
    TaskProcessingMeta, reference:datamodel/task_meta.py:4-8): docs and
    bytes per (event-time window, status). The watermark bounds state:
    crawl partitions older than it are finalized and evicted."""
    return (
        results.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("status"))
        .agg(
            F.count("*").alias("num_docs"),
            F.sum("n_bytes").alias("bytes_processed"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "status", "num_docs", "bytes_processed",
        )
    )


def run_to_parquet(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    output_mode: str = "append",
) -> StreamingQuery:
    """Start the sink with exactly-once checkpointing."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
