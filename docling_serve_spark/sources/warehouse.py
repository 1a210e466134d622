"""Iceberg-style results warehouse: partitioned parquet + manifest.

The reference's local engine loses all state on a crash (in-memory
task dict, reference:engines/async_local/orchestrator.py:19-20); the
north rule requires per-partition checkpointing with lineage so a
killed run resumes without recomputation. No Iceberg runtime jar
ships in this sandbox, so this module implements the same semantics
on plain parquet:

  out_dir/
    data/chunk=<k>/*.parquet      one directory per checkpoint unit
    _manifest/chunk_<k>.json      written AFTER the chunk commits:
                                  counters (docs in/out, statuses,
                                  bytes, ocr invocations) = lineage
    _metrics/ (derived view over the manifest files)

A chunk is ``pmod(xxhash64(url), n_chunks)`` — deterministic, evenly
sized, independent of input order. Resume = skip chunks whose
manifest entry exists; each chunk write is idempotent (overwrite).
When a real Iceberg catalog is available, swap the writer for
``df.writeTo(table).overwritePartitions()`` — the chunking, manifest
counters and resume logic are unchanged.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from docling_serve_spark.extract.core import ExtractOptions
from docling_serve_spark.operators.extract_stage import run_extraction


def chunk_expr(n_chunks: int):
    return F.pmod(F.xxhash64("url"), F.lit(n_chunks)).cast("int")


def _manifest_path(out_dir: str, chunk: int) -> str:
    return os.path.join(out_dir, "_manifest", f"chunk_{chunk}.json")


def completed_chunks(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("chunk_") and name.endswith(".json"):
            done.add(int(name[len("chunk_"):-len(".json")]))
    return done


class AbortOnErrorError(RuntimeError):
    """Job-level fail-fast (ConvertDocumentsOptions.abort_on_error,
    reference:datamodel/convert.py:247-255): raised after the first
    chunk that commits with failure rows. The chunk's manifest is
    still written, so a fixed-up rerun resumes past it."""


@dataclass
class ChunkReport:
    chunk: int
    num_docs: int
    num_succeeded: int
    num_failed: int
    num_skipped: int
    bytes_processed: int
    ocr_invocations: int
    skipped_resume: bool = False


def _counters(results: DataFrame) -> dict:
    """Per-partition lineage counters (TaskProcessingMeta ⊕ callback
    lineage, reference:datamodel/task_meta.py:4-8, callback.py:31-39)."""
    row = results.agg(
        F.count("*").alias("num_docs"),
        F.sum((F.col("status") == "success").cast("int")).alias("num_succeeded"),
        F.sum((F.col("status") == "failure").cast("int")).alias("num_failed"),
        F.sum((F.col("status") == "skipped").cast("int")).alias("num_skipped"),
        F.sum("n_bytes").alias("bytes_processed"),
        F.sum(F.col("ocr_invoked").cast("int")).alias("ocr_invocations"),
    ).collect()[0]
    return {k: int(row[k] or 0) for k in row.asDict()}


def run_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_chunks: int = 16,
    opts: ExtractOptions | None = None,
    max_chunks: int | None = None,
) -> list[ChunkReport]:
    """Extraction over the corpus in n_chunks resumable units.

    Each unit: filter (pushed to the scan via the chunk predicate) ->
    extract -> idempotent overwrite of data/chunk=<k> -> manifest
    entry with counters. ``max_chunks`` bounds work for kill tests.
    On restart, completed chunks are skipped entirely (the resume
    anti-join over chunk ids, O15).
    """
    done = completed_chunks(out_dir)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    src = pages.withColumn("__chunk", chunk_expr(n_chunks))
    reports: list[ChunkReport] = []
    processed = 0
    for chunk in range(n_chunks):
        if chunk in done:
            reports.append(
                ChunkReport(chunk, 0, 0, 0, 0, 0, 0, skipped_resume=True)
            )
            continue
        if max_chunks is not None and processed >= max_chunks:
            break
        subset = src.filter(F.col("__chunk") == chunk).drop("__chunk")
        results = run_extraction(subset, opts=opts)
        data_path = os.path.join(out_dir, "data", f"chunk={chunk}")
        results.write.mode("overwrite").parquet(data_path)
        counters = _counters(spark.read.parquet(data_path))
        with open(_manifest_path(out_dir, chunk), "w") as f:
            json.dump({"chunk": chunk, **counters}, f)
        reports.append(ChunkReport(chunk, **counters))
        processed += 1
        if (opts and opts.abort_on_error) and counters["num_failed"] > 0:
            raise AbortOnErrorError(
                f"chunk {chunk}: {counters['num_failed']} document(s) "
                "failed and abort_on_error is set"
            )
    return reports


def read_results(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(out_dir, "data")).parquet(
        os.path.join(out_dir, "data", "chunk=*")
    )


def metrics_df(spark: SparkSession, out_dir: str) -> DataFrame:
    """The _metrics table: one row per committed chunk (lineage)."""
    rows = []
    mdir = os.path.join(out_dir, "_manifest")
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                rows.append(json.load(f))
    return spark.createDataFrame(
        rows,
        "chunk int, num_docs bigint, num_succeeded bigint, num_failed bigint, "
        "num_skipped bigint, bytes_processed bigint, ocr_invocations bigint",
    )
