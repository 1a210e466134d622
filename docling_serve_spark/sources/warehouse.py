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
manifest entry exists; each chunk write is idempotent (dynamic
partition overwrite replaces exactly the chunks being recomputed).

Execution shape (the part that matters at 100 TB): ALL pending
chunks are extracted in ONE pass over the input —
``extract -> write.partitionBy(chunk)`` with dynamic partition
overwrite — so a fresh 256-chunk run scans the input exactly once,
not 256 times. The only per-chunk work after the write is the
counter audit, a column-pruned read of the just-committed output
(4 small columns; parquet never materializes the text columns),
grouped by chunk in one job. Counters computed from committed files
are also better lineage than in-flight aggregates: they describe
what is actually on disk.

File-count math: the write does NOT shuffle (a repartition by chunk
alone would create one giant task per chunk — 100 TB / 256 ≈ 390 GB
per task), so each write task emits up to one file per chunk it
touches. At 1000 executors x 256 chunks that is ≤ 256k files per
run — the regime Iceberg's manifest files are built for; on plain
parquet, raise ``n_chunks`` granularity only as far as the resume
unit needs.

``abort_on_error`` (fail-fast) is inherently sequential — the point
is to STOP scanning after the first failing unit — so that mode
processes one chunk per pass (the reference's per-document abort,
reference:datamodel/convert.py:247-255, mapped to chunk
granularity). The default path never pays that amplification.

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

_COUNTER_KEYS = (
    "num_docs",
    "num_succeeded",
    "num_failed",
    "num_skipped",
    "bytes_processed",
    "ocr_invocations",
)


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


def _wave_counters_df(
    spark: SparkSession, out_dir: str, wave: list[int]
) -> DataFrame:
    """The counter-audit plan: a grouped aggregation over the
    committed output, reading ONLY (chunk, status, n_bytes,
    ocr_invoked) — parquet column pruning keeps the text channels on
    disk (asserted in tests/test_plans.py)."""
    # read the directory root (partition discovery finds chunk=*);
    # a glob path here makes Spark probe for streaming-sink metadata
    # and log a spurious stacktrace per call
    committed = spark.read.parquet(os.path.join(out_dir, "data"))
    return (
        committed.filter(F.col("chunk").isin(wave))
        .groupBy("chunk")
        .agg(
            F.count("*").alias("num_docs"),
            F.sum((F.col("status") == "success").cast("int")).alias("num_succeeded"),
            F.sum((F.col("status") == "failure").cast("int")).alias("num_failed"),
            F.sum((F.col("status") == "skipped").cast("int")).alias("num_skipped"),
            F.sum("n_bytes").alias("bytes_processed"),
            F.sum(F.col("ocr_invoked").cast("int")).alias("ocr_invocations"),
        )
    )


def _wave_counters(
    spark: SparkSession, out_dir: str, wave: list[int]
) -> dict[int, dict]:
    """Per-chunk lineage counters (TaskProcessingMeta ⊕ callback
    lineage, reference:datamodel/task_meta.py:4-8, callback.py:31-39)
    audited from the COMMITTED output: one column-pruned grouped read
    for the whole wave, not a full re-read per chunk. Chunks in the
    wave that produced zero rows get explicit zero counters so resume
    still skips them."""
    from pyspark.errors import AnalysisException

    counters = {c: {k: 0 for k in _COUNTER_KEYS} for c in wave}
    try:
        rows = _wave_counters_df(spark, out_dir, wave).collect()
    except AnalysisException:  # no data dir: every wave chunk empty.
        # Only the missing-path case is absorbed — a FAILED read of
        # committed files must propagate, or zero-count manifests
        # would mark corrupt chunks complete and resume would skip
        # them forever.
        return counters
    for r in rows:
        counters[r["chunk"]] = {k: int(r[k] or 0) for k in _COUNTER_KEYS}
    return counters


def _run_wave(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_chunks: int,
    wave: list[int],
    opts: ExtractOptions | None,
) -> dict[int, dict]:
    """Extract every chunk in ``wave`` in ONE pass over the input and
    commit them via dynamic partition overwrite, then write their
    manifests. Crash mid-write leaves partial files but no manifests;
    the next run recomputes exactly those chunks and the overwrite
    replaces the partial partitions (idempotence)."""
    src = pages
    if len(wave) < n_chunks:  # resume / capped run: subset of chunks
        src = src.filter(chunk_expr(n_chunks).isin(wave))
    results = run_extraction(src, opts=opts).withColumn(
        "chunk", chunk_expr(n_chunks)
    )
    # X244 — zero-extra-pass in-flight counters: an Observation rides
    # the write plan itself (Spark evaluates the observed aggregates
    # on the rows AS THEY STREAM to parquet — no second scan). The
    # committed-file audit below stays the source of truth for the
    # manifests (it reads what actually landed); the observation is
    # the integrity cross-check: a divergence means the committed
    # output is not what this job streamed (partial write survived a
    # crash window, or a concurrent writer touched the directory).
    from pyspark.sql import Observation

    obs = Observation()
    observed = results.observe(
        obs,
        F.count(F.lit(1)).alias("num_docs"),
        F.sum((F.col("status") == "success").cast("int"))
        .alias("num_succeeded"),
        F.sum((F.col("status") == "failure").cast("int"))
        .alias("num_failed"),
        F.sum("n_bytes").alias("bytes_processed"),
    )
    (
        observed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("chunk")
        .parquet(os.path.join(out_dir, "data"))
    )
    streamed = obs.get
    counters = _wave_counters(spark, out_dir, wave)
    audited = {
        k: sum(counters[c][k] for c in wave)
        for k in ("num_docs", "num_succeeded", "num_failed",
                  "bytes_processed")
    }
    for k, v in audited.items():
        if int(streamed[k] or 0) != v:
            raise RuntimeError(
                f"wave integrity check failed: streamed {k}="
                f"{streamed[k]} but committed output audits to {v} — "
                "the data directory changed underneath this job"
            )
    for chunk in wave:
        with open(_manifest_path(out_dir, chunk), "w") as f:
            json.dump({"chunk": chunk, **counters[chunk]}, f)
    return counters


def run_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_chunks: int = 16,
    opts: ExtractOptions | None = None,
    max_chunks: int | None = None,
) -> list[ChunkReport]:
    """Extraction over the corpus in n_chunks resumable units,
    computed in a SINGLE pass over the input (see module docstring).

    ``max_chunks`` bounds how many pending chunks this invocation
    commits (kill tests / incremental drains). On restart, completed
    chunks are skipped entirely (the resume anti-join over chunk ids,
    O15) and the remaining chunks again run as one pass.
    """
    done = completed_chunks(out_dir)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    pending = [c for c in range(n_chunks) if c not in done]
    if max_chunks is not None:
        pending = pending[:max_chunks]
    # fail-fast serializes: one chunk per pass, stop at first failure
    waves = (
        [[c] for c in pending]
        if (opts and opts.abort_on_error)
        else ([pending] if pending else [])
    )
    by_chunk: dict[int, dict] = {}
    for wave in waves:
        counters = _run_wave(spark, pages, out_dir, n_chunks, wave, opts)
        by_chunk.update(counters)
        if opts and opts.abort_on_error:
            failed = [c for c in wave if counters[c]["num_failed"] > 0]
            if failed:
                raise AbortOnErrorError(
                    f"chunk {failed[0]}: {counters[failed[0]]['num_failed']} "
                    "document(s) failed and abort_on_error is set"
                )
    reports: list[ChunkReport] = []
    for chunk in range(n_chunks):
        if chunk in by_chunk:
            reports.append(ChunkReport(chunk, **by_chunk[chunk]))
        elif chunk in done:
            reports.append(
                ChunkReport(chunk, 0, 0, 0, 0, 0, 0, skipped_resume=True)
            )
    return reports


def read_results(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))


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


def upsert(
    spark: SparkSession,
    out_dir: str,
    updates: DataFrame,
    n_chunks: int = 16,
) -> dict:
    """SCD-1 merge of a recrawl batch into the committed warehouse,
    keyed on url — the consumer of the X26 snapshot diff: re-extracted
    'changed'/'added' rows replace or join their predecessors WITHOUT
    rewriting the warehouse. Only the hash-chunk partitions that
    contain an updated url are read (partition-pruned scan) and
    rewritten (dynamic partition overwrite); every other chunk
    directory keeps its files byte-identical. This is Iceberg's
    MERGE/overwritePartitions expressed on plain parquet, with the
    same working-set bound: the touched partitions, not the table.

    ``updates`` must carry the warehouse row schema (url, status,
    channels, ...) with ONE row per url — resolve recrawl ties (e.g.
    latest warc_ts) upstream. Like Iceberg's MERGE, ``updates`` must
    not be a lazy plan over the target warehouse itself (the
    overwrite would invalidate its source files); materialize such a
    plan first (``localCheckpoint``) or write it elsewhere. Touched-chunk manifests are re-audited
    from the committed files afterwards, so resume lineage stays
    truthful. Returns merge counters."""
    upd = updates.withColumn("chunk", chunk_expr(n_chunks))
    touched = sorted(
        r["chunk"] for r in upd.select("chunk").distinct().collect()
    )
    if not touched:
        return {"touched_chunks": [], "n_updates": 0,
                "n_replaced": 0, "n_new": 0}
    data = os.path.join(out_dir, "data")
    if os.path.isdir(data):
        old = spark.read.parquet(data).filter(F.col("chunk").isin(touched))
    else:  # bootstrap: first merge into an empty warehouse
        old = upd.limit(0)
    n_old = old.count()
    survivors = old.join(
        upd.select("url").distinct(), "url", "left_anti"
    ).select(*upd.columns)
    # localCheckpoint cuts the lineage back to the files being
    # overwritten — Spark refuses a write whose plan still reads the
    # target path. Materialized size = survivors of touched chunks
    # only (the merge working set).
    merged = survivors.unionByName(upd).localCheckpoint(eager=True)
    n_upd = upd.count()
    n_merged = merged.count()
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("chunk")
        .parquet(data)
    )
    counters = _wave_counters(spark, out_dir, touched)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    for chunk in touched:
        with open(_manifest_path(out_dir, chunk), "w") as f:
            json.dump({"chunk": chunk, **counters[chunk]}, f)
    n_new = n_merged - n_old  # net additions
    return {
        "touched_chunks": touched,
        "n_updates": n_upd,
        "n_replaced": n_upd - n_new,
        "n_new": n_new,
    }


def write_bucketed(df: DataFrame, table: str, path: str,
                   bucket_col: str, n_buckets: int = 16) -> None:
    """X219 — persist a table BUCKETED (hash-partitioned into a fixed
    file layout) and sorted by the join key. Two tables bucketed the
    same way co-locate their keys file-by-file, so a join between
    them runs with ZERO shuffle of either side (plan-asserted in
    tests/test_plans.py:test_bucketed_join_has_no_shuffle) — the file
    layout every repeatedly-joined 100 TB table should have: pay the
    bucketing once at write time, skip the exchange on every
    subsequent join/aggregation on that key. External table (explicit
    ``path``) registered in the session catalog; drop with
    ``spark.sql(f"DROP TABLE {table}")`` — the files persist."""
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def file_clustering_audit(spark: SparkSession, path: str,
                          key_col: str) -> DataFrame:
    """X229 — data-skipping effectiveness audit for a parquet layout:
    per-FILE min/max ranges of ``key_col`` (the zone-map every
    format's reader prunes on), pairwise range-overlap depth, and a
    clustering score. A key the files are range-clustered on gives
    overlap_bp = 0 — a point predicate touches ONE file and a range
    predicate only its span; a hash/unsorted layout gives
    overlap_bp → 10000 and every predicate scans every file. This is
    the measurement behind the OPTIMIZE/sort-write decision every
    100 TB table owner makes — run it BEFORE paying a full rewrite.

    Emits one row: (n_files, n_rows, max_overlap_depth,
    overlap_bp, point_scan_files_avg_bp). overlap_bp =
    10000·(Σdepth − n)/(n·(n−1)): the share of OTHER files a file's
    range intersects, exact integers. point_scan_files_avg_bp: files
    a point query at each file's min key must read, averaged, in bp
    of n — the user-facing "how much does a point lookup scan".

    Shape at scale: per-file ranges come from ONE column-pruned scan
    grouped by ``_metadata.file_path`` (file count rows, not data
    rows, thereafter); the overlap join is files×files on a
    broadcast — file counts are 10^4-10^6 where rows are 10^12."""
    df = spark.read.parquet(path).select(
        F.col(key_col).alias("k"),
        F.col("_metadata.file_path").alias("f"),
    )
    ranges = df.groupBy("f").agg(
        F.min("k").alias("lo"), F.max("k").alias("hi"),
        F.count("*").cast("bigint").alias("m"),
    )
    other = ranges.select(
        F.col("f").alias("f2"), F.col("lo").alias("lo2"),
        F.col("hi").alias("hi2"),
    )
    depth = (
        ranges.crossJoin(F.broadcast(other))
        .filter((F.col("lo") <= F.col("hi2")) & (F.col("lo2") <= F.col("hi")))
        .groupBy("f")
        .agg(F.count("*").cast("bigint").alias("depth"))
    )
    point = (
        ranges.select(F.col("f").alias("fp"), F.col("lo").alias("probe"))
        .crossJoin(F.broadcast(other))
        .filter((F.col("lo2") <= F.col("probe"))
                & (F.col("probe") <= F.col("hi2")))
        .groupBy("fp")
        .agg(F.count("*").cast("bigint").alias("touched"))
    )
    return (
        ranges.join(depth, "f")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("m").cast("bigint").alias("n_rows"),
            F.max("depth").cast("bigint").alias("max_overlap_depth"),
            F.sum("depth").cast("bigint").alias("__sum_depth"),
        )
        .crossJoin(F.broadcast(
            point.agg(F.sum("touched").cast("bigint").alias("__sum_touch"),
                      F.count("*").cast("bigint").alias("__np"))
        ))
        .select(
            "n_files", "n_rows", "max_overlap_depth",
            F.expr("CASE WHEN n_files > 1 THEN "
                   "(10000 * (__sum_depth - n_files)) div "
                   "(n_files * (n_files - 1)) ELSE 0 END")
            .cast("bigint").alias("overlap_bp"),
            F.expr("(10000 * __sum_touch) div greatest(__np * n_files, 1)")
            .cast("bigint").alias("point_scan_files_avg_bp"),
        )
    )


def zorder_key(a, b, bits: int = 16):
    """X232 — Morton (Z-order) interleave of two bounded non-negative
    int columns into one clustering key: bit i of ``a`` lands at
    output bit 2i, bit i of ``b`` at 2i+1. Sorting/range-partitioning
    files by this ONE key gives zone-map locality in BOTH dimensions
    at once — the multi-dimensional clustering behind Delta/Iceberg
    OPTIMIZE ZORDER: a 1-D sort by ``a`` makes predicates on ``b``
    scan every file, the Z-order layout bounds file reads for point/
    range predicates on EITHER column (measured by X229's audit in
    tests/test_plans.py:test_zorder_layout_skips_on_both_dims).

    Pure bit arithmetic on int64 (columns must fit ``bits`` bits;
    callers quantize first — rank/bucket the raw values if unbounded),
    zero shuffle, zero UDFs: one codegen expression."""
    if not 1 <= bits <= 31:
        # bit 2*30+1 = 61 is the last safe output bit: bits=32 would
        # shift b's top bit into the int64 sign bit, producing
        # negative keys that range-partition before all positive ones
        raise ValueError("zorder_key needs 1 <= bits <= 31")
    key = None
    for i in range(bits):
        abit = F.shiftleft(
            F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        bbit = F.shiftleft(
            F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        contrib = abit + bbit
        key = contrib if key is None else key + contrib
    return key.cast("bigint")
