"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the target deployment (1000-executor cluster over ~100 TB of
crawl pages) while remaining correct on local[N]:
  - AQE on (runtime coalescing + skew-join splitting)
  - Arrow transport for all pandas-UDF stages, modest batch size
    (heavy PDF rows: a 200-page PDF row can be multi-MB — the
    reference batches 10 docs/chunk, kfp_pipeline.py:36; we batch by
    records AND bound partition bytes)
  - shuffle partitions sized for local[32] tests; on a real cluster
    AQE coalesces from a higher initial number
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "docling-serve-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 256,
    files_max_partition_bytes: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    """``files_max_partition_bytes``: input-split size. The extraction
    UDF is compute-bound (~2 MB/s/core measured), so split size sets
    task granularity in CPU-seconds, not IO: 128 MB (default) ≈ 60 s
    tasks — right for a 1000-executor run over 100 TB; small corpora
    need 4-16 MB or the scan packs everything into a handful of splits
    and most cores idle."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config(
            "spark.sql.files.maxPartitionBytes",
            str(files_max_partition_bytes or 134217728),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # keep stdout clean: bench.py must emit exactly one JSON line
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
