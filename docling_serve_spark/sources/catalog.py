"""Input-source resolution for the pages table.

The north rule reads "an Iceberg table of Common-Crawl-style pages".
This sandbox has no Iceberg runtime jar, so the engine resolves its
input by scheme and uses the real Iceberg reader when the runtime is
present, falling back cleanly otherwise:

  - ``iceberg:<catalog.db.table>`` -> ``spark.read.format("iceberg")``
    (requires the iceberg-spark-runtime jar on the cluster; partition
    pruning on ``warc_ts`` comes from the table spec)
  - ``table:<name>``               -> ``spark.table`` (any catalog-
    registered table, incl. Iceberg via Spark SQL catalogs)
  - ``synthetic:<n>``              -> the seeded deterministic corpus
  - ``warc:<glob>``                -> raw Common-Crawl WARC files
    (sources/warc.py; one file per task)
  - anything else                  -> parquet path

The checkpointed warehouse (sources/warehouse.py) mirrors Iceberg's
commit semantics on plain parquet: per-chunk atomic manifest entries,
idempotent re-writes, and a metrics table — so the job's resume
contract is identical whichever reader is active.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    if source.startswith("iceberg:"):
        return spark.read.format("iceberg").load(source[len("iceberg:"):])
    if source.startswith("table:"):
        return spark.table(source[len("table:"):])
    if source.startswith("synthetic:"):
        from docling_serve_spark.sources.pages import build_pages_df

        return build_pages_df(spark, int(source.split(":", 1)[1]))
    if source.startswith("warc:"):
        from docling_serve_spark.sources.warc import read_warc

        return read_warc(spark, source[len("warc:"):])
    return spark.read.parquet(source)
