"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline over a pages table
built from the sf0.001 documents parquet; ``queries``/``oracle_sql``
expose the full operator catalog (docling_serve_spark.queries) with
DuckDB twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wrap sf0.001 documents into Common-Crawl-style HTML
    pages (JVM-side), run the full extraction pipeline (sniff ->
    bucket -> mapInPandas extract -> channels), and summarize per
    (lang, status): docs, items, bytes."""
    from docling_serve_spark.operators.extract_stage import run_extraction
    from docling_serve_spark.operators.relational import resume_anti_join

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("https://example.com/doc"), F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<!DOCTYPE html><html><head><title>d</title></head><body>"
                      "<header><ul class=\"nav\"><li><a href=\"/\">home</a></li></ul></header>"
                      "<main><article><h1>"),
                F.col("source"),
                F.lit("</h1><p>"),
                F.col("text"),
                F.lit("</p></article></main><footer>chrome</footer></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    # exercise the resume path too: nothing completed -> full corpus
    manifest = spark.sql("SELECT CAST(NULL AS STRING) AS url WHERE false")
    pending = resume_anti_join(pages, manifest, key="url")
    results = run_extraction(pending)
    return (
        results.groupBy("lang", "status")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_items").alias("n_items"),
            F.sum("n_bytes").alias("n_bytes"),
            F.sum(F.length("extracted_text")).alias("n_text_chars"),
        )
        .orderBy("lang", "status")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from docling_serve_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from docling_serve_spark.queries import ORACLES

    return dict(ORACLES)
