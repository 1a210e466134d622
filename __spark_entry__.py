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
    """Flagship: turn sf0.001 documents into a MIXED-FORMAT
    Common-Crawl-style pages table — doc_id % 12 routes a slice
    through markdown / asciidoc / csv / pdf / docx bytes, the rest
    through the HTML wrapper, so the official flagship row exercises
    the format router the way real crawls do (reference scope:
    docs/usage.md from_formats) — then run the full extraction
    pipeline (sniff -> bucket -> mapInPandas extract -> channels)
    and summarize per (doc_type, status): docs, items, bytes."""
    from docling_serve_spark.operators.extract_stage import run_extraction
    from docling_serve_spark.operators.relational import resume_anti_join

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def _to_pages(batches):
        import random

        import pandas as pd

        from docling_serve_spark.sources.pages import _synth_docx, _synth_pdf

        for pdf in batches:
            rows = []
            for doc_id, source, text, lang in zip(
                pdf["doc_id"], pdf["source"], pdf["text"], pdf["lang"]
            ):
                i, t, src = int(doc_id), str(text or ""), str(source or "")
                m = i % 12
                if m == 0:  # markdown: '# ' heading routes md
                    body = f"# {src}\n\n{t}\n".encode()
                elif m == 1:  # asciidoc: '= ' doc title routes asciidoc
                    body = f"= {src}\n\n{t}\n".encode()
                elif m == 2:  # csv: uniform 1-comma lines route csv
                    snip = t[:120].replace(",", " ").replace("\n", " ")
                    body = (
                        "field,value\nsource,{}\nlang,{}\ntext,{}\n"
                        .format(src.replace(",", " "), lang, snip)
                        .encode()
                    )
                elif m == 3:  # born-digital PDF (deterministic synth)
                    body = _synth_pdf(random.Random(f"entry:{i}"), i, lang)
                elif m == 4:  # OOXML container (deterministic synth)
                    body = _synth_docx(random.Random(f"entry:{i}"), lang)
                else:  # majority: crawl HTML carrying the doc text
                    body = (
                        "<!DOCTYPE html><html><head><title>d</title></head>"
                        "<body><header><ul class=\"nav\"><li>"
                        "<a href=\"/\">home</a></li></ul></header>"
                        f"<main><article><h1>{src}</h1><p>{t}</p></article>"
                        "</main><footer>chrome</footer></body></html>"
                    ).encode()
                rows.append(
                    (f"https://example.com/doc{i}",
                     pd.Timestamp("2024-01-01 00:00:00"), body, t, lang)
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    pages = docs.mapInPandas(
        _to_pages,
        schema="url string, warc_ts timestamp, html binary, "
               "text string, lang string",
    )
    # exercise the resume path too: nothing completed -> full corpus
    manifest = spark.sql("SELECT CAST(NULL AS STRING) AS url WHERE false")
    pending = resume_anti_join(pages, manifest, key="url")
    results = run_extraction(pending)
    return (
        results.groupBy("doc_type", "status")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_items").alias("n_items"),
            F.sum("n_bytes").alias("n_bytes"),
            F.sum(F.length("extracted_text")).alias("n_text_chars"),
        )
        .orderBy("doc_type", "status")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from docling_serve_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from docling_serve_spark.queries import ORACLES

    return dict(ORACLES)
