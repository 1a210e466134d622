"""URL canonicalization and host-level corpus statistics.

Web-corpus pipelines key dedup, quota, and quality decisions on the
canonical URL and its host (one crawl page appears under http/https,
with/without ``www.``, with tracking params, etc. — C4 and RefinedWeb
both run URL-level dedup and per-host filtering before any content
pass). All transforms are single regexp passes — JVM-side,
WholeStageCodegen — so canonicalization never leaves the scan stage,
and the host aggregation is one hash-partial-aggregated groupBy on a
low-cardinality key (hosts ≪ pages; a pathological single-host crawl
is the one skew case, handled the same way as any hot aggregate key:
AQE skew handling, or pre-aggregate per (host, url-hash-salt)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def canonical_url(col: Column) -> Column:
    """Deterministic URL canonical form: lowercase, scheme stripped,
    query/fragment dropped, leading ``www.`` removed, trailing slash
    trimmed. Pure regexp chain (identical semantics in DuckDB's RE2
    for these patterns — anchored literals and char classes only)."""
    u = F.lower(col)
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"[?#].*$", "")
    u = F.regexp_replace(u, r"^www\.", "")
    return F.regexp_replace(u, r"/$", "")


def url_host(col: Column) -> Column:
    """Host component of a canonical URL (text before the first '/')."""
    return F.regexp_extract(canonical_url(col), r"^([^/]+)", 1)


def host_stats(pages: DataFrame, url_col: str = "url",
               chars_col: str = "n_chars",
               lang_col: str = "lang") -> DataFrame:
    """Per-host corpus statistics: page count, total extracted chars,
    distinct languages, smallest doc id (the per-host representative).
    The groupBy key is the canonicalized host, so http/https/www
    variants of one site aggregate together."""
    return (
        pages.select(
            url_host(F.col(url_col)).alias("host"),
            F.col(chars_col),
            F.col(lang_col),
            F.col("doc_id"),
        )
        .groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            F.sum(chars_col).cast("bigint").alias("total_chars"),
            F.countDistinct(lang_col).cast("bigint").alias("n_langs"),
            F.min("doc_id").cast("bigint").alias("first_doc_id"),
        )
    )
