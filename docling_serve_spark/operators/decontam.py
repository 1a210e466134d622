"""Benchmark decontamination: flag corpus documents that share word
k-grams with an evaluation/benchmark set.

The standard pre-training hygiene pass (GPT-3 appendix C, PaLM §5,
Llama-2 §A.6 all run an n-gram-overlap decontamination between the
training corpus and their eval benchmarks). Semantics here: a document
is contaminated iff any of its overlapping word k-grams (over the
shared dedup normalization) appears anywhere in the benchmark text.

Scale shape — the one place a broadcast is *correct by nature of the
data*: benchmark suites are bounded (thousands of questions, at most
millions of k-grams) while the corpus side is the 10^12-document
table. So the benchmark gram set is broadcast and the corpus side
never shuffles raw grams: the broadcast hash join runs map-side inside
the scan stage, and the only shuffle is the per-doc hit-count partial
aggregation (doc_id key, map-side combined). Corpus docs shorter than
k tokens have no k-gram and are trivially clean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from docling_serve_spark.operators.dedup import norm_text


def kgrams(text_col: Column, k: int) -> Column:
    """Array of overlapping word k-grams of the normalized text.
    Callers must pre-filter rows with fewer than k tokens:
    ``F.sequence`` generates a *descending* range when start > stop,
    so an unguarded short row would fabricate bogus grams."""
    toks = F.split(norm_text(text_col), " ")
    n = F.size(toks)
    return F.transform(
        F.sequence(F.lit(1), (n - (k - 1)).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )


def contamination_flags(docs: DataFrame, benchmark: DataFrame,
                        text_col: str = "text",
                        bench_text_col: str = "text",
                        k: int = 6) -> DataFrame:
    """(doc_id, n_gram_hits, contaminated) for every corpus document.

    ``n_gram_hits`` counts corpus-side gram *occurrences* that appear
    in the benchmark gram set (a gram repeated in the doc counts each
    time); ``contaminated`` is hits > 0. The benchmark side is
    deduplicated then broadcast.
    """
    toks_n = F.size(F.split(norm_text(F.col(text_col)), " "))
    bench_n = F.size(F.split(norm_text(F.col(bench_text_col)), " "))

    bench_grams = (
        benchmark.filter(bench_n >= k)
        .select(F.explode(kgrams(F.col(bench_text_col), k)).alias("gram"))
        .distinct()
    )
    corpus_grams = (
        docs.filter(toks_n >= k)
        .select("doc_id", F.explode(kgrams(F.col(text_col), k)).alias("gram"))
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "inner")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_gram_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            F.col("doc_id").cast("bigint"),
            F.coalesce(F.col("n_gram_hits"), F.lit(0)).cast("bigint")
            .alias("n_gram_hits"),
            (F.coalesce(F.col("n_gram_hits"), F.lit(0)) > 0)
            .alias("contaminated"),
        )
    )
