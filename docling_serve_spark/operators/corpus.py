"""The composed training-mixture pipeline: filter chain → exact-dedup
winners → benchmark decontamination → domain-mix sampling → sequence
packing, as one declarative plan.

This is the end-to-end shape a corpus team actually runs (C4 and
RefinedWeb both publish exactly this gate order): every gate is an
already-oracle-proven operator, evaluated independently over the full
corpus, and a document survives iff it passes all of them. Evaluating
gates independently (rather than feeding each gate the previous gate's
survivors) keeps every stage a full-table scan with no ordering
dependency — the gates run concurrently and their doc_id-keyed results
meet in equi-joins that reuse one hash partitioning (Catalyst's
ENSURE_REQUIREMENTS sees identical keys and inserts no extra
exchange). Semantics are identical because all gates are pure
per-document predicates except exact-dedup, whose min-doc_id winner
rule is deliberately defined over the *full* corpus so resumes and
re-runs pick the same winner regardless of which subset is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from docling_serve_spark.operators.decontam import contamination_flags
from docling_serve_spark.operators.dedup import norm_text
from docling_serve_spark.operators.sampling import (
    domain_mix_sample,
    pack_sequences,
)
from docling_serve_spark.operators.textstats import corpus_filter_chain


def gate_flags(docs: DataFrame, benchmark: DataFrame, hosts: DataFrame,
               rates: DataFrame, text_col: str = "text",
               k: int = 6) -> DataFrame:
    """(doc_id, keep_filter, is_winner, clean, mix_kept) — every gate's
    verdict for every document. ``hosts`` is (doc_id, host);
    ``rates`` is (host, keep_ppm)."""
    fc = corpus_filter_chain(docs, text_col).select("doc_id", "keep")
    winners = (
        docs.select(
            F.md5(norm_text(F.col(text_col))).alias("fp"), F.col("doc_id")
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(True).alias("is_winner"))
    )
    dc = contamination_flags(docs, benchmark, text_col, k=k).select(
        "doc_id", (~F.col("contaminated")).alias("clean")
    )
    mx = domain_mix_sample(hosts, rates).select(
        "doc_id", F.col("kept").alias("mix_kept")
    )
    return (
        docs.select(F.col("doc_id").cast("bigint"))
        .join(fc, "doc_id")
        .join(winners, "doc_id", "left")
        .join(dc, "doc_id")
        .join(mx, "doc_id")
        .select(
            "doc_id",
            F.col("keep").alias("keep_filter"),
            F.coalesce(F.col("is_winner"), F.lit(False)).alias("is_winner"),
            "clean",
            "mix_kept",
        )
    )


def mixture_funnel(docs: DataFrame, benchmark: DataFrame, hosts: DataFrame,
                   rates: DataFrame, text_col: str = "text",
                   k: int = 6) -> DataFrame:
    """One-row attrition audit: documents surviving each cumulative
    gate, in pipeline order. A single aggregation over the gate
    flags — no per-stage actions, no recomputation."""
    f = gate_flags(docs, benchmark, hosts, rates, text_col, k)
    s1 = F.col("keep_filter")
    s2 = s1 & F.col("is_winner")
    s3 = s2 & F.col("clean")
    s4 = s3 & F.col("mix_kept")

    def cnt(c, name):
        return F.sum(c.cast("bigint")).cast("bigint").alias(name)

    return f.agg(
        F.count("*").cast("bigint").alias("n_input"),
        cnt(s1, "n_after_filter"),
        cnt(s2, "n_after_dedup"),
        cnt(s3, "n_after_decontam"),
        cnt(s4, "n_after_mix"),
    )


def build_training_mixture(docs: DataFrame, benchmark: DataFrame,
                           hosts: DataFrame, rates: DataFrame,
                           text_col: str = "text", k: int = 6,
                           seq_len: int = 512,
                           n_shards: int = 16) -> DataFrame:
    """Packed training sequences over the surviving documents:
    (doc_id, shard, n_tokens, bin_id, offset_in_bin)."""
    f = gate_flags(docs, benchmark, hosts, rates, text_col, k)
    surviving = f.filter(
        F.col("keep_filter") & F.col("is_winner") & F.col("clean")
        & F.col("mix_kept")
    ).select("doc_id")
    return pack_sequences(
        docs.join(surviving, "doc_id"), seq_len, n_shards, text_col
    )
