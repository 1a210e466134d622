"""Deterministic corpus sampling and training-sequence packing.

Two mixture-construction stages every pre-training pipeline runs after
filtering/dedup:

- **Domain-mix sampling**: keep each page with a per-host (per-domain)
  probability — the mixture-weights pass (C4's and The Pile's domain
  reweighting). The keep decision must be a pure function of the
  document's stable key so re-runs, resumes, and incremental crawls
  make the *same* decision — no ``rand()``. We use Knuth's
  multiplicative hash (TAOCP vol. 3, §6.4: h = key * 2654435761 mod
  2^32) and compare in exact integer arithmetic against a
  parts-per-million rate, so Spark and any replaying engine agree
  bit-for-bit.

- **Sequence packing**: concatenate documents and chunk into
  fixed-length training sequences (the GPT-style "pack then split at
  seq_len boundaries"). A single global ordering would serialize the
  window into one partition at corpus scale, so packing is per-shard:
  shard = doc_id mod n_shards, each shard packs independently under a
  (shard)-partitioned window ordered by doc_id. Shards are the unit of
  parallelism AND the unit of determinism — adding executors changes
  nothing about bin assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_KNUTH = 2654435761  # golden-ratio multiplier, TAOCP §6.4
_U32 = 4294967296
_PPM = 1000000


def hash_u32(key: Column) -> Column:
    """Knuth multiplicative hash of a bigint key onto [0, 2^32)."""
    return F.pmod(key.cast("bigint") * F.lit(_KNUTH), F.lit(_U32))


def domain_mix_sample(pages: DataFrame, rates: DataFrame,
                      key_col: str = "doc_id",
                      host_col: str = "host") -> DataFrame:
    """(doc_id, host, keep_ppm, kept) — deterministic Bernoulli keep
    per page with a per-host rate given in parts-per-million.

    ``rates`` is (host, keep_ppm:bigint) — the mixture spec, a small
    config table, broadcast. Hosts absent from the spec default to
    keep_ppm = 0 (drop): mixture construction is allow-listed.
    The comparison ``h * 1e6 < keep_ppm * 2^32`` stays in exact
    bigint arithmetic (max ~2^52, no overflow, no float boundary).
    """
    h = hash_u32(F.col(key_col))
    joined = pages.join(F.broadcast(rates), host_col, "left")
    ppm = F.coalesce(F.col("keep_ppm"), F.lit(0)).cast("bigint")
    return joined.select(
        F.col(key_col).cast("bigint").alias("doc_id"),
        F.col(host_col).alias("host"),
        ppm.alias("keep_ppm"),
        (h * F.lit(_PPM) < ppm * F.lit(_U32)).alias("kept"),
    )


def pack_sequences(docs: DataFrame, seq_len: int = 512,
                   n_shards: int = 16,
                   text_col: str = "text") -> DataFrame:
    """(doc_id, shard, n_tokens, bin_id, offset_in_bin) — greedy
    concat-and-chunk packing of documents into fixed ``seq_len``
    token bins, independently per shard.

    ``bin_id`` is the bin the document *starts* in; ``offset_in_bin``
    its start offset. Documents may span bin boundaries (the
    concatenate-then-split training layout, not first-fit binning).
    One shuffle (the shard-partitioned window); shards bound both the
    sort size and the skew: doc_id mod n_shards is uniform by
    construction of the id space.
    """
    from docling_serve_spark.operators.textstats import token_count

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = docs.select(
        F.col("doc_id").cast("bigint"),
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("bigint").alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / seq_len).cast("bigint").alias("bin_id"),
        F.pmod(start, F.lit(seq_len)).cast("bigint").alias("offset_in_bin"),
    )
