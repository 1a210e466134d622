"""Unicode text normalization for the training-data tier: NFC
composition, accent folding, control-char strip, whitespace collapse.

Every large-corpus pipeline normalizes text before dedup/tokenization
(C4, RefinedWeb, Dolma all NFC- or NFKC-normalize); without it the
same page crawled twice — once NFC, once NFD — hashes differently and
escapes exact dedup entirely.

Split of work:
- control strip + whitespace collapse + trim run JVM-side
  (``regexp_replace``, WholeStageCodegen) so the Python boundary sees
  the smallest possible strings;
- NFC + accent folding have no Spark built-in, so they run in ONE
  Arrow-vectorized pandas UDF returning a struct (one Python round
  trip per batch, two derived columns).

Accent folding is NFD-decompose-then-drop-combining-marks — verified
character-for-character equal to DuckDB's ``strip_accents`` (the
oracle) on Latin diacritics, precomposed + combining forms, and
non-Latin scripts (which pass through untouched).

At 100 TB this is a pure map stage: no shuffle, no state, Arrow
batches bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

# explicit codepoint classes (identical RE2/Java semantics; no \s so
# both engines agree exactly on what counts as whitespace)
_CTRL_RE = r"[\x00-\x08\x0E-\x1F\x7F]"
_WS_RE = r"[ \t\n\r\f\x0B]+"


def clean_whitespace(col: Column) -> Column:
    """JVM-side cleanup: drop C0 controls (keeping \\t \\n \\r, which
    the next step folds anyway), collapse whitespace runs to one
    space, trim. Codegen end to end."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(col, _CTRL_RE, ""), _WS_RE, " ")
    )


def _fold_accents(s: str) -> str:
    """NFD-decompose and drop combining marks (== DuckDB
    strip_accents; 'école'→'ecole', 'ø'/'ß'/Arabic unchanged)."""
    return "".join(
        c for c in unicodedata.normalize("NFD", s) if not unicodedata.combining(c)
    )


# typed StructType (not a DDL string) so the UDF can be defined at
# import time without an active SparkSession
_NF_SCHEMA = T.StructType(
    [
        T.StructField("norm_text", T.StringType()),
        T.StructField("folded_text", T.StringType()),
    ]
)


@F.pandas_udf(_NF_SCHEMA)
def _nfc_fold(batch: pd.Series) -> pd.DataFrame:
    norm = batch.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )
    folded = norm.map(lambda x: _fold_accents(x) if x is not None else None)
    return pd.DataFrame({"norm_text": norm, "folded_text": folded})


def normalize_corpus(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document normalization audit: ``norm_text`` (control-strip,
    ws-collapse, trim, NFC), ``folded_text`` (accents dropped on top),
    ``changed`` (did normalization alter the original), ``norm_fp``
    (md5 of the normalized text — the key exact dedup should use).

    Pure narrow map over the corpus: Catalyst prunes the scan to
    (doc_id, text); the pandas UDF is the only Python stage and
    returns both derived columns from a single Arrow pass."""
    cleaned = docs.withColumn("__clean", clean_whitespace(F.col(text_col)))
    both = cleaned.withColumn("__nf", _nfc_fold(F.col("__clean")))
    return both.select(
        *[c for c in docs.columns if c != text_col],
        F.col("__nf.norm_text").alias("norm_text"),
        F.col("__nf.folded_text").alias("folded_text"),
        (F.col("__nf.norm_text") != F.col(text_col)).alias("changed"),
        F.md5(F.col("__nf.norm_text")).alias("norm_fp"),
    )
