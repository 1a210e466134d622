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


# --------------------------------------------------------------------- #
# Mojibake (encoding-damage) detection
# --------------------------------------------------------------------- #

#: The classic UTF-8-bytes-decoded-as-Latin-1/cp1252 artifacts. A
#: 2-byte UTF-8 sequence mis-decoded this way starts with \u00c3 or
#: \u00c2 followed by another high-Latin-1 char (all accented Latin
#: letters land here); 3-byte sequences (curly quotes, dashes) show as
#: \u00e2\u20ac + one more char; a replacement char that was itself
#: re-encoded shows as \u00ef\u00bf\u00bd. Clean text essentially
#: never contains these adjacencies, which makes them high-precision
#: signatures (the OSCAR and CCNet cleanups discuss exactly this
#: damage class).
MOJIBAKE_PATTERNS = {
    "two_byte": "[\u00c3\u00c2][\u00a0-\u00ff]",
    "three_byte": "\u00e2\u20ac.",
    "replacement": "\u00ef\u00bf\u00bd|\ufffd",
}


def mojibake_stats(docs, text_col: str = "text", id_col: str = "doc_id",
                   per_10k_threshold: int = 20):
    """(doc_id, n_two_byte, n_three_byte, n_replacement, n_chars,
    mojibake_per_10k, is_mojibake) — encoding-damage detection over
    the corpus: counts of the three classic mis-decoding signatures,
    a per-10k-chars integer rate, and a threshold verdict.

    Double-decoded text (UTF-8 bytes read as Latin-1/cp1252 somewhere
    in a crawl pipeline, then re-encoded) is a standard web-corpus
    defect; a damaged document poisons token statistics and survives
    exact dedup against its clean twin, so pipelines flag it before
    any content pass. Detection only — repair requires a byte-level
    round-trip (an Arrow UDF like `normalize_corpus`'s NFC stage) and
    is a deliberate non-goal: at corpus scale damaged docs are dropped
    or re-fetched, not patched.

    Integer-exactness: rate = (10^4 * hits) div chars — bigint
    integral division, exact past 2^53; the verdict
    hits * 10^4 >= threshold * chars is pure int64 arithmetic (empty
    docs clamp the denominator to 1). Pure codegen narrow map —
    regexp counts ride the scan stage, no shuffle, no Python."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        .cast("bigint")
        for name, pat in MOJIBAKE_PATTERNS.items()
    }
    base = docs.select(
        id_col,
        counts["two_byte"].alias("n_two_byte"),
        counts["three_byte"].alias("n_three_byte"),
        counts["replacement"].alias("n_replacement"),
        F.length(t).cast("bigint").alias("n_chars"),
    )
    hits = (F.col("n_two_byte") + F.col("n_three_byte")
            + F.col("n_replacement"))
    return base.select(
        id_col, "n_two_byte", "n_three_byte", "n_replacement", "n_chars",
        F.expr(
            "((n_two_byte + n_three_byte + n_replacement) * 10000) "
            "div greatest(n_chars, 1)"
        ).cast("bigint").alias("mojibake_per_10k"),
        (hits * 10000 >= F.lit(per_10k_threshold)
         * F.greatest(F.col("n_chars"), F.lit(1)))
        .alias("is_mojibake"),
    )


#: unresolved HTML entity shapes in EXTRACTED text: named
#: (&amp; &nbsp; …), decimal (&#39;) and hex (&#x27;) character
#: references. Word-boundary-free on purpose — any occurrence in
#: plain text is residue.
ENTITY_RESIDUE_PATTERN = r"&(?:[A-Za-z][A-Za-z0-9]{1,30}|#[0-9]{1,7}|#[xX][0-9A-Fa-f]{1,6});"


def entity_residue_stats(docs, text_col: str = "text",
                         id_col: str = "doc_id",
                         per_10k_threshold: int = 10):
    """(doc_id, n_entities, n_chars, residue_per_10k, has_residue) —
    unresolved HTML-entity residue in EXTRACTED text: ``&amp;``,
    ``&#39;``, ``&#x27;`` surviving into the text channel is the
    classic broken-extractor signature (an entity-decode stage skipped
    somewhere upstream — C4's cleaning and every readability library
    decode entities, so residue means a pipeline regression, not page
    content). The per-10k rate separates a stray literal ``&amp;`` in
    prose (real pages legitimately discuss HTML) from systematic
    residue; the mojibake audit (X48) covers byte-level damage, this
    covers the markup-level twin. Rolled up per host the rate
    pinpoints WHICH feed's extractor regressed.

    Integer-exactness and plan shape match ``mojibake_stats``:
    rate = (10^4 · hits) div chars in bigint, verdict
    hits·10^4 >= threshold·chars, one codegen narrow map — regexp
    counts ride the scan stage, no shuffle, no Python."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    base = docs.select(
        id_col,
        F.size(F.regexp_extract_all(t, F.lit(ENTITY_RESIDUE_PATTERN),
                                    F.lit(0)))
        .cast("bigint").alias("n_entities"),
        F.length(t).cast("bigint").alias("n_chars"),
    )
    return base.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        "n_entities", "n_chars",
        F.expr("(10000 * n_entities) div greatest(n_chars, 1)")
        .cast("bigint").alias("residue_per_10k"),
        F.expr(f"n_entities * 10000 >= {per_10k_threshold} "
               "* greatest(n_chars, 1)").alias("has_residue"),
    )


#: a whitespace-delimited token mixing Latin and Cyrillic letters —
#: the UTS #39 single-script-confusable shape ('pаypаl' with Cyrillic
#: а). Ranges written as literal characters so the same pattern
#: compiles identically under Java regex and RE2 (script-class NAMES
#: differ between the engines: \p{IsCyrillic} vs \p{Cyrillic}).
MIXED_SCRIPT_TOKEN = (
    "[A-Za-z][^ \\t\\n]*[Ѐ-ӿ]|[Ѐ-ӿ][^ \\t\\n]*[A-Za-z]"
)


def mixed_script_stats(docs, text_col: str = "text",
                       id_col: str = "doc_id"):
    """(doc_id, n_latin, n_cyrillic, n_mixed_tokens, is_suspect) —
    homoglyph/mixed-script spam detection: tokens blending Latin and
    Cyrillic letters are the classic confusable-substitution evasion
    (UTS #39 'single-script confusables'; spam and phishing corpora
    swap а/е/о/р/с for their Latin twins to slip past exact and
    n-gram filters while rendering identically). A document with ANY
    such token is flagged: legitimate multilingual text switches
    scripts BETWEEN words, not inside them — mid-token script mixing
    essentially does not occur in clean prose, which is what makes
    this a high-precision gate where whole-doc script ratios are
    noise. The per-script letter counts let downstream tell a
    Russian/English bilingual page (both high, zero mixed tokens)
    from an attack (mixed tokens present).

    One codegen narrow map — three regexp counts riding the scan
    stage; no shuffle, no Python; bigint counts."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    return docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        (F.length(t) - F.length(F.regexp_replace(t, "[A-Za-z]", "")))
        .cast("bigint").alias("n_latin"),
        (F.length(t) - F.length(F.regexp_replace(t, "[Ѐ-ӿ]", "")))
        .cast("bigint").alias("n_cyrillic"),
        F.size(F.regexp_extract_all(t, F.lit(MIXED_SCRIPT_TOKEN), F.lit(0)))
        .cast("bigint").alias("n_mixed_tokens"),
        (F.size(F.regexp_extract_all(t, F.lit(MIXED_SCRIPT_TOKEN),
                                     F.lit(0))) > 0).alias("is_suspect"),
    )


#: zero-width and invisible formatting codepoints: ZWSP/ZWNJ/ZWJ,
#: word-joiner, BOM-as-ZWNBSP, soft hyphen, and the bidi embedding
#: controls. Written as literal characters (same Java/RE2 portability
#: argument as MIXED_SCRIPT_TOKEN).
INVISIBLE_CHAR_CLASS = "[​‌‍⁠﻿­‪-‮]"


def invisible_char_stats(docs, text_col: str = "text",
                         id_col: str = "doc_id",
                         per_10k_threshold: int = 20):
    """(doc_id, n_invisible, n_chars, invisible_per_10k, is_suspect)
    — invisible-codepoint density: zero-width spaces/joiners, word
    joiners, BOMs, soft hyphens, and bidi embedding controls in the
    text channel. Legitimate uses exist (ZWJ in emoji/Indic scripts,
    soft hyphens in typeset text), but DENSITY is the tell: SEO
    cloaking and text watermarking interleave zero-width characters
    through prose to evade exact/n-gram matching (the same evasion
    budget as X118's homoglyphs, through the invisible channel), and
    they silently corrupt tokenizer statistics either way — a ZWSP
    inside a word splits it into two tokens no human sees. Completes
    the character-pathology family: X48 byte damage, X113 markup
    residue, X118 confusable scripts, this the invisible layer.

    Same shape and integer discipline as the siblings: one codegen
    narrow map, (10^4 · hits) div chars in bigint, verdict without
    division."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    hits = (
        F.length(t) - F.length(F.regexp_replace(t, INVISIBLE_CHAR_CLASS, ""))
    ).cast("bigint")
    return docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        hits.alias("n_invisible"),
        F.length(t).cast("bigint").alias("n_chars"),
        F.expr(
            "(10000 * (length(text) - length(regexp_replace(text, "
            f"'{INVISIBLE_CHAR_CLASS}', '')))) div greatest(length(text), 1)"
        ).cast("bigint").alias("invisible_per_10k"),
        F.expr(
            "(length(text) - length(regexp_replace(text, "
            f"'{INVISIBLE_CHAR_CLASS}', ''))) * 10000 "
            f">= {per_10k_threshold} * greatest(length(text), 1)"
        ).alias("is_suspect"),
    )


def charset_decl_stats(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """(host, n_pages, n_declared, n_utf8, n_legacy, legacy_bp,
    top_legacy) — charset-declaration audit per host: what each host
    CLAIMS its bytes are (``<meta charset=…>`` or the http-equiv
    content-type form, first declaration wins per the WHATWG
    prescan), split into utf-8 vs legacy (windows-125x, iso-8859-x,
    gbk/big5/shift_jis/koi8…). Legacy-declaring hosts are where X48's
    mojibake actually comes from — the extractor needs a transcode
    pass THERE, and a host whose declarations disagree with its bytes
    (declared legacy, mojibake clean, or the reverse) is serving
    mislabeled content. No decoding happens here: a 10^12-page audit
    reads declarations, the flagged subset gets the real transcode.

    Two regexp extracts riding the scan (quote style both ways), ONE
    host partial agg + a top-legacy window over the tiny (host,
    charset) table."""
    from pyspark.sql import Window

    from docling_serve_spark.operators.urltools import url_host

    h = F.lower(F.col(html_col).cast("string"))
    decl = F.coalesce(
        F.nullif(F.regexp_extract(
            h, r'<meta\s+charset\s*=\s*["\']?\s*([a-z0-9._-]+)', 1), F.lit("")),
        F.nullif(F.regexp_extract(
            h, r'content\s*=\s*["\'][^"\']*charset=([a-z0-9._-]+)', 1),
            F.lit("")),
    )
    base = pages.select(
        url_host(F.col(url_col)).alias("host"),
        decl.alias("charset"),
    ).select(
        "host", "charset",
        F.col("charset").isNotNull().alias("declared"),
        (F.col("charset").isin("utf-8", "utf8")).alias("is_utf8"),
    )
    per_host = base.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.sum(F.when(F.col("declared"), 1).otherwise(0))
        .cast("bigint").alias("n_declared"),
        F.sum(F.when(F.col("is_utf8"), 1).otherwise(0))
        .cast("bigint").alias("n_utf8"),
        F.sum(F.when(F.col("declared") & ~F.col("is_utf8"), 1)
              .otherwise(0)).cast("bigint").alias("n_legacy"),
    )
    legacy = (
        base.filter(F.col("declared") & ~F.col("is_utf8"))
        .groupBy("host", "charset")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n").desc(), F.col("charset").asc()
    )
    top = legacy.withColumn("rn", F.row_number().over(w)) \
        .filter(F.col("rn") == 1) \
        .select("host", F.col("charset").alias("top_legacy"))
    return (
        per_host.join(top, "host", "left")
        .select(
            "host", "n_pages", "n_declared", "n_utf8", "n_legacy",
            F.expr("(10000 * n_legacy) div greatest(n_pages, 1)")
            .cast("bigint").alias("legacy_bp"),
            F.coalesce("top_legacy", F.lit("")).alias("top_legacy"),
        )
        .orderBy("host")
    )
