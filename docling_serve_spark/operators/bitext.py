"""Parallel-document (bitext) candidate scoring — the filtering step
between hreflang candidate mining (X52) and an aligned corpus.

ParaCrawl's pipeline (Bañón et al., ACL 2020) and the earlier
Buck & Koehn WMT16 document-alignment task both score candidate page
pairs with translation-invariant surface signals before any MT/LASER
model sees them; the two cheapest and strongest are used here:

  - LENGTH BAND (Gale & Church 1993's underlying assumption):
    translations have comparable lengths — a pair where one side is
    more than 2x the other is overwhelmingly not parallel;
  - SHARED-NUMERAL OVERLAP: digit strings (dates, prices, scores,
    phone numbers) survive translation verbatim, so the Jaccard of
    the two pages' numeral SETS is a language-independent content
    fingerprint.

Both signals are integer-exact (cross-multiplied band test, basis-
point Jaccard on distinct numeral sets) — bit-reproducible across
engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _numerals(col: Column) -> Column:
    """Distinct digit-run set of a text (sorted for determinism)."""
    return F.array_sort(
        F.array_distinct(
            F.regexp_extract_all(col, F.lit(r"\d+"), F.lit(0))
        )
    )


def bitext_align_scores(pairs: DataFrame, a_col: str = "text_a",
                        b_col: str = "text_b",
                        min_num_jaccard_bp: int = 5000) -> DataFrame:
    """(… pair key columns …, len_a, len_b, len_ok, n_nums_a,
    n_nums_b, num_jaccard_bp, plausible) — score hreflang/URL-mined
    candidate page pairs for parallel-document plausibility.

    ``len_ok``: each side at most 2x the other (chars; cross-
    multiplied, no division). ``num_jaccard_bp``: basis-point Jaccard
    of the distinct numeral sets; pairs where BOTH sides carry no
    numerals pass that test vacuously (no evidence against), pairs
    where exactly one side has numerals score 0. ``plausible`` =
    length band AND numeral evidence ≥ ``min_num_jaccard_bp``.

    Scale shape: a pure narrow map over the joined candidate table —
    the expensive part of bitext mining is building the pairs (X52
    does it with one distinct); scoring rides that result with zero
    additional shuffles, array ops all codegen."""
    la, lb = F.length(a_col), F.length(b_col)
    len_ok = (la <= 2 * lb) & (lb <= 2 * la)
    na, nb = _numerals(F.col(a_col)), _numerals(F.col(b_col))
    union = F.size(F.array_distinct(F.concat(na, nb)))
    jacc_bp = F.when(union == 0, F.lit(10000)).otherwise(
        F.expr(
            f"(10000 * size(array_intersect({_na_sql(a_col)}, "
            f"{_na_sql(b_col)}))) div "
            f"size(array_distinct(concat({_na_sql(a_col)}, "
            f"{_na_sql(b_col)})))"
        )
    )
    keep = [c for c in pairs.columns if c not in (a_col, b_col)]
    return pairs.select(
        *keep,
        la.cast("bigint").alias("len_a"),
        lb.cast("bigint").alias("len_b"),
        len_ok.alias("len_ok"),
        F.size(na).cast("bigint").alias("n_nums_a"),
        F.size(nb).cast("bigint").alias("n_nums_b"),
        jacc_bp.cast("bigint").alias("num_jaccard_bp"),
        (len_ok & (jacc_bp >= min_num_jaccard_bp)).alias("plausible"),
    )


def _na_sql(col: str) -> str:
    """SQL text of the distinct-sorted numeral set (the expr twin of
    ``_numerals``, needed because ``div`` is expression-only)."""
    return (
        f"array_sort(array_distinct("
        f"regexp_extract_all({col}, '\\\\d+', 0)))"
    )


_LANG_SEG = (
    "en|fr|de|es|it|pt|ru|zh|ja|ko|ar|nl|pl|tr"
)


def bitext_url_pairs(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, path_key, lang_a, url_a, lang_b, url_b) — CCAligned-
    style parallel-document candidate generation (El-Kishky et al.,
    EMNLP 2020 §2: candidates are url pairs on the SAME host whose
    paths differ ONLY by a language token): the path's language
    segment is normalized to '*' to form the pair key, then urls
    sharing (host, key) with different language segments pair up.
    This is the GENERATION half X63 scores — hreflang (X52) finds the
    pairs publishers annotate; this finds the unannotated majority
    that follow /en/..., /fr/... URL conventions.

    One url per (host, key, lang) survives (min-url dedup) so a
    (host, key) group holds at most one row per language — the self-
    join is bounded by langs², never by page counts; equi-join on
    (host, key), plan-never-cartesian. Narrow regexp maps otherwise."""
    from docling_serve_spark.operators.urltools import url_host

    pat = f"(^|/)({_LANG_SEG})(/|$)"
    path = F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/]+(/.*)$", 1)
    seg = F.regexp_extract(path, pat, 2)
    keyed = (
        pages.select(
            url_host(F.col(url_col)).alias("host"),
            F.regexp_replace(path, pat, "$1*$3").alias("path_key"),
            seg.alias("lang_seg"),
            F.col(url_col).alias("u"),
        )
        .filter(F.col("lang_seg") != "")
        .groupBy("host", "path_key", "lang_seg")
        .agg(F.min("u").alias("u"))
    )
    a = keyed.select(
        "host", "path_key",
        F.col("lang_seg").alias("lang_a"), F.col("u").alias("url_a"),
    )
    b = keyed.select(
        "host", "path_key",
        F.col("lang_seg").alias("lang_b"), F.col("u").alias("url_b"),
    )
    return (
        a.join(b, ["host", "path_key"])
        .filter(F.col("lang_a") < F.col("lang_b"))
        .orderBy("host", "path_key", "lang_a", "lang_b")
    )
