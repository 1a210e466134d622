"""Columnar quality analysis + OCR dispatch (operators F3-F10) as
pure JVM-side Spark SQL — no Python in the hot path.

Same math as extract/quality.py (and the reference's
pdf_analysis.py:75-141), expressed with built-in functions so the
whole stage stays inside WholeStageCodegen: Unicode-category counts
via regexp_replace length arithmetic, escape/space-run counts via
regexp_count. Cross-checked value-exact against DuckDB RE2 and Python
unicodedata on the sf0.01 documents table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

REPLACEMENT_CHAR = "�"


def quality_columns(text: Column) -> dict[str, Column]:
    """F3-F7 counts for one text sample column."""
    length = F.length(text)
    control_cnt = length - F.length(F.regexp_replace(text, r"\p{C}", ""))
    symbol_cnt = length - F.length(F.regexp_replace(text, r"[\p{P}\p{S}]", ""))
    escape_cnt = F.regexp_count(text, F.lit(r"\\[0-9a-fA-F]{2}"))
    space_total = length - F.length(F.replace(text, F.lit(" "), F.lit("")))
    space_runs = F.regexp_count(text, F.lit(" {1,10}"))
    repl_cnt = length - F.length(
        F.replace(text, F.lit(REPLACEMENT_CHAR), F.lit(""))
    )
    return {
        "n_chars_q": length,
        "control_cnt": control_cnt,
        "symbol_cnt": symbol_cnt,
        "escape_cnt": escape_cnt,
        "space_total": space_total,
        "space_runs": space_runs,
        "repl_cnt": repl_cnt,
    }


def indicator_points(c: dict[str, Column]) -> Column:
    """F3-F7 -> indicator points (pdf_analysis.py weights: escape
    sequences count double, each replacement char adds one)."""
    length = F.greatest(c["n_chars_q"], F.lit(1))
    pts = (
        F.when(c["control_cnt"] / length > 0.03, 1).otherwise(0)
        + F.when(c["symbol_cnt"] / length > 0.30, 1).otherwise(0)
        + F.when(c["escape_cnt"] > 5, 2).otherwise(0)
        + F.when(
            (c["space_runs"] > 0)
            & (c["space_total"] / F.greatest(c["space_runs"], F.lit(1)) > 2.5),
            1,
        ).otherwise(0)
        + c["repl_cnt"]
    )
    return pts.cast("int")


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds quality_points + text_quality columns (one row = one
    sample, so score == points; F8 threshold 0.8)."""
    cols = quality_columns(F.col(text_col))
    pts = indicator_points(cols)
    return (
        df.withColumn("quality_points", pts)
        .withColumn(
            "text_quality",
            F.when(F.length(F.col(text_col)) == 0, "unknown")
            .when(pts > 0.8, F.lit("poor"))
            .otherwise(F.lit("good")),
        )
    )


def recommended_mode(
    has_text: Column, is_tagged: Column, text_quality: Column
) -> Column:
    """F9 — the OCR-mode decision tree as nested CASE
    (pdf_analysis.py:128-141)."""
    return (
        F.when(is_tagged & has_text & (text_quality != "poor"), "skip")
        .when(has_text & (text_quality == "poor"), "force")
        .when(has_text & ~is_tagged, "redo")
        .otherwise("force")
    )


# The same logic as portable ANSI SQL for the DuckDB oracle twins.
QUALITY_COUNTS_SQL = r"""
  length({t}) AS n_chars_q,
  length({t}) - length(regexp_replace({t}, '\p{{C}}', '', 'g')) AS control_cnt,
  length({t}) - length(regexp_replace({t}, '[\p{{P}}\p{{S}}]', '', 'g')) AS symbol_cnt,
  length(regexp_extract_all({t}, '\\[0-9a-fA-F]{{2}}')) AS escape_cnt,
  length({t}) - length(replace({t}, ' ', '')) AS space_total,
  length(regexp_extract_all({t}, ' {{1,10}}')) AS space_runs,
  length({t}) - length(replace({t}, chr(65533), '')) AS repl_cnt
"""

QUALITY_POINTS_SQL = """
  (CASE WHEN control_cnt * 1.0 / greatest(n_chars_q, 1) > 0.03 THEN 1 ELSE 0 END
   + CASE WHEN symbol_cnt * 1.0 / greatest(n_chars_q, 1) > 0.30 THEN 1 ELSE 0 END
   + CASE WHEN escape_cnt > 5 THEN 2 ELSE 0 END
   + CASE WHEN space_runs > 0
          AND space_total * 1.0 / greatest(space_runs, 1) > 2.5 THEN 1 ELSE 0 END
   + repl_cnt)
"""
