"""Columnar (JVM-side) forms of the A5 export-channel downgrades
(reference:docling_serve/response_preparation.py:24-71): markdown ->
{text, html, doctags} when only a markdown channel exists.

These mirror ``docling_serve_spark.extract.postprocess`` byte-for-byte
but stay inside WholeStageCodegen — pure ``regexp_replace`` / concat
expressions, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A5 text downgrade: strip markdown decoration chars, collapse
# newline runs, trim outer whitespace (response_preparation.py:60-65).
_MD_STRIP = r"[#*_`\[\]()]"
_NL_RUNS = r"\n+"
_OUTER_WS = r"^\s+|\s+$"


def md_to_text(md: Column) -> Column:
    stripped = F.regexp_replace(md, _MD_STRIP, "")
    collapsed = F.regexp_replace(stripped, _NL_RUNS, "\n")
    return F.regexp_replace(collapsed, _OUTER_WS, "")


def md_to_html(md: Column) -> Column:
    """``<pre>`` fallback html (response_preparation.py:58)."""
    return F.concat(F.lit("<pre>"), md, F.lit("</pre>"))


def md_to_doctags(md: Column) -> Column:
    """doctags fallback wrapper (response_preparation.py:69)."""
    return F.concat(F.lit("<document>"), md, F.lit("</document>"))
