"""The extraction pipeline Spark stage (SURVEY.md §3.4).

Reads the pages table ``(url, warc_ts, html, text, lang)`` and
produces one result row per page — the Spark form of the reference's
worker body (reference:engines/async_local/worker.py:85-257), with the
whole per-document conversion inside ONE Arrow-batched ``mapInPandas``
stage (the per-row compute is opaque to Catalyst by design; everything
around it — routing, projection, bucketing — is declarative so
Catalyst prunes columns and pushes filters into the scan).

Skew handling (the reference has none — naive contiguous slicing at
kfp_pipeline.py:36 would put ten 200-page PDFs in one batch). Two
modes, chosen by ``split_heavy``:

DEFAULT (single-pass): ONE mapInPandas stage over ONE scan of the
input — scan -> extract -> write, zero shuffles, and the input is
read exactly once (a branched plan re-executes the source per
branch; Spark only shares subplans across branches at an exchange).
Skew is bounded by INPUT SPLIT SIZE, not by rerouting rows: heavy
docs (PDFs, ~2% of a crawl) arriving i.i.d. average out within any
128 MB split (Poisson: a ~2000-doc split holds 40±6 PDFs — ±15%
task-time variance, not a straggler); the worst case — a shard that
is ALL heavy docs — is still capped at maxPartitionBytes of heavy
bytes per task (session.get_spark exposes the knob; 128 MB ≈ 60 s
at the measured ~2 MB/s/core). This is the plan to run at 100 TB.

OPT-IN (``split_heavy=True``): the round-1/2 two-bucket shape —
JVM-side routing on the first 4 bytes + byte length sends small
HTML to a shuffle-free LIGHT branch and PDFs/oversized rows to a
HEAVY branch salted round-robin across the cluster. Strictly better
task balance when heavy rows arrive in long contiguous runs AND
splits cannot be shrunk, but it costs a SECOND full scan of the
input (both branches read the source; the heavy predicate is not
parquet-pushable). At 100 TB that is +100 TB of object-store reads
to save a straggler tail that split sizing already bounds — hence
not the default.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, functions as F

from docling_serve_spark.extract.core import ExtractOptions, extract_document

if TYPE_CHECKING:
    import pandas as pd

# Output schema: DocumentResponse ⊕ analysis ⊕ counters (SURVEY.md §1.3)
RESULT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, "
    "status string, doc_type string, "
    "extracted_text string, md_content string, html_content string, "
    "doctags_content string, json_content string, spans_json string, "
    "num_pages int, n_items int, n_bytes bigint, "
    "has_text boolean, is_tagged boolean, text_quality string, "
    "quality_score double, recommended_mode string, "
    "force_ocr_effective boolean, ocr_invoked boolean, "
    "arabic_dispatched boolean, ai_vision_triggered boolean, "
    "ocrmypdf_performed boolean, error string"
)

_RESULT_COLS = [f.split()[0] for f in RESULT_SCHEMA.split(", ")]

# Rows above this byte size go to the heavy bucket even if HTML.
HEAVY_BYTES = 256 * 1024


def _extract_batches(opts: ExtractOptions):
    """Arrow-batch worker: pandas DataFrames in, result frames out.
    The options object rides the closure (the Spark analog of the
    reference's broadcast ConvertDocumentsOptions, SURVEY.md §1.3)."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, ts, html, lang in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"]
            ):
                data = bytes(html) if html is not None else b""
                r = extract_document(data, name=url, lang=lang or "", opts=opts)
                rows.append(
                    (
                        url,
                        ts,
                        lang,
                        r.status,
                        r.doc_type,
                        r.extracted_text,
                        r.md_content,
                        r.html_content,
                        r.doctags_content,
                        r.json_content,
                        r.spans_json,
                        r.num_pages,
                        r.n_items,
                        len(data),
                        r.has_text,
                        r.is_tagged,
                        r.text_quality,
                        r.quality_score,
                        r.recommended_mode,
                        r.force_ocr_effective,
                        r.ocr_invoked,
                        r.arabic_dispatched,
                        r.ai_vision_triggered,
                        r.ocrmypdf_performed,
                        r.error,
                    )
                )
            yield pd.DataFrame(rows, columns=_RESULT_COLS)

    return fn


def heavy_predicate():
    """JVM-side routing predicate (operator S4's bucketing hook):
    first 4 bytes == %PDF, or oversize row."""
    return (F.substring("html", 1, 4) == F.lit(b"%PDF")) | (
        F.length("html") > F.lit(HEAVY_BYTES)
    )


def run_extraction(
    pages: DataFrame,
    opts: ExtractOptions | None = None,
    heavy_partitions: int | None = None,
    split_heavy: bool = False,
) -> DataFrame:
    """pages (url, warc_ts, html, text, lang) -> result rows.

    Column pruning: only the 4 needed columns enter the UDF ('text'
    — the crawler's noisy text — is dropped before the scan so the
    parquet reader never materializes it).

    Default is the single-pass plan (one scan, zero shuffles; skew
    bounded by input split size — module docstring); ``split_heavy``
    opts into the salted two-bucket plan for corpora with long
    contiguous heavy runs, at the cost of a second input scan.
    """
    opts = opts or ExtractOptions()
    src = pages.select("url", "warc_ts", "html", "lang")
    fn = _extract_batches(opts)

    if not split_heavy:
        return src.mapInPandas(fn, schema=RESULT_SCHEMA)

    light = src.filter(~heavy_predicate()).mapInPandas(fn, schema=RESULT_SCHEMA)

    heavy = src.filter(heavy_predicate())
    if heavy_partitions:
        heavy = heavy.repartition(heavy_partitions)
    else:
        # spread heavy rows evenly: hash-of-url round robin kills runs
        # of adjacent heavy rows that naive slicing would co-locate.
        # 4x the shuffle width: heavy rows cost ~50x a light row, so
        # shorter tasks smooth the stage's straggler tail.
        heavy = heavy.repartition(
            4 * int(pages.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            F.pmod(F.xxhash64("url"), F.lit(1 << 16)),
        )
    heavy = heavy.mapInPandas(fn, schema=RESULT_SCHEMA)

    return light.unionByName(heavy)
