"""End-to-end Spark pipeline tests: byte-identity vs the single-node
oracle (the north-rule invariant), bucketing, order-independence."""

import pytest

from docling_serve_spark.extract.core import extract_document
from docling_serve_spark.operators.extract_stage import run_extraction
from docling_serve_spark.sources.pages import build_pages_df, gen_page

N = 120  # small but covers html/degenerate/pdf mix


@pytest.fixture(scope="module")
def results(spark):
    pages = build_pages_df(spark, N, partitions=6)
    return {r["url"]: r for r in run_extraction(pages).collect()}


def test_row_count_preserved(results):
    assert len(results) == N


def test_byte_identical_to_oracle(results):
    """Every url's extracted_text (and md/spans) matches the pure
    single-node extractor byte-for-byte."""
    for i in range(N):
        row = gen_page(i)
        oracle = extract_document(row["html"], name=row["url"], lang=row["lang"])
        got = results[row["url"]]
        assert got["extracted_text"] == oracle.extracted_text, row["url"]
        assert got["md_content"] == oracle.md_content, row["url"]
        assert got["spans_json"] == oracle.spans_json, row["url"]
        assert got["status"] == oracle.status
        assert got["doc_type"] == oracle.doc_type


def test_statuses_partition_rows(results):
    statuses = {r["status"] for r in results.values()}
    assert statuses <= {"success", "failure", "skipped"}
    n_success = sum(1 for r in results.values() if r["status"] == "success")
    assert n_success > 0.85 * N  # degenerate bucket is ~8-10%


def test_pdf_rows_have_dispatch(results):
    pdfs = [r for r in results.values() if r["doc_type"] == "pdf"]
    assert pdfs, "corpus should contain pdf rows"
    for r in pdfs:
        assert r["recommended_mode"] in ("skip", "redo", "force")
        assert r["ocr_invoked"] == (r["recommended_mode"] != "skip")
        assert r["num_pages"] >= 10


def test_order_independence(spark, results):
    """Property test (SURVEY.md §5.2 item 5): shuffling input rows
    yields identical per-url outputs."""
    pages = build_pages_df(spark, N, partitions=6).orderBy("lang", "url")
    again = {r["url"]: r for r in run_extraction(pages).collect()}
    for url, r in results.items():
        assert again[url]["extracted_text"] == r["extracted_text"]


def test_counters_reconcile(results):
    # num_processed == num_succeeded + num_failed (callback.py invariant)
    n = len(results)
    ok = sum(1 for r in results.values() if r["status"] == "success")
    bad = sum(1 for r in results.values() if r["status"] != "success")
    assert ok + bad == n


def test_split_heavy_mode_matches_single_pass(spark):
    """Opt-in salted two-bucket plan is byte-identical to the default
    single-pass plan; only the execution shape differs."""
    from docling_serve_spark.sources.pages import build_pages_df

    pages = build_pages_df(spark, 120, partitions=4)
    single = {r["url"]: (r["status"], r["extracted_text"])
              for r in run_extraction(pages).collect()}
    split = {r["url"]: (r["status"], r["extracted_text"])
             for r in run_extraction(pages, split_heavy=True).collect()}
    assert single == split
