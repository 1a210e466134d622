"""Per-row conversion core (sniff, routing, guards, containment)."""

from docling_serve_spark.extract.core import (
    ExtractOptions,
    extract_document,
    sniff_doc_type,
)
from docling_serve_spark.sources.pages import gen_page


def test_sniff():
    assert sniff_doc_type(b"%PDF-1.4\n...") == "pdf"
    assert sniff_doc_type(b"<!DOCTYPE html><html>") == "html"
    assert sniff_doc_type(b"  \n<HTML><body>") == "html"
    assert sniff_doc_type(b"<div>fragment</div>") == "html"
    assert sniff_doc_type(b"\xff\xfe\x00\x01") == "unknown"
    assert sniff_doc_type(b"") == "unknown"


def test_empty_input_fails_cleanly():
    r = extract_document(b"")
    assert r.status == "failure" and r.error == "empty input"


def test_oversize_guard_skips():
    # F13 — reference caps at 200MB (ocrmypdf_settings.py:32); use a
    # tiny cap to exercise the route
    opts = ExtractOptions(max_file_size_bytes=10)
    r = extract_document(b"<html><body><p>hello</p></body></html>", opts=opts)
    assert r.status == "skipped" and "max_file_size" in r.error


def test_max_pages_guard():
    row = next(
        gen_page(i) for i in range(500) if gen_page(i)["html"].startswith(b"%PDF")
    )
    r = extract_document(row["html"], opts=ExtractOptions(max_num_pages=2))
    assert r.status == "skipped" and "max_num_pages" in r.error


def test_pdf_row_has_analysis_fields():
    row = next(
        gen_page(i) for i in range(500) if gen_page(i)["html"].startswith(b"%PDF")
    )
    r = extract_document(row["html"], name=row["url"], lang=row["lang"])
    assert r.status == "success"
    assert r.doc_type == "pdf"
    assert r.recommended_mode in ("skip", "redo", "force")
    assert r.has_text
    assert r.num_pages >= 10
    # ocr dispatch consistent with the F9/F10 rules
    assert r.ocr_invoked == (r.recommended_mode != "skip")


def test_html_row_channels_populated():
    row = gen_page(3)
    r = extract_document(
        row["html"], name=row["url"], lang=row["lang"],
        opts=ExtractOptions(to_formats=("md", "html", "doctags", "json")),
    )
    assert r.status == "success" and r.doc_type == "html"
    assert r.extracted_text
    assert r.md_content
    assert r.html_content.startswith("<!DOCTYPE html>\n<html>\n<head>")
    assert r.doctags_content.startswith("<doctag>")
    assert '"schema_name":"DoclingDocument"' in r.json_content
    assert r.spans_json.startswith("[{")


def test_default_channels_mirror_reference():
    # reference default to_formats = [markdown] (convert.py:127-137);
    # strict text + spans always emitted
    row = gen_page(3)
    r = extract_document(row["html"], name=row["url"], lang=row["lang"])
    assert r.extracted_text and r.md_content and r.spans_json != "[]"
    assert r.html_content == "" and r.doctags_content == "" and r.json_content == ""


def test_never_raises_on_junk():
    for data in (b"\x00" * 100, b"%PDF-", b"<html>", b"%PDF-1.4\ngarbage"):
        r = extract_document(data)
        assert r.status in ("success", "failure")


def test_to_formats_gating():
    row = gen_page(3)
    r = extract_document(row["html"], opts=ExtractOptions(to_formats=("text",)))
    assert r.extracted_text and not r.md_content and not r.html_content


def test_oracle_byte_stability():
    # the north-rule invariant: same bytes -> same text, every time
    for i in range(30):
        row = gen_page(i)
        a = extract_document(row["html"], name=row["url"], lang=row["lang"])
        b = extract_document(row["html"], name=row["url"], lang=row["lang"])
        assert a.extracted_text == b.extracted_text
        assert a.md_content == b.md_content
        assert a.spans_json == b.spans_json
