"""C9 (continued): csv / JATS / USPTO XML / DoclingDocument-json
backends — the remaining docling InputFormats the reference accepts
(reference:docling_serve/datamodel/convert.py:115-125 defaults
from_formats to list(InputFormat))."""

import pytest

from docling_serve_spark.extract.core import (
    ExtractOptions,
    extract_document,
    sniff_doc_type,
)
from docling_serve_spark.extract.data_extract import (
    DataParseError,
    extract_csv,
    extract_docling_json,
    extract_jats,
    extract_uspto,
)

CSV = b"name,age,city\nalice,30,berlin\nbob,25,paris\ncarol,41,rome\n"
JATS = (
    b'<?xml version="1.0"?><article><front><article-meta><title-group>'
    b"<article-title>Deep Learning Methods</article-title></title-group>"
    b"<abstract><p>We study nets.</p></abstract></article-meta></front>"
    b"<body><sec><title>Introduction</title><p>Neural nets work.</p>"
    b"<sec><title>Background</title><p>History here.</p></sec></sec>"
    b"</body></article>"
)
USPTO = (
    b'<?xml version="1.0"?><us-patent-grant><us-bibliographic-data-grant>'
    b"<invention-title>Adaptive Widget</invention-title>"
    b"</us-bibliographic-data-grant><abstract><p>A widget.</p></abstract>"
    b"<description><p>The widget adapts.</p></description>"
    b"<claims><claim><claim-text>1. A widget comprising a thing.</claim-text>"
    b"</claim></claims></us-patent-grant>"
)


def test_sniff_new_formats():
    assert sniff_doc_type(CSV) == "csv"
    assert sniff_doc_type(JATS) == "xml_jats"
    assert sniff_doc_type(USPTO) == "xml_uspto"


def test_sniff_conservative():
    # HTML5 fragment using <article> stays html
    frag = b"<article><p>just html, with an article tag</p></article>"
    assert sniff_doc_type(frag) == "html"
    # xhtml with xml declaration stays html
    xhtml = (b'<?xml version="1.0"?><!DOCTYPE html>'
             b'<html xmlns="http://www.w3.org/1999/xhtml"><body><p>x</p></body></html>')
    assert sniff_doc_type(xhtml) == "html"
    # prose with varying comma counts is NOT csv
    prose = b"one, two\nthree four five\nsix, seven, eight\nnine ten\n"
    assert sniff_doc_type(prose) == "unknown"


def test_csv_extracts_table():
    doc = extract_csv(CSV, name="t.csv")
    assert len(doc.items) == 1
    t = doc.items[0].table
    assert (t.num_rows, t.num_cols) == (4, 3)
    assert t.grid[0][0].is_header and t.grid[0][0].text == "name"
    assert t.grid[2][2].text == "paris"


def test_csv_semicolon_and_ragged():
    doc = extract_csv(b"a;b;c\n1;2\n3;4;5;6\nx;y;z\n")
    t = doc.items[0].table
    assert t.num_cols == 4  # widest row wins; short rows padded
    assert t.grid[1][2].text == ""


def test_csv_empty_contained():
    with pytest.raises(DataParseError):
        extract_csv(b"\n\n")


def test_jats_structure():
    doc = extract_jats(JATS)
    kinds = [(i.item_type, i.text) for i in doc.items]
    assert kinds[0] == ("title", "Deep Learning Methods")
    assert ("text", "We study nets.") in kinds          # abstract
    assert ("section_header", "Introduction") in kinds
    assert ("section_header", "Background") in kinds    # nested sec
    levels = {i.text: i.level for i in doc.items if i.item_type == "section_header"}
    assert levels["Background"] == levels["Introduction"] + 1


def test_uspto_structure():
    doc = extract_uspto(USPTO)
    texts = [i.text for i in doc.items]
    assert texts[0] == "Adaptive Widget"
    assert "Abstract" in texts and "Claims" in texts
    assert any("comprising" in t for t in texts)


def test_docling_json_roundtrip_byte_identical():
    """Our own E5 json channel re-ingests to identical text/md."""
    src = b"<html><body><main><h1>T</h1><p>body text</p><ul><li>a</li></ul></main></body></html>"
    r0 = extract_document(src, name="h", opts=ExtractOptions(to_formats=("md", "json")))
    r1 = extract_document(
        r0.json_content.encode(), name="h",
        opts=ExtractOptions(to_formats=("md", "json")),
    )
    assert r1.doc_type == "json_docling"
    assert r1.extracted_text == r0.extracted_text
    assert r1.md_content == r0.md_content


def test_docling_json_rejects_foreign_json():
    with pytest.raises(DataParseError):
        extract_docling_json(b'{"schema_name": "SomethingElse", "texts": []}')


def test_router_end_to_end_new_formats():
    for blob, expect in ((CSV, "csv"), (JATS, "xml_jats"), (USPTO, "xml_uspto")):
        r = extract_document(blob, name="x")
        assert r.status == "success" and r.doc_type == expect
        assert r.extracted_text
        assert r.md_content  # default md channel produced
