"""Exporter channel goldens (E1-E5) — shape assertions mirror the
reference's own API tests (reference:tests/test_1-file-all-outputs.py:
88-122: html prefix, doctags prefix, schema_name)."""

import json

from docling_serve_spark.docmodel.model import (
    LIST_ITEM,
    SECTION_HEADER,
    TABLE,
    TEXT,
    TITLE,
    DocItem,
    Document,
    TableCell,
    TableData,
)
from docling_serve_spark.docmodel.export import (
    assign_charspans,
    export_to_doctags,
    export_to_html,
    export_to_json,
    export_to_markdown,
    export_to_text,
)


def _doc() -> Document:
    table = TableData(
        num_rows=2,
        num_cols=2,
        grid=[
            [TableCell("h1", is_header=True), TableCell("h2", is_header=True)],
            [TableCell("a"), TableCell("b")],
        ],
    )
    doc = Document(
        name="doc0",
        items=[
            DocItem(TITLE, "My Title", level=1),
            DocItem(SECTION_HEADER, "Intro", level=2),
            DocItem(TEXT, "Hello world."),
            DocItem(LIST_ITEM, "first"),
            DocItem(LIST_ITEM, "second"),
            DocItem(TABLE, "", table=table),
        ],
    )
    return assign_charspans(doc)


def test_text_channel_blank_line_join():
    txt = export_to_text(_doc())
    assert txt == (
        "My Title\n\nIntro\n\nHello world.\n\nfirst\n\nsecond\n\nh1, h2\na, b"
    )


def test_markdown_channel():
    md = export_to_markdown(_doc())
    assert md.startswith("# My Title\n\n## Intro\n\nHello world.")
    assert "- first\n\n- second" in md
    assert "| h1 | h2 |" in md and "|---|---|" in md


def test_strict_text_equals_text_channel():
    doc = _doc()
    assert export_to_markdown(doc, strict_text=True) == export_to_text(doc)


def test_html_golden_prefix():
    # the reference asserts exactly this prefix shape
    html = export_to_html(_doc())
    assert html.startswith("<!DOCTYPE html>\n<html>\n<head>")
    assert "<h1>My Title</h1>" in html
    assert "<ul>" in html and "<li>first</li>" in html
    assert "<table><tr><td>h1</td>" in html


def test_doctags_prefix_and_locs():
    dt = export_to_doctags(_doc())
    assert dt.startswith("<doctag><title><loc_")
    assert dt.endswith("</doctag>")
    assert "<section_header>" in dt


def test_json_schema_name_and_charspans():
    doc = _doc()
    payload = json.loads(export_to_json(doc))
    assert payload["schema_name"] == "DoclingDocument"
    txt = export_to_text(doc)
    for item in payload["texts"]:
        s, e = item["prov"][0]["charspan"]
        assert txt[s:e] == item["text"]


def test_charspans_idempotent():
    doc = _doc()
    first = [i.prov[0].charspan for i in doc.items]
    assign_charspans(doc)
    assert [i.prov[0].charspan for i in doc.items] == first


def test_page_break_placeholder():
    from docling_serve_spark.docmodel.model import Prov

    doc = Document(
        name="d",
        items=[
            DocItem(TEXT, "p1", prov=[Prov(page_no=1)]),
            DocItem(TEXT, "p2", prov=[Prov(page_no=2)]),
        ],
        num_pages=2,
    )
    md = export_to_markdown(doc, page_break_placeholder="<!-- page -->")
    assert md == "p1\n\n<!-- page -->\n\np2"
