"""C9 office/markup coverage: docx/pptx/xlsx (stdlib OOXML parse),
md/asciidoc, image routing; A1 AI-Vision trigger and P3 force_ocr
reset dispatch columns."""

import io
import os
import zipfile

import pytest

from docling_serve_spark.extract.core import (
    ExtractOptions,
    extract_document,
    sniff_doc_type,
)
from docling_serve_spark.extract.markup_extract import (
    extract_asciidoc,
    extract_md,
)
from docling_serve_spark.extract.office_extract import (
    OfficeParseError,
    detect_ooxml,
    extract_docx,
    extract_pptx,
    extract_xlsx,
)
from docling_serve_spark.sources.pages import gen_page

REF_DOCX = "/root/reference/test-files/english/HR.docx"

_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_A = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'


def _zip_bytes(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in parts.items():
            zf.writestr(name, content)
    return buf.getvalue()


def _mini_docx() -> bytes:
    doc = f"""<?xml version="1.0"?>
<w:document {_W}><w:body>
<w:p><w:pPr><w:pStyle w:val="Title"/></w:pPr><w:r><w:t>Doc Title</w:t></w:r></w:p>
<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Intro</w:t></w:r></w:p>
<w:p><w:r><w:t>First body </w:t></w:r><w:r><w:t>paragraph.</w:t></w:r></w:p>
<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/></w:numPr></w:pPr><w:r><w:t>bullet one</w:t></w:r></w:p>
<w:tbl>
<w:tr><w:tc><w:p><w:r><w:t>k</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>v</w:t></w:r></w:p></w:tc></w:tr>
<w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>1</w:t></w:r></w:p></w:tc></w:tr>
</w:tbl>
</w:body></w:document>"""
    return _zip_bytes({"word/document.xml": doc, "[Content_Types].xml": "<x/>"})


def _mini_pptx() -> bytes:
    def slide(title, body):
        return f"""<?xml version="1.0"?>
<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" {_A}>
<p:cSld><p:spTree>
<p:sp><p:txBody><a:p><a:r><a:t>{title}</a:t></a:r></a:p></p:txBody></p:sp>
<p:sp><p:txBody><a:p><a:r><a:t>{body}</a:t></a:r></a:p></p:txBody></p:sp>
</p:spTree></p:cSld></p:sld>"""
    return _zip_bytes({
        "ppt/presentation.xml": "<x/>",
        "ppt/slides/slide1.xml": slide("Slide One", "first body"),
        "ppt/slides/slide2.xml": slide("Slide Two", "second body"),
    })


def _mini_xlsx() -> bytes:
    sheet = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c></row>
</sheetData></worksheet>"""
    shared = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<si><t>name</t></si><si><t>count</t></si><si><t>alpha</t></si></sst>"""
    workbook = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheets><sheet name="Data" sheetId="1"/></sheets></workbook>"""
    return _zip_bytes({
        "xl/workbook.xml": workbook,
        "xl/sharedStrings.xml": shared,
        "xl/worksheets/sheet1.xml": sheet,
    })


# ---------------------------- sniffing ---------------------------- #

def test_sniff_ooxml_flavors():
    assert sniff_doc_type(_mini_docx()) == "docx"
    assert sniff_doc_type(_mini_pptx()) == "pptx"
    assert sniff_doc_type(_mini_xlsx()) == "xlsx"
    assert sniff_doc_type(b"PK\x03\x04junk") == "office"
    assert detect_ooxml(b"nope") is None


def test_sniff_images():
    assert sniff_doc_type(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64) == "image"
    assert sniff_doc_type(b"\xff\xd8\xff\xe0" + b"\x00" * 64) == "image"
    assert sniff_doc_type(b"GIF89a" + b"\x00" * 16) == "image"
    assert sniff_doc_type(b"II*\x00rest") == "image"


def test_sniff_markup():
    assert sniff_doc_type(b"# Heading\n\nbody text\n") == "md"
    assert sniff_doc_type(b"intro\n\n## Section\n\ntext") == "md"
    assert sniff_doc_type(b"= Title\n\nbody\n") == "asciidoc"
    assert sniff_doc_type(b"intro\n\n== Section\n\ntext") == "asciidoc"
    # plain prose must NOT classify
    assert sniff_doc_type(b"just a plain text file with words") == "unknown"


# ------------------------------ docx ------------------------------ #

def test_docx_structure():
    doc = extract_docx(_mini_docx(), name="m.docx")
    types = [(i.item_type, i.text) for i in doc.items]
    assert types[0] == ("title", "Doc Title")
    assert types[1] == ("section_header", "Intro")
    assert doc.items[1].level == 1
    assert types[2] == ("text", "First body paragraph.")
    assert types[3] == ("list_item", "bullet one")
    assert doc.items[4].item_type == "table"
    td = doc.items[4].table
    assert td.num_rows == 2 and td.num_cols == 2
    assert td.grid[0][0].text == "k" and td.grid[0][0].is_header
    assert td.grid[1][1].text == "1"


@pytest.mark.skipif(not os.path.exists(REF_DOCX), reason="no reference fixtures")
def test_docx_reference_fixture():
    data = open(REF_DOCX, "rb").read()
    r = extract_document(data, name="HR.docx")
    assert r.status == "success"
    assert r.doc_type == "docx"
    assert r.n_items > 50
    assert "Human Resources" in r.extracted_text


def test_docx_routing_through_core():
    r = extract_document(_mini_docx(), name="m.docx")
    assert r.status == "success" and r.doc_type == "docx"
    assert "Doc Title" in r.extracted_text
    assert "k, v" in r.extracted_text  # table strict-text rendering
    assert r.md_content.startswith("# Doc Title")


def test_bad_ooxml_is_typed_failure():
    blob = _zip_bytes({"word/document.xml": "<w:document>not closed"})
    r = extract_document(blob, name="bad.docx")
    assert r.status == "failure"
    assert "office parse error" in r.error
    with pytest.raises(OfficeParseError):
        extract_docx(blob)


# ------------------------------ pptx ------------------------------ #

def test_pptx_slides_and_pages():
    doc = extract_pptx(_mini_pptx(), name="m.pptx")
    assert doc.num_pages == 2
    heads = [i for i in doc.items if i.item_type == "section_header"]
    assert [h.text for h in heads] == ["Slide One", "Slide Two"]
    assert heads[0].prov[0].page_no == 1
    assert heads[1].prov[0].page_no == 2
    texts = [i for i in doc.items if i.item_type == "text"]
    assert [t.text for t in texts] == ["first body", "second body"]


# ------------------------------ xlsx ------------------------------ #

def test_xlsx_sheet_table():
    doc = extract_xlsx(_mini_xlsx(), name="m.xlsx")
    assert doc.items[0].item_type == "section_header"
    assert doc.items[0].text == "Data"
    td = doc.items[1].table
    assert td.num_rows == 2 and td.num_cols == 2
    assert td.grid[0][0].text == "name"  # shared string resolved
    assert td.grid[1][0].text == "alpha"
    assert td.grid[1][1].text == "42"  # numeric literal


# ---------------------------- markdown ---------------------------- #

MD_DOC = b"""# The Title

Intro paragraph with [a link](https://x) and **bold** text.

## Section A

- item one
- item two

```
code line
```

| k | v |
|---|---|
| a | 1 |
"""


def test_markdown_structure():
    doc = extract_md(MD_DOC, name="d.md")
    types = [i.item_type for i in doc.items]
    assert types == [
        "title", "text", "section_header", "list_item", "list_item",
        "code", "table",
    ]
    assert doc.items[1].text == "Intro paragraph with a link and bold text."
    td = doc.items[-1].table
    assert td.grid[0][0].text == "k" and td.grid[0][0].is_header
    assert td.grid[1][1].text == "1"


def test_markdown_through_core():
    r = extract_document(MD_DOC, name="d.md")
    assert r.status == "success" and r.doc_type == "md"
    assert "The Title" in r.extracted_text


def test_asciidoc_structure():
    adoc = b"""= Main Title

First paragraph.

== Section

* point one
* point two

|===
|h1 |h2
|a |b
|===
"""
    doc = extract_asciidoc(adoc, name="d.adoc")
    types = [i.item_type for i in doc.items]
    assert types == ["title", "text", "section_header", "list_item",
                     "list_item", "table"]
    td = doc.items[-1].table
    assert td.num_cols == 2
    assert td.grid[0][0].text == "h1" and td.grid[1][1].text == "b"
    r = extract_document(adoc, name="d.adoc")
    assert r.doc_type == "asciidoc" and r.status == "success"


# ------------------------------ image ----------------------------- #

def test_image_routes_to_ocr_dispatch():
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
    r = extract_document(png, name="x.png")
    assert r.doc_type == "image"
    assert r.status == "success"
    assert r.recommended_mode == "force"
    assert r.ocr_invoked and r.force_ocr_effective
    no_ocr = extract_document(png, name="x.png", opts=ExtractOptions(do_ocr=False))
    assert not no_ocr.ocr_invoked and not no_ocr.force_ocr_effective


def test_from_formats_gates_new_types():
    r = extract_document(_mini_docx(), name="m.docx",
                         opts=ExtractOptions(from_formats=("html", "pdf")))
    assert r.status == "skipped" and "from_formats" in r.error


# --------------------------- A1 / P3 ------------------------------ #

def _force_mode_pdf() -> bytes:
    """A PDF whose pages have no text -> recommended_mode == force."""
    stream = "BT ET"
    return (
        "%PDF-1.4\n"
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        f"4 0 obj\n<< /Length {len(stream)} >>\nstream\n{stream}\nendstream\nendobj\n"
        "%%EOF\n"
    ).encode("latin-1")


def test_ai_vision_trigger_predicate():
    pdf = _force_mode_pdf()
    off = extract_document(pdf, name="x.pdf")
    assert off.recommended_mode == "force"
    assert not off.ai_vision_triggered  # disabled by default
    on = extract_document(pdf, name="x.pdf",
                          opts=ExtractOptions(enable_ai_vision=True))
    assert on.ai_vision_triggered
    # non-force mode never triggers
    row = next(gen_page(i) for i in range(500)
               if bytes(gen_page(i)["html"]).startswith(b"%PDF"))
    good = extract_document(bytes(row["html"]), name=row["url"],
                            opts=ExtractOptions(enable_ai_vision=True))
    assert good.recommended_mode != "force"
    assert not good.ai_vision_triggered
    # html rows are not a supported type for the middleware
    html = extract_document(b"<html><body><main><p>text body here</p></main></body></html>",
                            name="h", opts=ExtractOptions(enable_ai_vision=True))
    assert not html.ai_vision_triggered


def test_ocrmypdf_performed_resets_force_ocr():
    pdf = _force_mode_pdf()
    plain = extract_document(pdf, name="x.pdf",
                             opts=ExtractOptions(force_ocr=True))
    assert plain.force_ocr_effective and not plain.ocrmypdf_performed
    pre = extract_document(
        pdf, name="x.pdf",
        opts=ExtractOptions(force_ocr=True,
                            enable_ocrmypdf_preprocessing=True),
    )
    assert pre.ocrmypdf_performed
    assert not pre.force_ocr_effective  # P3: preprocessing already OCRed
    # oversize rows are not preprocessed
    big = extract_document(
        pdf, name="x.pdf",
        opts=ExtractOptions(enable_ocrmypdf_preprocessing=True,
                            ocrmypdf_max_file_size_mb=0),
    )
    assert not big.ocrmypdf_performed


def test_nested_docx_path_not_misrouted():
    """A generic zip holding a docx part under a SUBDIRECTORY
    (backup/word/document.xml) must not be routed to the docx parser —
    exact part names, not substring search."""
    import io as _io
    import zipfile as _zf

    buf = _io.BytesIO()
    with _zf.ZipFile(buf, "w") as z:
        z.writestr("backup/word/document.xml", "<w:document/>")
        z.writestr("readme.txt", "archive of a docx")
    assert detect_ooxml(buf.getvalue()) is None
    assert sniff_doc_type(buf.getvalue()) == "office"


REF_BASE = "/root/reference/test-files"


@pytest.mark.skipif(not os.path.exists(REF_BASE), reason="no reference fixtures")
@pytest.mark.parametrize("name", ["english/HR", "english/SOP", "english/Hygiene"])
def test_docx_pdf_cross_parser_consistency(name):
    """The reference ships each document as BOTH .docx and .pdf; the
    two formats go through entirely independent parsers here (zip+XML
    flow vs content-stream geometry), so full word-set agreement
    between them is a strong end-to-end fidelity check on both."""
    import re

    dx = extract_document(open(f"{REF_BASE}/{name}.docx", "rb").read(), name=name)
    pf = extract_document(open(f"{REF_BASE}/{name}.pdf", "rb").read(), name=name)
    assert dx.status == "success" and pf.status == "success"

    def toks(t):
        return set(re.findall(r"[A-Za-z]{3,}", t.lower()))

    docx_words = toks(dx.extracted_text)
    assert len(docx_words) > 300
    missing = docx_words - toks(pf.extracted_text)
    assert not missing, sorted(missing)[:20]


@pytest.mark.skipif(not os.path.exists(REF_BASE), reason="no reference fixtures")
def test_benchmark_results_docx_parses():
    r = extract_document(
        open(f"{REF_BASE}/Benchmark Results.docx", "rb").read(), name="bench.docx"
    )
    assert r.status == "success" and r.doc_type == "docx"
    assert r.extracted_text.startswith("Comparative OCR Benchmark")
    assert r.n_items > 40
