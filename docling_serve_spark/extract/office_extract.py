"""OOXML (docx/pptx/xlsx) -> Document extraction (operator C9 of
SURVEY.md §2.3).

The reference accepts these via docling's backend zoo
(reference:docs/usage.md:9 — from_formats includes docx/pptx;
docling-core wires python-docx/pptx/openpyxl). This module is a
from-scratch stdlib equivalent: ``zipfile`` + ``xml.etree`` over the
container parts, emitting the same Document tree the HTML/PDF parsers
produce — paragraphs, heading levels, list items, tables with header
rows — so every downstream channel (E1-E7), BiDi pass and span
assignment applies unchanged.

Parsed parts:
  docx: word/document.xml   (w:p paragraphs + w:pStyle headings +
        w:numPr list items; w:tbl/w:tr/w:tc tables)
  pptx: ppt/slides/slideN.xml in slide order (a:t runs per paragraph;
        one page per slide)
  xlsx: xl/workbook.xml sheet names + xl/sharedStrings.xml +
        xl/worksheets/sheetN.xml (one header-rowed table per sheet)

Deterministic by construction: document order only, no styling
heuristics beyond the explicit style/num markers.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree

from docling_serve_spark.docmodel.export import assign_charspans
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

MIME_DOCX = (
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
)
MIME_PPTX = (
    "application/vnd.openxmlformats-officedocument.presentationml.presentation"
)
MIME_XLSX = (
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
)


class OfficeParseError(ValueError):
    pass


def _zip_entry_names(data: bytes, limit: int = 4096) -> Iterator[str]:
    """Exact stored filenames from zip local-file headers (PK\\x03\\x04
    records: name length at +26, extra length at +28, name at +30).
    No directory parse needed; bounded at `limit` entries."""
    pos, n = 0, len(data)
    for _ in range(limit):
        pos = data.find(b"PK\x03\x04", pos)
        if pos == -1 or pos + 30 > n:
            return
        name_len = int.from_bytes(data[pos + 26 : pos + 28], "little")
        yield data[pos + 30 : pos + 30 + name_len].decode(
            "utf-8", errors="replace"
        )
        pos += 30 + name_len


def detect_ooxml(data: bytes) -> str | None:
    """Which OOXML flavor a PK container holds. Walks the local file
    headers and compares EXACT part names (not substrings) — a generic
    zip holding a docx under e.g. backup/word/document.xml must not be
    routed to the docx parser, which would fail on the missing
    top-level part."""
    if not data.startswith(b"PK\x03\x04"):
        return None
    for name in _zip_entry_names(data):
        if name == "word/document.xml":
            return "docx"
        if name == "ppt/presentation.xml" or name.startswith("ppt/slides/"):
            return "pptx"
        if name == "xl/workbook.xml":
            return "xlsx"
    return None


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _zip(data: bytes) -> zipfile.ZipFile:
    try:
        return zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise OfficeParseError(f"bad OOXML container: {e}") from None


def _part(zf: zipfile.ZipFile, name: str) -> ElementTree.Element:
    try:
        return ElementTree.fromstring(zf.read(name))
    except KeyError:
        raise OfficeParseError(f"missing part {name}") from None
    except ElementTree.ParseError as e:
        raise OfficeParseError(f"malformed XML in {name}: {e}") from None


# ----------------------------------------------------------------- #
# docx
# ----------------------------------------------------------------- #

_HEADING_RE = re.compile(r"heading\s*(\d+)$", re.IGNORECASE)


def _w_text(el: ElementTree.Element) -> str:
    """Concatenated run text of a w:p (w:t runs, w:tab/w:br as
    whitespace), document order."""
    parts: list[str] = []
    for node in el.iter():
        tag = _local(node.tag)
        if tag == "t":
            parts.append(node.text or "")
        elif tag in ("tab",):
            parts.append("\t")
        elif tag in ("br", "cr"):
            parts.append("\n")
    return "".join(parts).strip()


def _p_style(p: ElementTree.Element) -> tuple[str, int, bool]:
    """(item_type, heading_level, is_list) for a w:p paragraph."""
    style = ""
    is_list = False
    for node in p.iter():
        tag = _local(node.tag)
        if tag == "pStyle":
            for k, v in node.attrib.items():
                if _local(k) == "val":
                    style = v
        elif tag == "numPr":
            is_list = True
    if style.lower() == "title":
        return TITLE, 1, False
    m = _HEADING_RE.search(style)
    if m:
        return SECTION_HEADER, min(int(m.group(1)), 6), False
    if is_list:
        return LIST_ITEM, 0, True
    return TEXT, 0, False


def _docx_table(tbl: ElementTree.Element) -> TableData:
    grid: list[list[TableCell]] = []
    for tr in (c for c in tbl if _local(c.tag) == "tr"):
        row = []
        for tc in (c for c in tr if _local(c.tag) == "tc"):
            cell_text = " ".join(
                t for t in (_w_text(p) for p in tc.iter()
                            if _local(p.tag) == "p") if t
            )
            row.append(TableCell(cell_text, is_header=not grid))
        grid.append(row)
    n_cols = max((len(r) for r in grid), default=0)
    return TableData(num_rows=len(grid), num_cols=n_cols, grid=grid)


def extract_docx(data: bytes, name: str = "") -> Document:
    zf = _zip(data)
    root = _part(zf, "word/document.xml")
    body = next((c for c in root if _local(c.tag) == "body"), None)
    if body is None:
        raise OfficeParseError("docx: no w:body")
    items: list[DocItem] = []
    for child in body:
        tag = _local(child.tag)
        if tag == "p":
            t = _w_text(child)
            if not t:
                continue
            item_type, level, _ = _p_style(child)
            items.append(DocItem(item_type, t, level=level))
        elif tag == "tbl":
            td = _docx_table(child)
            if td.num_rows:
                items.append(DocItem(TABLE, "", table=td))
    doc = Document(name=name, items=items, num_pages=1,
                   origin_mimetype=MIME_DOCX)
    return assign_charspans(doc)


# ----------------------------------------------------------------- #
# pptx
# ----------------------------------------------------------------- #

_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def extract_pptx(data: bytes, name: str = "") -> Document:
    zf = _zip(data)
    slides = sorted(
        (int(m.group(1)), n)
        for n in zf.namelist()
        if (m := _SLIDE_RE.match(n))
    )
    if not slides:
        raise OfficeParseError("pptx: no slides")
    items: list[DocItem] = []
    for page_no, (_, part) in enumerate(slides, start=1):
        root = _part(zf, part)
        first_on_slide = True
        # paragraphs (a:p) in document order; runs are a:t
        for p in root.iter():
            if _local(p.tag) != "p" or "drawingml" not in p.tag:
                continue
            t = "".join(
                node.text or "" for node in p.iter()
                if _local(node.tag) == "t"
            ).strip()
            if not t:
                continue
            if first_on_slide:
                # the first text frame on a slide is its title
                # placeholder in every stock layout
                items.append(
                    DocItem(SECTION_HEADER, t, level=2,
                            prov=_page_prov(page_no))
                )
                first_on_slide = False
            else:
                items.append(DocItem(TEXT, t, prov=_page_prov(page_no)))
    doc = Document(name=name, items=items, num_pages=len(slides),
                   origin_mimetype=MIME_PPTX)
    return assign_charspans(doc)


def _page_prov(page_no: int):
    from docling_serve_spark.docmodel.model import Prov

    return [Prov(page_no=page_no)]


# ----------------------------------------------------------------- #
# xlsx
# ----------------------------------------------------------------- #

_SHEET_RE = re.compile(r"^xl/worksheets/sheet(\d+)\.xml$")
_CELL_REF_RE = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int:
    """A -> 0, B -> 1, ..., AA -> 26."""
    idx = 0
    for ch in ref:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = _part(zf, "xl/sharedStrings.xml")
    out = []
    for si in (c for c in root if _local(c.tag) == "si"):
        out.append(
            "".join(n.text or "" for n in si.iter() if _local(n.tag) == "t")
        )
    return out


def _sheet_names(zf: zipfile.ZipFile, n: int) -> list[str]:
    try:
        root = _part(zf, "xl/workbook.xml")
    except OfficeParseError:
        return [f"Sheet{i + 1}" for i in range(n)]
    names = [
        next((v for k, v in s.attrib.items() if _local(k) == "name"), "")
        for s in root.iter() if _local(s.tag) == "sheet"
    ]
    names = [x or f"Sheet{i + 1}" for i, x in enumerate(names)]
    return names + [f"Sheet{i + 1}" for i in range(len(names), n)]


def _cell_value(c: ElementTree.Element, shared: list[str]) -> str:
    t = c.attrib.get("t", "")
    if t == "inlineStr":
        return "".join(
            n.text or "" for n in c.iter() if _local(n.tag) == "t"
        )
    v = next((n for n in c if _local(n.tag) == "v"), None)
    raw = (v.text or "") if v is not None else ""
    if t == "s":
        try:
            return shared[int(raw)]
        except (ValueError, IndexError):
            return ""
    return raw


def extract_xlsx(data: bytes, name: str = "") -> Document:
    zf = _zip(data)
    sheets = sorted(
        (int(m.group(1)), n)
        for n in zf.namelist()
        if (m := _SHEET_RE.match(n))
    )
    if not sheets:
        raise OfficeParseError("xlsx: no worksheets")
    shared = _shared_strings(zf)
    names = _sheet_names(zf, len(sheets))
    items: list[DocItem] = []
    for sheet_i, (_, part) in enumerate(sheets):
        root = _part(zf, part)
        cells: dict[tuple[int, int], str] = {}
        max_r = max_c = -1
        for row in root.iter():
            if _local(row.tag) != "row":
                continue
            for c in (x for x in row if _local(x.tag) == "c"):
                ref = c.attrib.get("r", "")
                m = _CELL_REF_RE.match(ref)
                if not m:
                    continue
                ri, ci = int(m.group(2)) - 1, _col_index(m.group(1))
                val = _cell_value(c, shared)
                if val != "":
                    cells[(ri, ci)] = val
                    max_r, max_c = max(max_r, ri), max(max_c, ci)
        if max_r < 0:
            continue
        grid = [
            [
                TableCell(cells.get((r, c), ""), is_header=(r == 0))
                for c in range(max_c + 1)
            ]
            for r in range(max_r + 1)
        ]
        items.append(DocItem(SECTION_HEADER, names[sheet_i], level=2))
        items.append(
            DocItem(TABLE, "", table=TableData(
                num_rows=max_r + 1, num_cols=max_c + 1, grid=grid
            ))
        )
    doc = Document(name=name, items=items, num_pages=1,
                   origin_mimetype=MIME_XLSX)
    return assign_charspans(doc)
