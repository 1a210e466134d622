"""C9 (continued) — data/markup backends completing the reference's
InputFormat surface: CSV, JATS scientific XML, USPTO patent XML, and
DoclingDocument JSON re-ingestion.

The reference accepts every docling ``InputFormat``
(reference:docling_serve/datamodel/convert.py:115-125 defaults
``from_formats`` to ``list(InputFormat)``, which in docling 2.36
includes csv, xml_jats, xml_uspto and json_docling alongside the
office/markup formats). docling implements these with its own
backends; here they are stdlib re-expressions emitting the same
Document tree the other extractors produce.
"""

from __future__ import annotations

import csv
import io
import json
from xml.etree import ElementTree

from docling_serve_spark.docmodel.export import assign_charspans
from docling_serve_spark.docmodel.model import (
    SECTION_HEADER,
    TABLE,
    TEXT,
    TITLE,
    DocItem,
    Document,
    TableCell,
    TableData,
)


class DataParseError(ValueError):
    pass


# ----------------------------------------------------------------- #
# CSV
# ----------------------------------------------------------------- #

_DELIMS = ",;\t|"


def extract_csv(data: bytes, name: str = "") -> Document:
    """CSV -> one-table Document (docling's CsvDocumentBackend shape:
    the file IS a table; first row is the header). Delimiter sniffed
    with stdlib csv.Sniffer, falling back to the comma."""
    try:
        text = data.decode("utf-8-sig", errors="replace")
    except Exception as e:  # pragma: no cover - decode w/ replace
        raise DataParseError(f"csv decode error: {e}") from None
    sample = text[:4096]
    try:
        dialect: csv.Dialect | type[csv.Dialect] = csv.Sniffer().sniff(
            sample, delimiters=_DELIMS
        )
    except csv.Error:
        # Sniffer needs consistent row widths; ragged files fall back
        # to the header row's most frequent candidate delimiter
        first = next((ln for ln in sample.splitlines() if ln.strip()), "")
        best = max(_DELIMS, key=first.count)
        delim = best if first.count(best) else ","

        class dialect(csv.excel):  # noqa: N801 - csv API shape
            delimiter = delim

    rows = [r for r in csv.reader(io.StringIO(text), dialect) if r]
    if not rows:
        raise DataParseError("empty csv")
    num_cols = max(len(r) for r in rows)
    grid = [
        [
            TableCell(
                text=(r[c] if c < len(r) else "").strip(),
                is_header=(i == 0),
            )
            for c in range(num_cols)
        ]
        for i, r in enumerate(rows)
    ]
    doc = Document(name=name, origin_mimetype="text/csv")
    doc.items.append(
        DocItem(
            item_type=TABLE,
            text="",
            table=TableData(num_rows=len(rows), num_cols=num_cols, grid=grid),
        )
    )
    return assign_charspans(doc)


# ----------------------------------------------------------------- #
# JATS (scientific-article XML)
# ----------------------------------------------------------------- #

def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _itertext(el: ElementTree.Element) -> str:
    return " ".join("".join(el.itertext()).split())


def extract_jats(data: bytes, name: str = "") -> Document:
    """JATS article XML -> Document: article-title as title, abstract
    paragraphs, then body sections (<sec><title> as headings, <p> as
    text)."""
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise DataParseError(f"jats parse error: {e}") from None
    doc = Document(name=name, origin_mimetype="application/jats+xml")

    def first(path_tag: str, scope: ElementTree.Element):
        for el in scope.iter():
            if _strip_ns(el.tag) == path_tag:
                return el
        return None

    title_el = first("article-title", root)
    if title_el is not None and _itertext(title_el):
        doc.items.append(DocItem(item_type=TITLE, text=_itertext(title_el)))
    abstract = first("abstract", root)
    if abstract is not None:
        for p in abstract.iter():
            if _strip_ns(p.tag) == "p" and _itertext(p):
                doc.items.append(DocItem(item_type=TEXT, text=_itertext(p)))

    def walk_sec(sec: ElementTree.Element, level: int) -> None:
        for child in sec:
            tag = _strip_ns(child.tag)
            if tag == "title" and _itertext(child):
                doc.items.append(
                    DocItem(
                        item_type=SECTION_HEADER,
                        text=_itertext(child),
                        level=min(level, 6),
                    )
                )
            elif tag == "p" and _itertext(child):
                doc.items.append(DocItem(item_type=TEXT, text=_itertext(child)))
            elif tag == "sec":
                walk_sec(child, level + 1)

    body = first("body", root)
    if body is not None:
        walk_sec(body, 1)
    if not doc.items:
        raise DataParseError("jats: no content")
    return assign_charspans(doc)


# ----------------------------------------------------------------- #
# USPTO (patent grant/application XML)
# ----------------------------------------------------------------- #

def extract_uspto(data: bytes, name: str = "") -> Document:
    """USPTO patent XML -> Document: invention-title, abstract,
    description paragraphs, claims."""
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise DataParseError(f"uspto parse error: {e}") from None
    doc = Document(name=name, origin_mimetype="application/xml")
    for el in root.iter():
        tag = _strip_ns(el.tag)
        if tag == "invention-title" and _itertext(el):
            doc.items.append(DocItem(item_type=TITLE, text=_itertext(el)))
            break
    for section, header in (("abstract", "Abstract"), ("description", "Description")):
        for el in root.iter():
            if _strip_ns(el.tag) != section:
                continue
            doc.items.append(
                DocItem(item_type=SECTION_HEADER, text=header, level=1)
            )
            for p in el.iter():
                if _strip_ns(p.tag) == "p" and _itertext(p):
                    doc.items.append(DocItem(item_type=TEXT, text=_itertext(p)))
            break
    claims = [el for el in root.iter() if _strip_ns(el.tag) == "claim"]
    if claims:
        doc.items.append(DocItem(item_type=SECTION_HEADER, text="Claims", level=1))
        for cl in claims:
            if _itertext(cl):
                doc.items.append(DocItem(item_type=TEXT, text=_itertext(cl)))
    if not doc.items:
        raise DataParseError("uspto: no content")
    return assign_charspans(doc)


# ----------------------------------------------------------------- #
# DoclingDocument JSON re-ingestion
# ----------------------------------------------------------------- #

def extract_docling_json(data: bytes, name: str = "") -> Document:
    """Re-ingest the engine's own json channel (schema_name
    'DoclingDocument'): texts then tables, each list in stored order —
    the same flattening docling's JSON layout uses. Round-trips with
    ``document_to_dict`` (tested)."""
    try:
        obj = json.loads(data.decode("utf-8", errors="replace"))
    except json.JSONDecodeError as e:
        raise DataParseError(f"docling json parse error: {e}") from None
    if not isinstance(obj, dict) or obj.get("schema_name") != "DoclingDocument":
        raise DataParseError("not a DoclingDocument json")
    doc = Document(
        name=name or str(obj.get("name", "")),
        num_pages=int(obj.get("num_pages", 1) or 1),
        origin_mimetype=str(
            (obj.get("origin") or {}).get("mimetype", "application/json")
        ),
    )
    for rec in obj.get("texts", []) or []:
        doc.items.append(
            DocItem(
                item_type=str(rec.get("label", TEXT)),
                text=str(rec.get("text", "")),
                level=int(rec.get("level", 0) or 0),
            )
        )
    for rec in obj.get("tables", []) or []:
        d = rec.get("data") or {}
        grid = [
            [
                TableCell(
                    text=str(c.get("text", "")),
                    row_span=int(c.get("row_span", 1) or 1),
                    col_span=int(c.get("col_span", 1) or 1),
                    is_header=bool(c.get("is_header", False)),
                )
                for c in row
            ]
            for row in (d.get("grid") or [])
        ]
        doc.items.append(
            DocItem(
                item_type=TABLE,
                text="",
                table=TableData(
                    num_rows=int(d.get("num_rows", len(grid)) or 0),
                    num_cols=int(d.get("num_cols", 0) or 0),
                    grid=grid,
                ),
            )
        )
    if not doc.items:
        raise DataParseError("docling json: no items")
    return assign_charspans(doc)
