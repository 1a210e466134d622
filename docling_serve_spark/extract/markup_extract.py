"""Markdown / AsciiDoc -> Document extraction (operator C9, markup
half). The reference routes these through docling's Markdown /
AsciiDoc backends (reference:docs/usage.md:9); this is a from-scratch
line-oriented parser into the same Document tree, so all channels and
span assignment apply unchanged.

Markdown subset: ATX headings (#..######), fenced code blocks (```),
unordered (-/*/+) and ordered (1.) list items, pipe tables with a
separator row, paragraphs; inline emphasis/code/link markers are
stripped to text ([text](url) keeps text, images keep alt).
AsciiDoc subset: = title / == section headings, * and - lists,
---- literal blocks, |=== tables, paragraphs.
"""

from __future__ import annotations

import re

from docling_serve_spark.docmodel.export import assign_charspans
from docling_serve_spark.docmodel.model import (
    CODE,
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

_MD_HEAD_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_MD_LIST_RE = re.compile(r"^\s{0,3}(?:[-*+]|\d{1,3}[.)])\s+(.*)$")
_MD_SEP_RE = re.compile(r"^\s*\|?\s*:?-{3,}:?\s*(\|\s*:?-{3,}:?\s*)*\|?\s*$")
_IMG_RE = re.compile(r"!\[([^\]]*)\]\(([^)]*)\)")
_LINK_RE = re.compile(r"\[([^\]]*)\]\(([^)]*)\)")
_EMPH_RE = re.compile(r"(\*{1,3}|_{1,3}|`)(.+?)\1")


def _inline(text: str) -> str:
    """Strip inline markers to plain text (deterministic, single
    pass per marker kind)."""
    text = _IMG_RE.sub(lambda m: m.group(1), text)
    text = _LINK_RE.sub(lambda m: m.group(1), text)
    prev = None
    while prev != text:
        prev = text
        text = _EMPH_RE.sub(lambda m: m.group(2), text)
    return text.strip()


def _md_table(lines: list[str]) -> TableData:
    def cells(line: str) -> list[str]:
        parts = [c.strip() for c in line.strip().strip("|").split("|")]
        return [_inline(c) for c in parts]

    header = cells(lines[0])
    rows = [cells(ln) for ln in lines[2:]]
    n_cols = max([len(header)] + [len(r) for r in rows])
    grid = [
        [TableCell(c, is_header=True) for c in header + [""] * (n_cols - len(header))]
    ]
    for r in rows:
        grid.append([TableCell(c) for c in r + [""] * (n_cols - len(r))])
    return TableData(num_rows=len(grid), num_cols=n_cols, grid=grid)


def extract_md(data: bytes, name: str = "") -> Document:
    text = data.decode("utf-8", errors="replace")
    lines = text.split("\n")
    items: list[DocItem] = []
    saw_title = False
    para: list[str] = []
    i = 0
    n = len(lines)

    def flush_para() -> None:
        nonlocal para
        if para:
            t = _inline(" ".join(para))
            if t:
                items.append(DocItem(TEXT, t))
            para = []

    while i < n:
        ln = lines[i]
        stripped = ln.strip()
        if not stripped:
            flush_para()
            i += 1
            continue
        if stripped.startswith("```"):
            flush_para()
            j = i + 1
            code: list[str] = []
            while j < n and not lines[j].strip().startswith("```"):
                code.append(lines[j])
                j += 1
            if code:
                items.append(DocItem(CODE, "\n".join(code)))
            i = j + 1
            continue
        m = _MD_HEAD_RE.match(ln)
        if m:
            flush_para()
            level = len(m.group(1))
            t = _inline(m.group(2))
            if t:
                if level == 1 and not saw_title:
                    items.append(DocItem(TITLE, t, level=1))
                    saw_title = True
                else:
                    items.append(DocItem(SECTION_HEADER, t, level=level))
            i += 1
            continue
        if (
            stripped.startswith("|")
            and i + 1 < n
            and _MD_SEP_RE.match(lines[i + 1] or "")
        ):
            flush_para()
            j = i + 2
            while j < n and lines[j].strip().startswith("|"):
                j += 1
            items.append(DocItem(TABLE, "", table=_md_table(lines[i:j])))
            i = j
            continue
        m = _MD_LIST_RE.match(ln)
        if m:
            flush_para()
            t = _inline(m.group(1))
            if t:
                items.append(DocItem(LIST_ITEM, t))
            i += 1
            continue
        para.append(stripped)
        i += 1
    flush_para()
    doc = Document(name=name, items=items, num_pages=1,
                   origin_mimetype="text/markdown")
    return assign_charspans(doc)


_ADOC_HEAD_RE = re.compile(r"^(={1,6})\s+(.*?)\s*$")
_ADOC_LIST_RE = re.compile(r"^\s*(?:\*{1,5}|-)\s+(.*)$")


def _adoc_table(lines: list[str]) -> TableData:
    """|=== ... |=== block: one `|cell` group per row (cells may share
    a line or span consecutive lines)."""
    rows: list[list[str]] = []
    current: list[str] = []
    per_row = 0
    for ln in lines:
        cells = [c.strip() for c in ln.split("|")[1:]]
        if not cells:
            continue
        if not rows and not current:
            per_row = len(cells) if len(cells) > 1 else 0
        current.extend(cells)
        if per_row and len(current) >= per_row:
            rows.append(current[:per_row])
            current = current[per_row:]
    if per_row == 0 and current:
        rows = [current]
        per_row = len(current)
    if current and per_row and rows and current != rows[-1]:
        pass  # trailing partial row dropped (malformed)
    n_cols = per_row or max((len(r) for r in rows), default=0)
    grid = [
        [
            TableCell(c, is_header=(ri == 0))
            for c in r + [""] * (n_cols - len(r))
        ]
        for ri, r in enumerate(rows)
    ]
    return TableData(num_rows=len(grid), num_cols=n_cols, grid=grid)


def extract_asciidoc(data: bytes, name: str = "") -> Document:
    text = data.decode("utf-8", errors="replace")
    lines = text.split("\n")
    items: list[DocItem] = []
    saw_title = False
    para: list[str] = []
    i = 0
    n = len(lines)

    def flush_para() -> None:
        nonlocal para
        if para:
            t = " ".join(para).strip()
            if t:
                items.append(DocItem(TEXT, t))
            para = []

    while i < n:
        ln = lines[i]
        stripped = ln.strip()
        if not stripped or stripped.startswith("//"):
            flush_para()
            i += 1
            continue
        if stripped.startswith("----"):
            flush_para()
            j = i + 1
            code: list[str] = []
            while j < n and not lines[j].strip().startswith("----"):
                code.append(lines[j])
                j += 1
            if code:
                items.append(DocItem(CODE, "\n".join(code)))
            i = j + 1
            continue
        if stripped.startswith("|==="):
            flush_para()
            j = i + 1
            block: list[str] = []
            while j < n and not lines[j].strip().startswith("|==="):
                block.append(lines[j])
                j += 1
            td = _adoc_table(block)
            if td.num_rows:
                items.append(DocItem(TABLE, "", table=td))
            i = j + 1
            continue
        m = _ADOC_HEAD_RE.match(ln)
        if m:
            flush_para()
            level = len(m.group(1))
            t = m.group(2).strip()
            if t:
                if level == 1 and not saw_title:
                    items.append(DocItem(TITLE, t, level=1))
                    saw_title = True
                else:
                    items.append(DocItem(SECTION_HEADER, t, level=max(level, 2)))
            i += 1
            continue
        m = _ADOC_LIST_RE.match(ln)
        if m:
            flush_para()
            t = m.group(1).strip()
            if t:
                items.append(DocItem(LIST_ITEM, t))
            i += 1
            continue
        para.append(stripped)
        i += 1
    flush_para()
    doc = Document(name=name, items=items, num_pages=1,
                   origin_mimetype="text/asciidoc")
    return assign_charspans(doc)
