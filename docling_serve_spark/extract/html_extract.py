"""HTML -> Document extraction (operator C8 of SURVEY.md §2.3).

What the reference computes: docling's HTMLDocumentBackend parses the
DOM, maps h1-h6/p/ul/ol/li/table/figure to document items and drops
script/style (routed via from_formats,
reference:docling_serve/datamodel/convert.py:115-125). This module is a
from-scratch, dependency-free equivalent built on stdlib
``html.parser``, extended with the north-star boilerplate heuristic:
tag-density + text-density scoring over the parsed element tree
(the Readability/Boilerpipe family — text-to-tag density features per
Kohlschütter/Fankhauser/Nejdl, "Boilerplate detection using shallow
text features", WSDM 2010; link-density discounting per Arc90
Readability — public knowledge) to select the main-content subtree
and drop nav/header/footer chrome.

Fully deterministic: stable tree walk, NFC normalization, fixed
whitespace collapsing — the same function is both the Spark stage body
and the single-node oracle (SURVEY.md §5.2).
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field
from html.parser import HTMLParser

from docling_serve_spark.docmodel.model import (
    CAPTION,
    CODE,
    LIST_ITEM,
    PICTURE,
    SECTION_HEADER,
    TABLE,
    TEXT,
    TITLE,
    DocItem,
    Document,
    TableCell,
    TableData,
)
from docling_serve_spark.docmodel.export import assign_charspans
from docling_serve_spark.extract.fasthtml import feed_fast

# Tags whose entire subtree is never content.
_DROP_TAGS = frozenset(
    {
        "script",
        "style",
        "noscript",
        "iframe",
        "svg",
        "canvas",
        "template",
        "object",
        "embed",
        "form",
        "button",
        "input",
        "select",
        "textarea",
        "nav",
        "aside",
    }
)
# Chrome containers dropped at any depth (boilerplate strip).
_CHROME_TAGS = frozenset({"header", "footer"})

# Negative id/class pattern (Readability-style, public heuristic).
_BOILER_RE = re.compile(
    r"(^|[-_ ])(nav|menu|footer|header|sidebar|side-bar|comment|banner|"
    r"advert|ad|ads|cookie|popup|promo|social|share|related|breadcrumb)"
    r"([-_ ]|$)",
    re.IGNORECASE,
)

_VOID_TAGS = frozenset(
    {"br", "hr", "img", "meta", "link", "input", "area", "base", "col",
     "source", "track", "wbr", "param"}
)

# Block-level tags that implicitly close an open <p> / <li>.
_BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "ul", "ol", "li", "table",
     "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "figure",
     "tr", "td", "th", "thead", "tbody", "tfoot", "header", "footer",
     "nav", "aside", "body", "html"}
)

_CANDIDATE_TAGS = frozenset({"body", "main", "article", "div", "section", "td"})

_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def _norm_text(s: str) -> str:
    """NFC + whitespace-collapse; the single normalization point that
    makes the text channel byte-stable."""
    return _WS_RE.sub(" ", unicodedata.normalize("NFC", s)).strip()


@dataclass
class _Node:
    tag: str  # "" for text nodes
    attrs: dict = field(default_factory=dict)
    children: list = field(default_factory=list)
    text: str = ""  # only for text nodes
    parent: "_Node | None" = None

    # filled by _measure
    n_text: int = 0
    n_link_text: int = 0
    n_elems: int = 0


class _TreeBuilder(HTMLParser):
    """Tolerant DOM builder: implicit </p>/<li>/<tr>/<td> closes,
    unclosed tags closed at EOF — handles the degenerate-HTML bucket
    of the fixture spec (FIXTURES.md §1b)."""

    # Real crawl data contains pathologically nested markup; cap the
    # tree depth so recursive walks stay far below Python's stack
    # limit (deeper elements are flattened into their ancestor).
    MAX_DEPTH = 180

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("document")
        self.stack = [self.root]

    def _open(self, node: _Node) -> None:
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        if len(self.stack) < self.MAX_DEPTH:
            self.stack.append(node)

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in _VOID_TAGS:
            self.stack[-1].children.append(
                _Node(tag, dict(attrs), parent=self.stack[-1])
            )
            return
        if tag in _BLOCK_TAGS:
            # implicit end: <p>/<li>/<td>/<tr> closed by next block
            while self.stack[-1].tag in ("p", "li") or (
                tag in ("tr", "td", "th", "tbody", "thead", "tfoot")
                and self.stack[-1].tag in ("td", "th")
            ) or (tag == "tr" and self.stack[-1].tag == "tr"):
                self.stack.pop()
        self._open(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        tag = tag.lower()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(
                _Node("", text=data, parent=self.stack[-1])
            )


def _is_boiler(node: _Node) -> bool:
    if node.tag in _DROP_TAGS or node.tag in _CHROME_TAGS:
        return True
    ident = " ".join(
        str(node.attrs.get(k) or "") for k in ("id", "class", "role")
    )
    if ident and _BOILER_RE.search(ident):
        return node.tag in (
            "div", "ul", "ol", "section", "span", "table", "p"
        )
    return False


def _prune(node: _Node) -> None:
    node.children = [c for c in node.children if not (c.tag and _is_boiler(c))]
    for c in node.children:
        if c.tag:
            _prune(c)


def _measure(node: _Node, in_link: bool = False) -> None:
    """Tag-density / text-density statistics per element (north-star
    scoring inputs)."""
    n_text = 0
    n_link = 0
    n_elems = 0
    link = in_link or node.tag == "a"
    for c in node.children:
        if c.tag == "":
            t = len(_norm_text(c.text))
            n_text += t
            if link:
                n_link += t
        else:
            _measure(c, link)
            n_text += c.n_text
            n_link += c.n_link_text
            n_elems += 1 + c.n_elems
    node.n_text = n_text
    node.n_link_text = n_link
    node.n_elems = n_elems


def _score(node: _Node) -> float:
    """Main-content score: text mass discounted by link density,
    boosted by text density (chars per descendant element)."""
    if node.n_text == 0:
        return 0.0
    link_density = node.n_link_text / node.n_text
    text_density = node.n_text / max(1, node.n_elems)
    return node.n_text * (1.0 - link_density) + 2.0 * text_density


def _find_candidates(node: _Node, out: list) -> None:
    if node.tag in _CANDIDATE_TAGS:
        out.append(node)
    for c in node.children:
        if c.tag:
            _find_candidates(c, out)


def _direct_text(node: _Node) -> str:
    """Text of node excluding nested block-level subtrees (those emit
    their own items)."""
    parts: list[str] = []

    def walk(n: _Node) -> None:
        for c in n.children:
            if c.tag == "":
                parts.append(c.text)
            elif c.tag == "br":
                parts.append(" ")
            elif c.tag in _BLOCK_TAGS and c.tag not in ("html", "body"):
                continue
            else:
                walk(c)

    walk(node)
    return _norm_text("".join(parts))


def _all_text(node: _Node) -> str:
    parts: list[str] = []

    def walk(n: _Node) -> None:
        for c in n.children:
            if c.tag == "":
                parts.append(c.text)
            elif c.tag == "br":
                parts.append(" ")
            else:
                walk(c)

    walk(node)
    return _norm_text("".join(parts))


def _pre_text(node: _Node) -> str:
    parts: list[str] = []

    def walk(n: _Node) -> None:
        for c in n.children:
            if c.tag == "":
                parts.append(c.text)
            elif c.tag == "br":
                parts.append("\n")
            else:
                walk(c)

    walk(node)
    return unicodedata.normalize("NFC", "".join(parts)).strip("\n")


_H_RE = re.compile(r"^h([1-6])$")


def _extract_table(node: _Node) -> TableData:
    rows: list[list[TableCell]] = []
    max_cols = 0

    def find_rows(n: _Node, acc: list) -> None:
        for c in n.children:
            if c.tag == "tr":
                acc.append(c)
            elif c.tag in ("thead", "tbody", "tfoot"):
                find_rows(c, acc)

    trs: list[_Node] = []
    find_rows(node, trs)
    for tr in trs:
        row: list[TableCell] = []
        for c in tr.children:
            if c.tag in ("td", "th"):
                try:
                    cs = max(1, int(c.attrs.get("colspan", 1)))
                except (TypeError, ValueError):
                    cs = 1
                try:
                    rs = max(1, int(c.attrs.get("rowspan", 1)))
                except (TypeError, ValueError):
                    rs = 1
                cell = TableCell(
                    _all_text(c), row_span=rs, col_span=cs, is_header=c.tag == "th"
                )
                row.extend([cell] * cs)
        if row:
            rows.append(row)
            max_cols = max(max_cols, len(row))
    # pad to rectangle
    for row in rows:
        while len(row) < max_cols:
            row.append(TableCell(""))
    return TableData(num_rows=len(rows), num_cols=max_cols, grid=rows)


def _emit_items(node: _Node, items: list[DocItem], saw_title: list[bool]) -> None:
    for c in node.children:
        if c.tag == "":
            continue
        m = _H_RE.match(c.tag)
        if m:
            t = _all_text(c)
            if t:
                lvl = int(m.group(1))
                if lvl == 1 and not saw_title[0]:
                    items.append(DocItem(TITLE, t, level=1))
                    saw_title[0] = True
                else:
                    items.append(DocItem(SECTION_HEADER, t, level=lvl))
            continue
        if c.tag in ("p", "blockquote"):
            t = _direct_text(c)
            if t:
                items.append(DocItem(TEXT, t))
            _emit_items(c, items, saw_title)
            continue
        if c.tag == "li":
            t = _direct_text(c)
            if t:
                items.append(DocItem(LIST_ITEM, t))
            _emit_items(c, items, saw_title)
            continue
        if c.tag == "pre":
            t = _pre_text(c)
            if t:
                items.append(DocItem(CODE, t))
            continue
        if c.tag == "table":
            td = _extract_table(c)
            if td.num_rows > 0:
                items.append(DocItem(TABLE, "", table=td))
            continue
        if c.tag == "img":
            src = str(c.attrs.get("src") or "")
            alt = _norm_text(str(c.attrs.get("alt") or ""))
            if src or alt:
                items.append(DocItem(PICTURE, alt, image_ref=src))
            continue
        if c.tag == "figcaption":
            t = _all_text(c)
            if t:
                items.append(DocItem(CAPTION, t))
            continue
        _emit_items(c, items, saw_title)


def _decode(html_bytes: bytes) -> str:
    if html_bytes[:2] in (b"\xff\xfe", b"\xfe\xff"):  # UTF-16 BOM
        try:
            return html_bytes.decode("utf-16")
        except UnicodeDecodeError:
            pass
    try:
        return html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        return html_bytes.decode("utf-8", errors="replace")


def _build_tree(text: str, fast: bool = True) -> _Node:
    """DOM build: fast one-pass scanner (fasthtml.feed_fast) driving
    the same handlers, with the stdlib parser as the fallback — both
    paths are differential-tested byte-equal (tests/test_fasthtml.py)."""
    if fast:
        try:
            parser = _TreeBuilder()
            feed_fast(parser, text)
            return parser.root
        except Exception:  # noqa: BLE001 — any scanner gap -> stdlib
            pass
    parser = _TreeBuilder()
    parser.feed(text)
    parser.close()
    return parser.root


def extract_html(html_bytes: bytes, name: str = "") -> Document:
    """Parse page bytes -> boilerplate-stripped Document.

    Pipeline: DOM build -> prune boilerplate subtrees -> measure
    tag/text density -> pick best-scoring candidate subtree -> emit
    items in document order -> assign charspans into the strict-text
    channel.
    """
    text = _decode(html_bytes)
    root = _build_tree(text)

    _prune(root)
    _measure(root)

    candidates: list[_Node] = []
    _find_candidates(root, candidates)
    best: _Node | None = None
    best_score = 0.0
    for cand in candidates:  # document order; strict > keeps first on ties
        s = _score(cand)
        if s > best_score:
            best, best_score = cand, s

    items: list[DocItem] = []
    saw_title = [False]
    if best is not None:
        # Keep the page <h1> if it sits outside the main candidate
        # (common pattern: title in a masthead, article in <main>).
        h1 = _first_h1_outside(root, best)
        if h1 is not None:
            t = _all_text(h1)
            if t:
                items.append(DocItem(TITLE, t, level=1))
                saw_title[0] = True
        _emit_items(best, items, saw_title)
    if not items:
        # degenerate fallback: whole-document text as one item
        t = _all_text(root)
        if t:
            items.append(DocItem(TEXT, t))

    doc = Document(name=name, items=items, num_pages=1, origin_mimetype="text/html")
    return assign_charspans(doc)


def _contains(anc: _Node, node: _Node) -> bool:
    p = node.parent
    while p is not None:
        if p is anc:
            return True
        p = p.parent
    return False


def _first_h1_outside(root: _Node, best: _Node) -> _Node | None:
    found: list[_Node] = []

    def walk(n: _Node) -> None:
        if found:
            return
        for c in n.children:
            if not c.tag:
                continue
            if c.tag == "h1":
                found.append(c)
                return
            walk(c)

    walk(root)
    if found and not _contains(best, found[0]) and found[0] is not best:
        return found[0]
    return None
