"""PDF -> Document extraction (operators C1-C4, C10 of SURVEY.md §2.3).

What the reference computes (via docling-parse/pypdfium2 +
layout models, configured at
reference:docling_serve/docling_conversion.py:153-165): per-page text
cells with positions, block segmentation, reading-order
reconstruction, table structure. This module is a from-scratch
deterministic equivalent for the text-PDF subset a crawl carries:
content streams with BT/ET, Tf, Td/TD/Tm/T*, Tj/TJ/' operators and
parenthesis strings with backslash escapes, stored raw or
/FlateDecode-compressed (inflated with stdlib zlib; the /Length-aware
object scan survives binary stream bytes).

Stages (all pure Python, no deps):
  1. object scan      -> page order + content streams + /Marked flag (F1)
  2. stream tokenizer -> positioned glyph runs (x, y, size, text)
  3. line grouping    -> runs at equal baseline, sorted by x
  4. column clustering-> x-histogram split (C2 geometric segmentation)
  5. block segmentation by leading gap; table detection from aligned
     multi-run rows (C4 whitespace-alignment reconstruction)
  6. reading order    -> (page, column, -y, x) stable sort (C3)
"""

from __future__ import annotations

import re
from bisect import bisect_right
from dataclasses import dataclass

from docling_serve_spark.docmodel.model import (
    SECTION_HEADER,
    TABLE,
    TEXT,
    TITLE,
    BBox,
    DocItem,
    Document,
    Prov,
    TableCell,
    TableData,
)
from docling_serve_spark.docmodel.export import assign_charspans

PAGE_W = 612.0
PAGE_H = 792.0

_KIDS_RE = re.compile(r"/Kids\s*\[([^\]]*)\]")
_REF_RE = re.compile(r"(\d+)\s+0\s+R")
_CONTENTS_RE = re.compile(r"/Contents\s+(\d+)\s+0\s+R")
_CONTENTS_ARR_RE = re.compile(r"/Contents\s*\[([^\]]*)\]")


class PdfParseError(ValueError):
    pass


@dataclass
class _Run:
    x: float
    y: float
    size: float
    text: str


def is_tagged_pdf(data: bytes) -> bool:
    """F1 — tagged check; the reference asks pikepdf for
    Root.MarkInfo./Marked (reference:docling_serve/pdf_analysis.py:36-44)."""
    return re.search(rb"/MarkInfo\s*<<[^>]*/Marked\s+true", data) is not None


_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}


def _unescape(s: str) -> str:
    if "\\" not in s:  # fast path: the overwhelmingly common case
        return s
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt in "nrtbf":
                out.append(_ESCAPES[nxt])
                i += 2
            elif nxt in "()\\":
                out.append(nxt)
                i += 2
            elif nxt in "01234567":
                # octal escape: up to three OCTAL digits only (8, 9
                # and unicode digits must not be consumed — real-world
                # strings contain \8-adjacent sequences)
                j = i + 1
                oct_digits = ""
                while j < n and s[j] in "01234567" and len(oct_digits) < 3:
                    oct_digits += s[j]
                    j += 1
                # §7.3.4.2: high-order overflow is ignored (\777 -> FF)
                out.append(chr(int(oct_digits, 8) & 0xFF))
                i = j
            else:
                out.append(nxt)
                i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class _FontMap:
    """Glyph-code -> unicode mapping from a font's /ToUnicode CMap
    (PDF 32000-1:2008 §9.10.3). ``width`` is the code byte width from
    the first codespace range (1 for simple fonts, 2 for CID/Type0).
    ``ranges`` is set ONLY when the codespace declares MIXED byte
    widths (e.g. the Shift-JIS-shaped 90ms-RKSJ family: <00><80>
    one-byte plus <8140><FCFC> two-byte): decoding then walks the
    string code-by-code, matching the shortest declared width whose
    range contains the next bytes — the Adobe CMap spec's lookup
    algorithm, which a fixed-width split would garble into byte
    halves."""

    __slots__ = ("width", "map", "ranges", "_widths")

    def __init__(self, width: int, mapping: dict[int, str],
                 ranges: tuple[tuple[int, int, int], ...] | None = None):
        self.width = width
        self.map = mapping
        self.ranges = ranges
        self._widths = (
            sorted({w for w, _, _ in ranges}) if ranges else None
        )

    def decode(self, raw: str) -> str:
        if self.ranges:
            out = []
            i, length = 0, len(raw)
            while i < length:
                for n in self._widths:
                    if i + n > length:
                        continue
                    code = 0
                    for j in range(i, i + n):
                        code = (code << 8) | ord(raw[j])
                    if any(lo <= code <= hi
                           for w, lo, hi in self.ranges if w == n):
                        out.append(
                            self.map.get(code, raw[i] if n == 1 else "")
                        )
                        i += n
                        break
                else:
                    # bytes outside every declared range: consume the
                    # shortest code width and emit nothing (spec's
                    # error recovery), never loop forever
                    i += self._widths[0]
            return "".join(out)
        if self.width == 1:
            return "".join(self.map.get(ord(c), c) for c in raw)
        out = []
        for i in range(0, len(raw) - 1, 2):
            code = (ord(raw[i]) << 8) | ord(raw[i + 1])
            out.append(self.map.get(code, ""))
        return "".join(out)


_TOKEN_RE = re.compile(
    r"""
    \((?P<str>(?:[^()\\]|\\.)*)\)      # literal string
  | (?P<dict><<|>>)                    # dict delims (before hex!)
  | <(?P<hex>[0-9A-Fa-f\s]*)>          # hex string
  | /(?P<name>[^\s/<>\[\]()]+)         # name
  | (?P<num>[-+]?\d*\.?\d+)            # number
  | (?P<op>[A-Za-z'"*]+)               # operator
  | (?P<arr>[\[\]])                    # array delim
    """,
    re.VERBOSE,
)


def _num(tok) -> float:
    return tok[1] if tok and tok[0] == "n" else 0.0


# ---- fast scanner for simple content streams ------------------------
#
# The dominant real-world page is a flat sequence of
# "a b c d e f Tm (text) Tj" / "tx ty Td" / "/F1 12 Tf" show-text runs
# with no CTM changes, arrays, or hex strings. Scanning those four
# constructs directly (one regex match per LINE instead of ~8 generic
# tokens) is ~3x faster than the general tokenizer. Soundness comes
# from span-coverage validation, not from trusting the grammar: after
# the scan, every occurrence of ANY state-bearing operator substring
# must lie inside a matched span (string literals count as their
# span) — one stray "cm"/"TJ"/"<"/... outside a span and the page is
# re-parsed by the general tokenizer. The check is byte-exact, so the
# fast path can never silently drop or misplace a construct the
# general parser would have honored.

# the general tokenizer lexes operators as [A-Za-z'"*]+ runs, so a
# fast-path op match must end at that charset's boundary ("Tmy" is
# the single unknown op Tmy, NOT Tm followed by y)
_OPB = r"""(?![A-Za-z'"*])"""
_FAST_RE = re.compile(
    r"\((?P<s1>(?:[^()\\]|\\.)*)\)\s*(?P<op1>Tj|')" + _OPB  # show text
    + r"|(?P<tm>(?:[-+]?[\d.]+\s+){6})Tm" + _OPB            # text matrix
    + r"|(?P<td>(?:[-+]?[\d.]+\s+){2})Td" + _OPB            # translate
    + r"|/(?P<fn>[^\s/<>\[\]()]+)\s+(?P<fs>[-+]?[\d.]+)\s+Tf" + _OPB
    + r"""|(?<![A-Za-z'"*])(?P<bt>BT)""" + _OPB             # begin text
    + r"|\((?P<sx>(?:[^()\\]|\\.)*)\)"                      # bare string
)

# operator substrings that carry state the fast scanner does not
# model; any occurrence OUTSIDE a matched span forces the general path
# "/" is a needle because a name token can land inside the "last k
# stack entries" the general parser feeds to Tm/Td/Tf (coerced to
# 0.0 by _num) — the fast grammar only models numeric literals there
_FAST_NEEDLES = (
    "Tj", "Tm", "Td", "Tf", "BT", "'", '"', "/",
    "TJ", "TD", "TL", "T*", "cm", "Do", "BI", "<", "[",
)


def _parse_content_fast(
    stream: str, fonts: dict[str, "_FontMap"] | None
) -> "list[_Run] | None":
    """Scan a simple stream; return None when validation shows any
    construct the fast grammar doesn't model (caller falls back to
    the general tokenizer)."""
    runs: list[_Run] = []
    starts: list[int] = []
    ends: list[int] = []
    a, b, c, d, e, f = 1.0, 0.0, 0.0, 1.0, 0.0, 0.0
    tf_size = 12.0
    size = 12.0
    leading = 14.0
    fmap: _FontMap | None = None
    for m in _FAST_RE.finditer(stream):
        starts.append(m.start())
        ends.append(m.end())
        g = m.lastgroup
        if g == "op1":
            if m.group("op1") == "'":
                e += -leading * c
                f += -leading * d
            text = _unescape(m.group("s1"))
            if fmap is not None:
                text = fmap.decode(text)
            if text:
                runs.append(_Run(e, f, size, text))
        elif g == "tm":
            try:
                a, b, c, d, e, f = (float(v) for v in m.group("tm").split())
            except ValueError:
                return None  # malformed number ('1.2.3') — general path
            det = abs(a * d) if b == 0.0 == c else abs(a * d - b * c)
            size = tf_size * (det ** 0.5 if det > 0 else 1.0)
        elif g == "td":
            try:
                tx, ty = (float(v) for v in m.group("td").split())
            except ValueError:
                return None
            e += tx * a + ty * c
            f += tx * b + ty * d
        elif g == "fs":
            try:
                tf_size = float(m.group("fs"))
            except ValueError:
                return None
            det = abs(a * d) if b == 0.0 == c else abs(a * d - b * c)
            size = tf_size * (det ** 0.5 if det > 0 else 1.0)
            if fonts:
                fmap = fonts.get(m.group("fn"))
        elif g == "bt":
            a, b, c, d, e, f = 1.0, 0.0, 0.0, 1.0, 0.0, 0.0
            size = tf_size
        # "sx" (bare string): state no-op, span recorded for coverage
    find = stream.find
    for needle in _FAST_NEEDLES:
        idx = find(needle)
        while idx != -1:
            j = bisect_right(starts, idx) - 1
            if j < 0 or idx + len(needle) > ends[j]:
                return None
            idx = find(needle, idx + 1)
    return runs


def _strip_inline_images(stream: str) -> str:
    """Remove BI…ID…EI inline-image segments (PDF 32000-1 §8.9.7):
    the raw pixel bytes after ID are NOT tokens, and binary that
    happens to contain '(…) Tj'-shaped bytes would otherwise leak
    junk text runs. EI must be whitespace-delimited; binary containing
    bare 'EI' keeps scanning."""
    out = []
    pos = 0
    n = len(stream)
    while True:
        bi = stream.find("BI", pos)
        # require token boundary (BI at start or after whitespace/EOL)
        while bi != -1 and bi > 0 and stream[bi - 1] not in " \t\r\n":
            bi = stream.find("BI", bi + 2)
        if bi == -1:
            out.append(stream[pos:])
            return "".join(out)
        idp = stream.find("ID", bi)
        if idp == -1:
            out.append(stream[pos:])
            return "".join(out)
        seg = stream[bi + 2 : idp]
        # a real inline image declares /W /H etc between BI and ID;
        # prose inside a string literal (" BI ... ID ") does not —
        # require a name token and only dict-ish characters
        if "/" not in seg or not re.fullmatch(r"[\s/A-Za-z0-9<>\[\].+-]*", seg):
            out.append(stream[pos : bi + 2])
            pos = bi + 2
            continue
        ei = idp + 2
        while True:
            ei = stream.find("EI", ei + 1)
            if ei == -1:
                ei = n
                break
            if stream[ei - 1] in " \t\r\n\x00" and (
                ei + 2 >= n or stream[ei + 2] in " \t\r\n"
            ):
                ei += 2
                break
        out.append(stream[pos:bi])
        pos = ei


_IDENT = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(m1: tuple, m2: tuple) -> tuple:
    """Affine concat: apply m1 then m2 ((a,b,c,d,e,f) maps (x,y) to
    (a x + c y + e, b x + d y + f))."""
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _parse_content(
    stream: str,
    fonts: dict[str, _FontMap] | None = None,
    xobjects: dict[str, tuple] | None = None,
    base_ctm: tuple = _IDENT,
) -> list[_Run]:
    """Tokenize one content stream into positioned text runs. String
    arguments (literal or hex) are decoded through the current font's
    ToUnicode map when one exists — the real-world (subset-font)
    path; without a map the raw text passes through unchanged (the
    synthetic-corpus and simple-encoding path).

    Positions are tracked through the FULL affine pipeline — text
    matrix (Tm/Td/T*) times CTM (cm, saved/restored by q/Q) — so
    cairo-family streams that write under a flip matrix
    ('1 0 0 -1 0 H cm') land in standard y-up device space and sort
    into the right reading order; effective font size is
    tf_size * sqrt(|det(Tm x CTM)|) (those writers set 'Tf 1' and
    carry the size in the matrix)."""
    if "BI" in stream:
        stream = _strip_inline_images(stream)
    if base_ctm is _IDENT:
        fast = _parse_content_fast(stream, fonts)
        if fast is not None:
            return fast
    runs: list[_Run] = []
    stack: list = []
    ctm = base_ctm
    gs_stack: list[tuple] = []
    tm = _IDENT
    tf_size = 12.0
    size = 12.0
    leading = 14.0
    fmap: _FontMap | None = None
    in_array: list | None = None

    def _resize() -> None:
        nonlocal size
        if ctm is _IDENT and tm[1] == 0.0 and tm[2] == 0.0:
            # translation/axis-scale only (the dominant case): the
            # determinant is just a*d — skip the full matrix product
            det = abs(tm[0] * tm[3])
        else:
            trm = _mat_mul(tm, ctm)
            det = abs(trm[0] * trm[3] - trm[1] * trm[2])
        size = tf_size * (det ** 0.5 if det > 0 else 1.0)

    def _pos() -> tuple[float, float]:
        if ctm is _IDENT:  # the overwhelmingly common case
            return tm[4], tm[5]
        a2, b2, c2, d2, e2, f2 = ctm
        e, f = tm[4], tm[5]
        return e * a2 + f * c2 + e2, e * b2 + f * d2 + f2

    def emit(raw: str) -> None:
        text = fmap.decode(raw) if fmap is not None else raw
        if text:
            x, y = _pos()
            runs.append(_Run(x, y, size, text))

    def emit_decoded(text: str) -> None:
        if text:
            x, y = _pos()
            runs.append(_Run(x, y, size, text))

    for m in _TOKEN_RE.finditer(stream):
        kind = m.lastgroup  # single-group dispatch: one lookup per token
        if kind == "str" or kind == "hex":
            if kind == "str":
                s = _unescape(m.group("str"))
            else:
                hx = m.group("hex").replace(" ", "").replace("\n", "")
                if len(hx) % 2:
                    hx += "0"  # odd count: implicit trailing zero (spec)
                s = "".join(
                    chr(int(hx[i : i + 2], 16)) for i in range(0, len(hx), 2)
                )
            if in_array is not None:
                in_array.append(s)
            else:
                stack.append(("s", s))
        elif kind == "num":
            v = float(m.group("num"))
            if in_array is not None:
                in_array.append(v)
            else:
                stack.append(("n", v))
        elif kind == "name":
            if in_array is None:
                stack.append(("nm", m.group("name")))
        elif kind == "dict":
            pass  # BDC/DP property dicts carry no text state
        elif kind == "arr":
            if m.group("arr") == "[":
                in_array = []
            else:
                stack.append(("a", in_array or []))
                in_array = None
        else:
            # dispatch ordered by observed frequency in real content
            # streams: show-text and positioning first
            op = m.group("op")
            if op == "Tj" and stack and stack[-1][0] == "s":
                emit(stack[-1][1])
            elif op == "Tm" and len(stack) >= 6:
                tm = (
                    _num(stack[-6]), _num(stack[-5]), _num(stack[-4]),
                    _num(stack[-3]), _num(stack[-2]), _num(stack[-1]),
                )
                _resize()
            elif op == "Td" and len(stack) >= 2:
                # translate @ tm only moves the origin:
                # (e,f) += (tx, ty) through tm's linear part
                tx, ty = _num(stack[-2]), _num(stack[-1])
                a, b, c, d, e, f = tm
                tm = (a, b, c, d, tx * a + ty * c + e, tx * b + ty * d + f)
            elif op == "TJ" and stack and stack[-1][0] == "a":
                # numeric elements are kern/space adjustments in
                # 1/1000 em; a large negative one IS the inter-word
                # gap (pdftex-style PDFs carry no literal spaces).
                # Decode glyph strings individually BEFORE inserting
                # the space so the font map never sees it.
                parts: list[str] = []
                for t in stack[-1][1]:
                    if isinstance(t, str):
                        parts.append(
                            fmap.decode(t) if fmap is not None else t
                        )
                    elif t <= -150 and parts and not parts[-1].endswith(" "):
                        parts.append(" ")
                emit_decoded("".join(parts))
            elif op == "Tf" and stack:
                tf_size = _num(stack[-1])
                _resize()
                if fonts:
                    names = [t[1] for t in stack if t[0] == "nm"]
                    if names:
                        fmap = fonts.get(names[-1])
            elif op == "TD" and len(stack) >= 2:
                tx, ty = _num(stack[-2]), _num(stack[-1])
                a, b, c, d, e, f = tm
                tm = (a, b, c, d, tx * a + ty * c + e, tx * b + ty * d + f)
                leading = -ty or leading
            elif op == "TL" and stack:
                leading = _num(stack[-1])
            elif op == "T*":
                a, b, c, d, e, f = tm
                tm = (a, b, c, d, -leading * c + e, -leading * d + f)
            elif op == "cm" and len(stack) >= 6:
                ctm = _mat_mul(
                    (
                        _num(stack[-6]), _num(stack[-5]), _num(stack[-4]),
                        _num(stack[-3]), _num(stack[-2]), _num(stack[-1]),
                    ),
                    ctm,
                )
                _resize()
            elif op == "q":
                gs_stack.append(ctm)
            elif op == "Q":
                if gs_stack:
                    ctm = gs_stack.pop()
                    _resize()
            elif op == "'" and stack and stack[-1][0] == "s":
                a, b, c, d, e, f = tm
                tm = (a, b, c, d, -leading * c + e, -leading * d + f)
                emit(stack[-1][1])
            elif op == "Do" and xobjects:
                # Form XObject invocation: expand its runs inline
                # (OCR text layers live here; coords are page-like)
                names = [t[1] for t in stack if t[0] == "nm"]
                if names and names[-1] in xobjects:
                    s2, f2, x2 = xobjects[names[-1]]
                    # form content draws under the CURRENT ctm (its
                    # own /Matrix defaults to identity)
                    runs.extend(
                        _parse_content(s2, f2 or None, x2 or None, ctm)
                    )
            elif op == "BT":
                tm = _IDENT
                _resize()
            stack = []
    return runs


_OBJ_HEAD_RE = re.compile(r"(\d+)\s+0\s+obj")
_STREAM_START_RE = re.compile(r"stream\r?\n")
# the (?!\d) is load-bearing: without it, (\d+) backtracks on
# '/Length 383 0 R' to match '38' and the indirect ref is missed
_LENGTH_RE = re.compile(r"/Length\s+(\d+)(?!\d|\s+0\s+R)")
_LENGTH_REF_RE = re.compile(r"/Length\s+(\d+)\s+0\s+R")


def _parse_object_at(
    text: str, pos: int, resolve_len
) -> tuple[int, str, str | None, int] | None:
    """Parse ONE `N 0 obj ... endobj` starting at/after ``pos``.
    /Length-aware stream skipping, so binary (compressed) stream
    bytes that happen to contain 'endobj'/'endstream' cannot derail
    object splitting — the failure mode of a pure-regex scan on
    real-world PDFs. ``resolve_len(obj_num)`` resolves an indirect
    /Length ref. Returns (num, head, stream|None, end_pos)."""
    n = len(text)
    m = _OBJ_HEAD_RE.search(text, pos)
    if not m:
        return None
    num = int(m.group(1))
    body_start = m.end()
    em = text.find("endobj", body_start)
    sm = _STREAM_START_RE.search(text, body_start, em if em != -1 else n)
    if sm is None:
        return (
            num,
            text[body_start : em if em != -1 else n],
            None,
            em + 6 if em != -1 else n,
        )
    head = text[body_start : sm.start()]
    data_start = sm.end()
    length = None
    lm = _LENGTH_RE.search(head)
    if lm:
        length = int(lm.group(1))
    else:
        rm = _LENGTH_REF_RE.search(head)
        if rm:
            # indirect /Length N 0 R — real-world writers
            # (Word/LibreOffice exports) use indirect lengths on
            # every content stream
            length = resolve_len(int(rm.group(1)))
    if length is not None:
        data_end = data_start + length
        end_idx = text.find("endstream", data_end)
        if end_idx == -1 or end_idx > data_end + 4:
            # declared length doesn't land at an endstream marker:
            # distrust it and fall back to the marker search
            end_idx = text.find("endstream", data_start)
            data_end = end_idx
    else:
        end_idx = text.find("endstream", data_start)
        data_end = end_idx
    if data_end == -1 or end_idx == -1:
        raise PdfParseError(f"unterminated stream in object {num}")
    em = text.find("endobj", end_idx)
    return (
        num,
        head,
        text[data_start:data_end],
        em + 6 if em != -1 else end_idx + 9,
    )


def _scan_objects(text: str) -> dict[int, tuple[str, str | None]]:
    """Sequential whole-file object scan (the xref-less fallback):
    obj_num -> (dict/body text, raw stream or None)."""
    objects: dict[int, tuple[str, str | None]] = {}
    # one pass over the text collects every bare-integer object up
    # front (length objects are integers and never streams), so each
    # indirect /Length resolves with a dict lookup instead of a
    # full-text regex — O(n) total, not O(n * streams)
    int_objects = {
        int(m.group(1)): int(m.group(2))
        for m in re.finditer(r"(?<!\d)(\d+)\s+0\s+obj\s*(\d+)\s*endobj", text)
    }
    pos = 0
    n = len(text)
    while pos < n:
        parsed = _parse_object_at(text, pos, int_objects.get)
        if parsed is None:
            break
        num, head, stream, pos = parsed
        objects[num] = (head, stream)
    _maybe_decrypt(objects, text)
    _merge_object_streams(objects)
    return objects


_STARTXREF_RE = re.compile(r"startxref\s+(\d+)")
_XREF_SUBSEC_RE = re.compile(r"(\d+)\s+(\d+)\s*\r?\n")
_XREF_ENTRY_RE = re.compile(r"(\d{10})\s(\d{5})\s([nf])")
_TRAILER_ROOT_RE = re.compile(r"/Root\s+(\d+)\s+0\s+R")
_PREV_RE = re.compile(r"/Prev\s+(\d+)")
_XREFSTM_RE = re.compile(r"/XRefStm\s+(\d+)")
_W_RE = re.compile(r"/W\s*\[([^\]]*)\]")
_INDEX_RE = re.compile(r"/Index\s*\[([^\]]*)\]")
_SIZE_RE = re.compile(r"/Size\s+(\d+)")


def _parse_xref_at(
    text: str, off: int, entries: dict[int, tuple], state: dict
) -> None:
    """Parse ONE xref section (classic table or /Type /XRef stream,
    PDF 32000-1 §7.5.4/§7.5.8) at byte offset ``off``. First-seen
    wins in ``entries`` (the chain is walked newest revision first),
    matching incremental-update semantics. Queues /Prev and hybrid
    /XRefStm offsets onto state['queue']; records the newest /Root."""
    n = len(text)
    m = re.compile(r"\s*xref\b").match(text, off)
    if m:  # classic cross-reference table
        pos = m.end()
        while True:
            while pos < n and text[pos] in "\r\n ":
                pos += 1
            # subsection header is "start count\n"; stop at 'trailer'
            sub = _XREF_SUBSEC_RE.match(text, pos) if pos < n else None
            if not sub:
                break
            start, count = int(sub.group(1)), int(sub.group(2))
            pos = sub.end()
            for i in range(count):
                em = _XREF_ENTRY_RE.match(text, pos)
                if not em:
                    break
                if em.group(3) == "n":
                    entries.setdefault(start + i, ("o", int(em.group(1))))
                pos = em.end()
                # entries are 20 bytes incl. the 2-char EOL
                while pos < n and text[pos] in "\r\n ":
                    pos += 1
        tp = text.find("trailer", pos)
        if tp == -1:
            raise PdfParseError("xref table without trailer")
        tend = text.find(">>", tp)
        tdict = text[tp : tend if tend != -1 else tp + 2048]
        rm = _TRAILER_ROOT_RE.search(tdict)
        if rm and state.get("root") is None:
            state["root"] = int(rm.group(1))
        xm = _XREFSTM_RE.search(tdict)
        if xm:  # hybrid-reference file: the stream has the real rows
            state["queue"].append(int(xm.group(1)))
        pm = _PREV_RE.search(tdict)
        if pm:
            state["queue"].append(int(pm.group(1)))
        return
    # cross-reference STREAM (/Type /XRef): binary rows of /W-sized
    # big-endian fields, usually Flate + PNG-predictor encoded
    parsed = _parse_object_at(text, off, lambda _n: None)
    if parsed is None or parsed[2] is None:
        raise PdfParseError(f"no xref section at offset {off}")
    _num_, head, stream, _end = parsed
    if "/XRef" not in head:
        raise PdfParseError(f"object at startxref offset {off} is not /XRef")
    wm = _W_RE.search(head)
    sm = _SIZE_RE.search(head)
    if not wm or not sm:
        raise PdfParseError("xref stream missing /W or /Size")
    widths = [int(x) for x in re.findall(r"\d+", wm.group(1))]
    if len(widths) != 3 or sum(widths) == 0:
        raise PdfParseError(f"bad /W {widths}")
    im = _INDEX_RE.search(head)
    index = (
        [int(x) for x in re.findall(r"\d+", im.group(1))]
        if im
        else [0, int(sm.group(1))]
    )
    raw = _decode_stream(head, stream).encode("latin-1")
    w1, w2, w3 = widths
    rw = w1 + w2 + w3
    rows = len(raw) // rw
    pairs = [(index[i], index[i + 1]) for i in range(0, len(index) - 1, 2)]
    r = 0
    for start, count in pairs:
        for i in range(count):
            if r >= rows:
                break
            rec = raw[r * rw : (r + 1) * rw]
            r += 1
            typ = int.from_bytes(rec[:w1], "big") if w1 else 1
            f2 = int.from_bytes(rec[w1 : w1 + w2], "big")
            f3 = int.from_bytes(rec[w1 + w2 :], "big")
            if typ == 1:  # plain object at byte offset f2
                entries.setdefault(start + i, ("o", f2))
            elif typ == 2:  # packed in ObjStm f2 at index f3
                entries.setdefault(start + i, ("s", f2, f3))
    rm = _TRAILER_ROOT_RE.search(head)
    if rm and state.get("root") is None:
        state["root"] = int(rm.group(1))
    pm = _PREV_RE.search(head)
    if pm:
        state["queue"].append(int(pm.group(1)))


def _xref_objects(
    text: str,
) -> tuple[dict[int, tuple[str, str | None]], int | None]:
    """Resolve objects via the cross-reference chain: O(xref + used
    objects), not O(file) — the last `startxref` names the newest
    section; /Prev links walk older revisions; first-seen entry wins.
    The reference gets this from docling-parse/pdfium
    (reference:docling_conversion.py:153-165). Raises PdfParseError
    when the chain is absent/broken (caller falls back to the
    whole-file scan)."""
    sx = None
    for m in _STARTXREF_RE.finditer(text):
        sx = m  # last startxref wins
    if sx is None:
        raise PdfParseError("no startxref")
    entries: dict[int, tuple] = {}
    state: dict = {"root": None, "queue": [int(sx.group(1))]}
    seen: set[int] = set()
    hops = 0
    while state["queue"] and hops < 64:
        off = state["queue"].pop(0)
        if off in seen or not 0 <= off < len(text):
            continue
        seen.add(off)
        hops += 1
        _parse_xref_at(text, off, entries, state)
    if not entries:
        raise PdfParseError("empty xref chain")

    def resolve_len(num: int) -> int | None:
        e = entries.get(num)
        if e and e[0] == "o":
            p = _parse_object_at(text, e[1], lambda _n: None)
            if p and p[0] == num and p[2] is None:
                im = re.match(r"\s*(\d+)\s*$", p[1])
                if im:
                    return int(im.group(1))
        return None

    objects: dict[int, tuple[str, str | None]] = {}
    for num, e in entries.items():
        if e[0] != "o":
            continue
        try:
            p = _parse_object_at(text, e[1], resolve_len)
        except PdfParseError:
            continue
        if p is not None and p[0] == num:
            objects[num] = (p[1], p[2])
    _maybe_decrypt(objects, text)
    _merge_object_streams(objects)
    return objects, state["root"]


# ----------------------------------------------------------------- #
# Standard security handler (PDF 32000-1 §7.6.3): crawl PDFs are
# frequently RC4-encrypted with an EMPTY user password (viewers open
# them without prompting; the bytes are still enciphered). Supported:
# /Filter /Standard, V 1-2, R 2-3 (RC4 40-128 bit). AES (V 4-5) and
# real passwords yield a typed PdfParseError -> contained failure
# row, matching the reference's behavior of surfacing backend errors
# per document.
# ----------------------------------------------------------------- #

_PW_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


def _rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray()
    i = j = 0
    for ch in data:
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out.append(ch ^ S[(S[i] + S[j]) & 0xFF])
    return bytes(out)


def _pdf_string_value(body: str, key: str) -> bytes | None:
    """Value of ``/key`` when it is a literal (…) or hex <…> string;
    literal scanning honors backslash escapes and nested parens (the
    /O and /U fields are 32 raw bytes, full of both)."""
    m = re.search(re.escape(key) + r"\s*(?=[(<])", body)
    if not m:
        return None
    pos = m.end()
    if body[pos] == "<":
        end = body.find(">", pos)
        hx = re.sub(r"\s+", "", body[pos + 1 : end])
        if len(hx) % 2:
            hx += "0"
        try:
            return bytes.fromhex(hx)
        except ValueError:  # corrupted hex string (crawl truncation)
            return None
    depth = 0
    i = pos
    n = len(body)
    out_start = pos + 1
    while i < n:
        c = body[i]
        if c == "\\":
            i += 2
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                # 'replace' guards malformed octal escapes like \777
                # (chr(511) has no latin-1 byte); the key bytes are
                # wrong either way for such a corrupt string, but the
                # error stays typed (password-verification failure)
                return _unescape(body[out_start:i]).encode("latin-1", "replace")
        i += 1
    return None


def _hash_2b(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """PDF 2.0 Algorithm 2.B iterated hash (ISO 32000-2 §7.6.4.3.4,
    the R6 password hardening): SHA-256 seed, then rounds of
    AES-128-CBC over 64 repetitions with a data-dependent digest
    choice, until >=64 rounds and the last byte bounds the count."""
    import hashlib

    from docling_serve_spark.extract import aes as _aes

    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = _aes.cbc_encrypt(k[:16], k1, k[16:32])
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _std_security_key(body: str, id0: bytes) -> tuple[bytes, str]:
    """File-encryption key for the EMPTY user password -> (key,
    cipher) with cipher in {'rc4', 'aes-v4', 'aes-v5'}. Supports the
    standard handler revisions found in crawls: R2/R3 (RC4 40-128),
    R4 (/CFM /V2 rc4 or /AESV2), and V5 R5/R6 (AES-256, SHA-2 key
    derivation per ISO 32000-2). Raises for other handlers or a real
    password."""
    import hashlib

    from docling_serve_spark.extract import aes as _aes

    if "/Standard" not in body:
        raise PdfParseError("unsupported security handler")
    vm = re.search(r"/V\s+(\d+)", body)
    rm = re.search(r"/R\s+(\d+)", body)
    v = int(vm.group(1)) if vm else 0
    r = int(rm.group(1)) if rm else 2
    o = _pdf_string_value(body, "/O")
    u = _pdf_string_value(body, "/U")
    if o is None or u is None:
        raise PdfParseError("encrypt dict missing /O or /U")

    if v == 5 and r in (5, 6):
        # AES-256: /U = hash(32) + validation salt(8) + key salt(8)
        ue = _pdf_string_value(body, "/UE")
        if ue is None or len(u) < 48 or len(ue) < 32:
            raise PdfParseError("encrypt dict missing /UE or short /U")
        val_salt, key_salt = u[32:40], u[40:48]
        if r == 6:
            ok = _hash_2b(b"", val_salt) == u[:32]
            inter = _hash_2b(b"", key_salt)
        else:  # R5 (Adobe ExtensionLevel 3)
            ok = hashlib.sha256(val_salt).digest() == u[:32]
            inter = hashlib.sha256(key_salt).digest()
        if not ok:
            raise PdfParseError("encrypted PDF: password protected")
        key = _aes.cbc_decrypt(inter, ue[:32], iv=b"\x00" * 16)
        return key, "aes-v5"

    if v not in (1, 2, 4) or r not in (2, 3, 4):
        raise PdfParseError(f"unsupported encryption V={v} R={r}")
    cipher = "rc4"
    if v == 4:
        # crypt filters: /StdCF /CFM names the algorithm
        if "/AESV2" in body:
            cipher = "aes-v4"
        elif "/V2" not in body and "/Identity" not in body:
            raise PdfParseError("unsupported V4 crypt filter")
    pm = re.search(r"/P\s+(-?\d+)", body)
    p = int(pm.group(1)) if pm else -1
    lm = re.search(r"/Length\s+(\d+)", body)
    if r == 2:
        nbytes = 5
    elif lm:
        lv = int(lm.group(1))
        # top-level /Length is bits; a CF-dict /Length is bytes
        nbytes = lv // 8 if lv >= 40 else lv
    else:
        nbytes = 16 if v == 4 else 5
    h = hashlib.md5(
        _PW_PAD + o[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    )
    if r >= 4 and "/EncryptMetadata false" in body:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()[:nbytes]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()[:nbytes]
    # Algorithm 4/5: verify the empty USER password against /U;
    # mismatch = a real password we cannot know
    if r == 2:
        ok = _rc4(key, _PW_PAD) == u[:32]
    else:
        x = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        ok = x[:16] == u[:16]
    if not ok:
        raise PdfParseError("encrypted PDF: password protected")
    return key, cipher


def _object_key(
    key: bytes, num: int, gen: int = 0, aes: bool = False
) -> bytes:
    """Per-object key (Algorithm 1): md5(key + objnum[3 LE] +
    gen[2 LE] [+ 'sAlT' for AESV2]), truncated to min(len+5, 16)."""
    import hashlib

    d = hashlib.md5(
        key
        + num.to_bytes(3, "little")
        + gen.to_bytes(2, "little")
        + (b"sAlT" if aes else b"")
    ).digest()
    return d[: min(len(key) + 5, 16)]


def _decrypt_bytes(raw: bytes, key: bytes, cipher: str, num: int) -> bytes:
    from docling_serve_spark.extract import aes as _aes

    if cipher == "rc4":
        return _rc4(_object_key(key, num), raw)
    if cipher == "aes-v4":
        k = _object_key(key, num, aes=True)
    else:  # aes-v5: the file key is used directly (ISO 32000-2)
        k = key
    # stream layout: 16-byte IV || CBC ciphertext, PKCS#5-padded
    return _aes.strip_pkcs5(_aes.cbc_decrypt(k, raw))


def _maybe_decrypt(objects: dict[int, tuple[str, str | None]], text: str) -> None:
    """If the file carries a trailer /Encrypt ref, derive the key for
    the empty user password and decrypt every stream in place (xref
    streams are never encrypted, spec §7.5.8.2; the Encrypt dict has
    no stream). Runs BEFORE ObjStm merge so containers inflate from
    plaintext."""
    # search only trailer dicts and xref-stream dicts — a compressed
    # stream body containing '/Encrypt N 0 R'-shaped bytes must not
    # flip an unencrypted file into the decrypt path
    regions = [text[m.end() : m.end() + 2048] for m in re.finditer(r"trailer", text)]
    regions += [head for head, _s in objects.values() if "/XRef" in head]
    em = idm = None
    for region in regions:
        for m in re.finditer(r"/Encrypt\s+(\d+)\s+0\s+R", region):
            em = m  # newest revision wins
        for m in re.finditer(r"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>", region):
            idm = m
    if em is None:
        return
    enc_num = int(em.group(1))
    enc = objects.get(enc_num)
    if enc is None:
        raise PdfParseError("encrypted PDF: Encrypt dict unresolvable")
    id_hex = re.sub(r"\s+", "", idm.group(1)) if idm else ""
    if len(id_hex) % 2:  # corrupted /ID (odd digit count)
        id_hex += "0"
    id0 = bytes.fromhex(id_hex)
    key, cipher = _std_security_key(enc[0], id0)
    for num, (head, stream) in list(objects.items()):
        if stream is None or num == enc_num or "/XRef" in head:
            continue
        if (
            any("/" + f in head for f in _IMAGE_FILTERS)
            or "/Metadata" in head
            or "/FontFile" in head
        ):
            # never text-bearing; skip the (pure-Python) AES work —
            # in a typical encrypted PDF images are most of the bytes
            objects[num] = (head, "")
            continue
        plain = _decrypt_bytes(stream.encode("latin-1"), key, cipher, num)
        objects[num] = (head, plain.decode("latin-1"))


_OBJSTM_N_RE = re.compile(r"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(r"/First\s+(\d+)")


def _merge_object_streams(objects: dict[int, tuple[str, str | None]]) -> None:
    """PDF 1.5+ object streams (/Type /ObjStm): modern writers pack
    all non-stream objects (page dicts, font dicts, CMaps' owners)
    into compressed container streams, invisible to a top-level scan.
    Inflate each container, read its (objnum offset) header pairs, and
    merge the embedded objects — top-level definitions win (a classic
    incremental update overrides the packed copy)."""
    for head, stream in list(objects.values()):
        if stream is None or "/ObjStm" not in head:
            continue
        nm, fm = _OBJSTM_N_RE.search(head), _OBJSTM_FIRST_RE.search(head)
        if not (nm and fm):
            continue
        try:
            content = _decode_stream(head, stream)
        except PdfParseError:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        header_ints = re.findall(r"\d+", content[:first])
        pairs = [
            (int(header_ints[2 * i]), int(header_ints[2 * i + 1]))
            for i in range(min(n, len(header_ints) // 2))
        ]
        for i, (num, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(content) - first
            body = content[first + off : first + end]
            objects.setdefault(num, (body, None))


_PREDICTOR_RE = re.compile(r"/Predictor\s+(\d+)")
_COLUMNS_RE = re.compile(r"/Columns\s+(\d+)")
_COLORS_RE = re.compile(r"/Colors\s+(\d+)")


def _png_unpredict(data: bytes, columns: int, colors: int = 1) -> bytes:
    """Reverse PNG row predictors (PDF 32000-1 §7.4.4.4 / RFC 2083):
    each row is 1 filter byte + `columns*colors` bytes. Modern writers
    apply Predictor 12 (PNG Up) to ObjStm/XRef streams."""
    bpp = colors  # 8 bits per component
    row_len = columns * colors
    out = bytearray()
    prev = bytearray(row_len)
    pos = 0
    n = len(data)
    while pos + 1 <= n:
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + row_len])
        pos += 1 + row_len
        if ft == 1:  # Sub
            for i in range(bpp, len(row)):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(len(row)):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        # ft == 0: None
        out.extend(row)
        prev = row
    return bytes(out)


_FILTER_VAL_RE = re.compile(r"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")

# image codecs (DCT/JPX/JBIG2/CCITT): not text-bearing — a content
# stream never uses them; decoding stops with empty output so one
# exotic object cannot fail the document
_IMAGE_FILTERS = {"DCTDecode", "DCT", "JPXDecode", "JBIG2Decode",
                  "CCITTFaxDecode", "CCF"}


def _ascii_hex_decode(data: bytes) -> bytes:
    body = data.split(b">", 1)[0]
    hx = re.sub(rb"\s+", b"", body)
    if len(hx) % 2:
        hx += b"0"  # PDF 32000-1 §7.4.2: odd final digit implies 0
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except ValueError as e:
        raise PdfParseError(f"ASCIIHex decode error: {e}") from None


def _ascii85_decode(data: bytes) -> bytes:
    import base64

    body = data.split(b"~>", 1)[0]
    try:
        return base64.a85decode(re.sub(rb"\s+", b"", body))
    except ValueError as e:
        raise PdfParseError(f"ASCII85 decode error: {e}") from None


def _runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        l = data[pos]
        pos += 1
        if l == 128:  # EOD
            break
        if l < 128:
            out.extend(data[pos : pos + l + 1])
            pos += l + 1
        else:
            if pos < n:
                out.extend(data[pos : pos + 1] * (257 - l))
                pos += 1
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """LZW per PDF 32000-1 §7.4.4 / TIFF 6: 9→12-bit MSB-first codes,
    256=clear, 257=EOD, EarlyChange width bump one code early."""
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    prev: bytes | None = None
    out = bytearray()
    bitbuf = bitcnt = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
            bitcnt -= width
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise PdfParseError(f"bad LZW start code {code}")
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:  # KwKwK case
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise PdfParseError(f"bad LZW code {code}")
            out.extend(entry)
            prev = entry
            if next_code >= (1 << width) - early and width < 12:
                width += 1
    return bytes(out)


def _decode_stream(head: str, stream: str) -> str:
    """Apply the stream's /Filter chain (name or array, applied in
    order): Flate (zlib), LZW, ASCIIHex, ASCII85, RunLength — the
    text-bearing subset of PDF 32000-1 §7.4 — then reverse PNG row
    predictors (DecodeParms /Predictor >= 10). Image codecs (DCT,
    JPX, JBIG2, CCITTFax) yield empty output rather than garbage.
    (The reference's backends get arbitrary filters from pdfium/qpdf,
    docling_conversion.py:153-165.)"""
    fm = _FILTER_VAL_RE.search(head)
    if not stream or not fm:
        return stream
    names = re.findall(r"/([A-Za-z0-9]+)", fm.group(1))
    raw = stream.encode("latin-1")
    for name in names:
        if name in _IMAGE_FILTERS:
            return ""
        if name in ("FlateDecode", "Fl"):
            import zlib

            try:
                raw = zlib.decompress(raw)
            except zlib.error as e:
                raise PdfParseError(f"flate decode error: {e}") from None
        elif name in ("LZWDecode", "LZW"):
            raw = _lzw_decode(raw)
        elif name in ("ASCIIHexDecode", "AHx"):
            raw = _ascii_hex_decode(raw)
        elif name in ("ASCII85Decode", "A85"):
            raw = _ascii85_decode(raw)
        elif name in ("RunLengthDecode", "RL"):
            raw = _runlength_decode(raw)
        elif name == "Crypt":
            return ""  # unsupported security filter
        # unknown name: leave bytes as-is (conservative pass-through)
    pm = _PREDICTOR_RE.search(head)
    if pm and int(pm.group(1)) >= 10:
        cm = _COLUMNS_RE.search(head)
        km = _COLORS_RE.search(head)
        raw = _png_unpredict(
            raw,
            int(cm.group(1)) if cm else 1,
            int(km.group(1)) if km else 1,
        )
    return raw.decode("latin-1")


_CSR_BLOCK_RE = re.compile(
    r"begincodespacerange(.*?)endcodespacerange", re.DOTALL
)
_BFCHAR_RE = re.compile(r"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(r"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX2_RE = re.compile(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_RANGE_RE = re.compile(
    r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[[^\]]*\])"
)
_TOUNI_RE = re.compile(r"/ToUnicode\s+(\d+)\s+0\s+R")
#: Type0 /Encoding names with a fixed 2-byte code space (ISO 32000
#: §9.7.5.2 predefined CMaps): Identity-H/V plus the UCS2/UTF16
#: national-registry families (UniJIS-UCS2-H, UniGB-UTF16-V, ...).
_T0_2B_ENC_RE = re.compile(
    r"/Encoding\s*/(?:Identity-[HV]|Uni[A-Za-z0-9]+-(?:UCS2|UTF16)[A-Za-z0-9-]*-[HV])"
)
_RESOURCES_REF_RE = re.compile(r"/Resources\s+(\d+)\s+0\s+R")
_FONT_DICT_RE = re.compile(r"/Font\s*<<(.*?)>>", re.DOTALL)
_FONT_REF_RE = re.compile(r"/Font\s+(\d+)\s+0\s+R")
_NAME_REF_RE = re.compile(r"/([^\s/<>\[\]()]+)\s+(\d+)\s+0\s+R")


def _utf16be(hx: str) -> str:
    try:
        return bytes.fromhex(hx).decode("utf-16-be", "ignore")
    except ValueError:
        return ""


def _parse_cmap(cmap: str) -> _FontMap:
    """ToUnicode CMap -> _FontMap (bfchar pairs + bfrange runs; dst
    values are UTF-16BE, possibly multi-unit — ligatures etc.). All
    codespacerange pairs are parsed; mixed byte widths produce a
    variable-width map (ISO 32000 §9.7.6.2 + Adobe CMap spec §7.2)."""
    ranges: list[tuple[int, int, int]] = []
    for block in _CSR_BLOCK_RE.findall(cmap):
        for lo, hi in _HEX2_RE.findall(block):
            ranges.append((max(1, len(lo) // 2), int(lo, 16), int(hi, 16)))
    width = ranges[0][0] if ranges else 1
    mixed = len({w for w, _, _ in ranges}) > 1
    mapping: dict[int, str] = {}
    for block in _BFCHAR_RE.findall(cmap):
        for src, dst in _HEX2_RE.findall(block):
            mapping[int(src, 16)] = _utf16be(dst)
    for block in _BFRANGE_RE.findall(cmap):
        for lo, hi, dst in _RANGE_RE.findall(block):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if dst.startswith("["):
                dsts = re.findall(r"<([0-9A-Fa-f]+)>", dst)
                for k, d in enumerate(dsts):
                    if lo_i + k <= hi_i:
                        mapping[lo_i + k] = _utf16be(d)
            else:
                base_hex = dst.strip("<>")
                base = int(base_hex, 16)
                # only the last UTF-16 unit increments across a range
                prefix = _utf16be(base_hex[:-4]) if len(base_hex) > 4 else ""
                base_unit = base & 0xFFFF
                for k in range(min(hi_i - lo_i, 0xFFFF) + 1):
                    v = base_unit + k
                    # a hostile/malformed range crossing U+D800-DFFF would
                    # emit lone surrogates that Arrow cannot serialize
                    # (fails the whole task, not the row) — drop them,
                    # matching _utf16be's errors='ignore' policy
                    ch = "" if 0xD800 <= v <= 0xDFFF or v > 0x10FFFF else chr(v)
                    mapping[lo_i + k] = prefix + ch
    return _FontMap(width, mapping, tuple(ranges) if mixed else None)


_ENC_NAME_RE = re.compile(r"/Encoding\s*/([A-Za-z]+)")
_BASE_ENC_RE = re.compile(r"/BaseEncoding\s*/([A-Za-z]+)")
_ENC_REF_RE = re.compile(r"/Encoding\s+(\d+)\s+0\s+R")
_ENC_DICT_RE = re.compile(r"/Encoding\s*<<")
_DIFF_RE = re.compile(r"/Differences\s*\[(.*?)\]", re.DOTALL)
_DIFF_TOK_RE = re.compile(r"(\d+)|/([^\s/<>\[\]()]+)")


def _balanced_dict(src: str, start: int) -> str:
    """Source of the ``<< ... >>`` dict opening at ``start`` (nesting
    respected; returns the inside, without the outer delimiters)."""
    depth = 0
    i = start
    n = len(src)
    while i < n - 1:
        pair = src[i : i + 2]
        if pair == "<<":
            depth += 1
            i += 2
        elif pair == ">>":
            depth -= 1
            if depth == 0:
                return src[start + 2 : i]
            i += 2
        else:
            i += 1
    return src[start + 2 :]


def _font_encoding_map(
    objects: dict[int, tuple[str, str | None]], body: str
) -> dict[int, str] | None:
    """Simple-font /Encoding -> code->unicode map (PDF 32000-1:2008
    §9.6.5): a named base encoding (/WinAnsiEncoding et al.) or an
    encoding dict with /BaseEncoding + /Differences of AGL glyph
    names. This is the no-ToUnicode real-world path — Word-family
    writers emit WinAnsi simple fonts where bytes 0x80-0x9F (curly
    quotes, en/em dashes) differ from the latin-1 passthrough the
    tokenizer otherwise applies. Type0 fonts are excluded: their
    /Encoding names a CID CMap (glyph IDs, not characters), which
    only a /ToUnicode map can take to text."""
    from docling_serve_spark.extract.glyphlist import (
        BASE_ENCODINGS,
        glyph_to_unicode,
    )

    if "/Type0" in body:
        return None
    enc_src = None
    m = _ENC_DICT_RE.search(body)
    if m:
        enc_src = _balanced_dict(body, m.end() - 2)
    else:
        m = _ENC_REF_RE.search(body)
        if m and int(m.group(1)) in objects:
            enc_src = objects[int(m.group(1))][0]
        else:
            m = _ENC_NAME_RE.search(body)
            if m:
                base = BASE_ENCODINGS.get(m.group(1))
                return dict(base) if base else None
    if enc_src is None:
        return None
    mapping: dict[int, str] = {}
    bm = _BASE_ENC_RE.search(enc_src)
    if bm and bm.group(1) in BASE_ENCODINGS:
        mapping.update(BASE_ENCODINGS[bm.group(1)])
    dm = _DIFF_RE.search(enc_src)
    if dm:
        code = 0
        for num, name in _DIFF_TOK_RE.findall(dm.group(1)):
            if num:
                code = int(num)
                continue
            uni = glyph_to_unicode(name)
            if uni is not None and 0 <= code <= 255:
                mapping[code] = uni
            elif 0 <= code <= 255:
                mapping.pop(code, None)  # unknown glyph: raw passthrough
            code += 1
    return mapping or None


def _resources_src(
    objects: dict[int, tuple[str, str | None]], body: str
) -> str:
    rm = _RESOURCES_REF_RE.search(body)
    if rm and int(rm.group(1)) in objects:
        return objects[int(rm.group(1))][0]
    return body


def _page_fonts(
    objects: dict[int, tuple[str, str | None]],
    page_body: str,
    cache: dict[int, _FontMap | None],
) -> dict[str, _FontMap]:
    """Resolve the page's /Resources /Font entries to ToUnicode maps
    (cached per font object — fonts are shared across pages)."""
    res = _resources_src(objects, page_body)
    fm = _FONT_DICT_RE.search(res)
    if fm:
        font_src = fm.group(1)
    else:
        fr = _FONT_REF_RE.search(res)
        if not (fr and int(fr.group(1)) in objects):
            return {}
        font_src = objects[int(fr.group(1))][0]
    fonts: dict[str, _FontMap] = {}
    for name, ref in _NAME_REF_RE.findall(font_src):
        ref_i = int(ref)
        if ref_i not in cache:
            cache[ref_i] = None
            body, _ = objects.get(ref_i, ("", None))
            tm = _TOUNI_RE.search(body)
            if tm and int(tm.group(1)) in objects:
                chead, cstream = objects[int(tm.group(1))]
                try:
                    cache[ref_i] = _parse_cmap(
                        _decode_stream(chead, cstream or "")
                    )
                except (PdfParseError, ValueError):
                    cache[ref_i] = None
            if cache[ref_i] is None:
                # no (usable) ToUnicode: fall back to the font's
                # declared simple encoding, if any
                enc = _font_encoding_map(objects, body)
                if enc:
                    cache[ref_i] = _FontMap(1, enc)
            if "/Type0" in body and _T0_2B_ENC_RE.search(body):
                # composite (CID-keyed) font under a fixed-2-byte
                # encoding CMap (ISO 32000 §9.7.6.2: Identity-H/V and
                # the UCS2/UTF16 predefined CMaps): the CODE width is
                # governed by the ENCODING CMap, not by whatever
                # codespacerange the ToUnicode stream declares —
                # subsetters routinely write <00><FF> there, which
                # would split every 2-byte CID into two garbage bytes.
                fm_ = cache[ref_i]
                if fm_ is not None and (fm_.width != 2 or fm_.ranges):
                    cache[ref_i] = _FontMap(2, fm_.map)
                elif fm_ is None:
                    # Identity-coded CIDs with no ToUnicode are glyph
                    # ids, not characters — emit nothing rather than
                    # latin-1 mojibake from raw CID bytes
                    cache[ref_i] = _FontMap(2, {})
        if cache[ref_i] is not None:
            fonts[name] = cache[ref_i]
    return fonts


_XOBJ_DICT_RE = re.compile(r"/XObject\s*<<(.*?)>>", re.DOTALL)
_XOBJ_REF_RE = re.compile(r"/XObject\s+(\d+)\s+0\s+R")


def _page_xobjects(
    objects: dict[int, tuple[str, str | None]],
    body: str,
    font_cache: dict[int, _FontMap | None],
    depth: int = 0,
) -> dict[str, tuple]:
    """Resolve /Resources /XObject entries to (stream, fonts, nested
    xobjects) for Form XObjects — OCR tools put the recognized-text
    layer in a form invoked via ``name Do``, not in the page content
    stream itself. Images are skipped; recursion capped."""
    if depth > 3:
        return {}
    res = _resources_src(objects, body)
    xm = _XOBJ_DICT_RE.search(res)
    if xm:
        src = xm.group(1)
    else:
        xr = _XOBJ_REF_RE.search(res)
        if not (xr and int(xr.group(1)) in objects):
            return {}
        src = objects[int(xr.group(1))][0]
    out: dict[str, tuple] = {}
    for name, ref in _NAME_REF_RE.findall(src):
        head, stream = objects.get(int(ref), ("", None))
        if stream is None or "/Image" in head:
            continue
        try:
            s = _decode_stream(head, stream)
        except PdfParseError:
            continue
        fonts = _page_fonts(objects, head, font_cache)
        sub = _page_xobjects(objects, head, font_cache, depth + 1)
        out[name] = (s, fonts, sub)
    return out


def parse_pdf_pages(data: bytes) -> tuple[list[list[_Run]], bool]:
    """Objects -> ordered per-page run lists + tagged flag.

    Object resolution tries the cross-reference chain first
    (O(xref), robust to binary streams containing 'N 0 obj'-shaped
    bytes), and falls back to the whole-file sequential scan when the
    chain is absent or broken — crawl PDFs are frequently truncated
    mid-transfer, which severs the trailer."""
    if not data.startswith(b"%PDF"):
        raise PdfParseError("not a PDF: missing %PDF header")
    text = data.decode("latin-1")
    pages: list[list[_Run]] = []
    try:
        objects, xroot = _xref_objects(text)
        root_refs = [str(xroot)] if xroot is not None else []
        pages = _build_pages(objects, root_refs, stream_fallback=False)
    except PdfParseError:
        pages = []
    if not pages:
        objects = _scan_objects(text)
        # the LAST trailer/xref-dict /Root pointer is authoritative:
        # incrementally-updated files (e.g. an OCR layer appended by
        # ocrmypdf) carry one catalog per revision, newest at file end
        root_refs = re.findall(r"/Root\s+(\d+)\s+0\s+R", text)
        pages = _build_pages(objects, root_refs, stream_fallback=True)
    if not pages:
        raise PdfParseError("no content streams found")
    return pages, is_tagged_pdf(data)


def _build_pages(
    objects: dict[int, tuple[str, str | None]],
    root_refs: list[str],
    stream_fallback: bool,
) -> list[list[_Run]]:
    """Page-tree walk over a resolved object table. ``root_refs`` are
    candidate catalog object numbers, newest LAST (reversed here)."""
    pages: list[list[_Run]] = []
    # root page tree: catalog /Pages ref if present, else the first
    # /Type /Pages object; intermediate Pages nodes (nested /Kids)
    # are walked depth-first in document order
    root_pages = None
    for ref in reversed(root_refs):
        body, _ = objects.get(int(ref), ("", None))
        pm = re.search(r"/Pages\s+(\d+)\s+0\s+R", body)
        if pm and int(pm.group(1)) in objects:
            root_pages = int(pm.group(1))
            break
    if root_pages is None:
        for num, (body, _) in objects.items():
            if "/Type /Catalog" in body or "/Type/Catalog" in body:
                pm = re.search(r"/Pages\s+(\d+)\s+0\s+R", body)
                if pm and int(pm.group(1)) in objects:
                    root_pages = int(pm.group(1))
                    break
    if root_pages is None:
        for num, (body, _) in objects.items():
            if "/Type /Pages" in body or "/Type/Pages" in body:
                root_pages = num
                break

    kids_order: list[int] = []
    if root_pages is not None:
        seen: set[int] = set()

        def walk(num: int) -> None:
            if num in seen or num not in objects:
                return
            seen.add(num)
            body, _ = objects[num]
            km = _KIDS_RE.search(body)
            if km:
                for r in _REF_RE.findall(km.group(1)):
                    walk(int(r))
            elif "/Type /Page" in body or "/Type/Page" in body or num != root_pages:
                kids_order.append(num)

        walk(root_pages)
    if kids_order:
        font_cache: dict[int, _FontMap | None] = {}
        for kid in kids_order:
            body, own_stream = objects.get(kid, ("", None))
            refs: list[int] = []
            am = _CONTENTS_ARR_RE.search(body)
            if am:
                # /Contents [ 6 0 R 7 0 R ] — streams concatenate
                refs = [int(r) for r in _REF_RE.findall(am.group(1))]
            else:
                cm = _CONTENTS_RE.search(body)
                if cm:
                    refs = [int(cm.group(1))]
            parts = [
                _decode_stream(*objects[r]) for r in refs if r in objects
                and objects[r][1] is not None
            ]
            if parts:
                stream = "\n".join(parts)
            else:
                stream = _decode_stream(body, own_stream or "")
            fonts = _page_fonts(objects, body, font_cache)
            xobjs = _page_xobjects(objects, body, font_cache)
            pages.append(_parse_content(stream, fonts or None, xobjs or None))
    elif stream_fallback:
        # fallback: every plausible content stream in document order
        # is a page (container/font/metadata streams excluded)
        _NON_CONTENT = ("/ObjStm", "/XRef", "/Metadata", "/FontFile",
                        "/ToUnicode", "/Image")
        pages = [
            _parse_content(_decode_stream(head, stream))
            for head, stream in objects.values()
            if stream is not None
            and not any(k in head for k in _NON_CONTENT)
        ]
    return pages


@dataclass
class _Line:
    y: float
    runs: list[_Run]
    # geometry/text caches — valid once _group_lines has finalized the
    # run list (runs are only appended during grouping; downstream
    # stages read, never mutate)
    _size: float | None = None
    _text: str | None = None
    _bbox: "BBox | None" = None

    @property
    def x0(self) -> float:
        return self.runs[0].x

    @property
    def size(self) -> float:
        s = self._size
        if s is None:
            s = self._size = max(r.size for r in self.runs)
        return s

    def text(self) -> str:
        t = self._text
        if t is not None:
            return t
        # runs are joined with one space UNLESS the boundary already
        # carries an explicit space glyph (many writers emit ' ' as
        # its own run; blindly joining with ' ' inflated those gaps
        # to triple spaces)
        parts = [self.runs[0].text]
        for a, b in zip(self.runs, self.runs[1:]):
            if not (a.text.endswith(" ") or b.text.startswith(" ")):
                parts.append(" ")
            parts.append(b.text)
        t = self._text = "".join(parts).strip()
        return t


_Y_TOL = 2.0
# x-gap between run *starts* on the same baseline that implies a column
# gutter (splits the line) rather than table-column alignment (keeps it):
# the synthetic corpus uses ~150pt tab stops for tables and >240pt for
# 2-column layouts; 200pt separates the two regimes.
_COL_GAP = 200.0


def _group_lines(runs: list[_Run]) -> list[_Line]:
    lines: list[_Line] = []
    for r in sorted(runs, key=lambda r: (-r.y, r.x)):
        if not r.text:
            continue
        if (
            lines
            and abs(lines[-1].y - r.y) <= _Y_TOL
            and r.x - lines[-1].runs[-1].x <= _COL_GAP
        ):
            lines[-1].runs.append(r)
        else:
            lines.append(_Line(r.y, [r]))
    for ln in lines:
        ln.runs.sort(key=lambda r: r.x)
    return lines


def _assign_columns(lines: list[_Line]) -> list[int]:
    """C2 — x-histogram column clustering: two clusters of line start
    positions separated by > 30% page width => 2-column layout."""
    if not lines:
        return []
    xs = sorted({round(ln.x0, 1) for ln in lines})
    if len(xs) >= 2 and (xs[-1] - xs[0]) > 0.30 * PAGE_W:
        split = (xs[0] + xs[-1]) / 2.0
        cols = [0 if ln.x0 < split else 1 for ln in lines]
        # a genuine 2-column layout has a balanced line split; a lone
        # wide-x line is a table cell, not a column
        share = sum(cols) / len(cols)
        if 0.3 <= share <= 0.7:
            return cols
    return [0] * len(lines)


def _estimate_width(run: _Run) -> float:
    return 0.5 * run.size * len(run.text)


def _line_bbox(ln: _Line) -> BBox:
    bb = ln._bbox
    if bb is None:
        x1 = max(r.x + _estimate_width(r) for r in ln.runs)
        bb = ln._bbox = BBox(
            l=ln.x0, t=PAGE_H - ln.y - ln.size,
            r=min(x1, PAGE_W), b=PAGE_H - ln.y,
        )
    return bb


def _merge_bbox(a: BBox, b: BBox) -> BBox:
    return BBox(min(a.l, b.l), min(a.t, b.t), max(a.r, b.r), max(a.b, b.b))


def _blocks_from_lines(lines: list[_Line]) -> list[list[_Line]]:
    """C2/C3 — block segmentation by vertical gap > 1.6x leading."""
    blocks: list[list[_Line]] = []
    for ln in lines:
        if blocks:
            prev = blocks[-1][-1]
            gap = prev.y - ln.y
            leading = max(prev.size, ln.size) * 1.6
            # gap == 0: same baseline (a wide table row split into
            # multiple line groups) stays in the block
            if 0 <= gap <= leading:
                blocks[-1].append(ln)
                continue
        blocks.append([ln])
    return blocks


def _block_is_table(block: list[_Line]) -> bool:
    """C4 fast mode — a block whose every line is >=2 runs with a
    consistent run count is an aligned-columns table
    (reference table_mode default 'fast', convert.py:212-223)."""
    if len(block) < 2:
        return False
    counts = {len(ln.runs) for ln in block}
    return len(counts) == 1 and counts.pop() >= 2


_COL_X_TOL = 3.0


def _cluster_columns(block: list[_Line]) -> list[float]:
    """Cluster run x-starts across the block into column anchors."""
    xs = sorted({round(r.x, 1) for ln in block for r in ln.runs})
    cols: list[float] = []
    for x in xs:
        if not cols or x - cols[-1] > _COL_X_TOL:
            cols.append(x)
    return cols


def _ragged_table_grid(block: list[_Line]) -> list[list[str]] | None:
    """C4 accurate mode — recover tables with MISSING cells: cluster
    x-starts into column anchors and place each run at its anchor,
    leaving gaps empty. Accepts the block as a table when there are
    >=2 anchored columns, >=2 rows, every row starts at the first
    anchor, and cell fill is >=60% (below that it's prose, not a
    grid). The whitespace-alignment analog of TableFormer's accurate
    mode (reference:datamodel/convert.py:212-223); deterministic."""
    if len(block) < 2:
        return None
    cols = _cluster_columns(block)
    if len(cols) < 2:
        return None
    # merge same-baseline line groups into one table row first (a row
    # with a missing middle cell arrives as two _Line groups)
    rows_runs: list[list[_Run]] = []
    _row_y: list[float] = []
    for ln in block:
        if rows_runs and abs(_row_y[-1] - ln.y) <= _Y_TOL:
            rows_runs[-1].extend(ln.runs)
        else:
            rows_runs.append(list(ln.runs))
            _row_y.append(ln.y)
    if len(rows_runs) < 2:
        return None
    grid: list[list[str]] = []
    filled = 0
    for runs in rows_runs:
        row = [""] * len(cols)
        for r in sorted(runs, key=lambda r: r.x):
            ci = min(range(len(cols)), key=lambda i: abs(cols[i] - r.x))
            if abs(cols[ci] - r.x) > _COL_X_TOL:
                return None
            row[ci] = (row[ci] + " " + r.text.strip()).strip()
        if not row[0]:
            return None  # rows of a grid share the leading column
        filled += sum(1 for c in row if c)
        grid.append(row)
    if filled < 0.6 * len(cols) * len(grid):
        return None
    if all(sum(1 for c in row if c) == len(cols) for row in grid):
        return None  # fully dense: fast mode's case, keep parity
    return grid


_TITLE_SIZE = 16.0
_HEADER_SIZE = 14.0


def _reading_order_lines(runs: list[_Run]) -> list[_Line]:
    """C3 — lines in reading order: column, top-to-bottom, then x."""
    lines = _group_lines(runs)
    cols = _assign_columns(lines)
    order = sorted(
        range(len(lines)), key=lambda i: (cols[i], -lines[i].y, lines[i].x0)
    )
    return [lines[i] for i in order]


def order_pages(pages: list[list[_Run]]) -> list[list[_Line]]:
    """Reading-ordered lines per page — computed once and shared by
    the quality projection (F2) and document assembly (C2-C4), so one
    PDF is tokenized and ordered exactly once per row."""
    return [_reading_order_lines(runs) for runs in pages]


def extract_pdf(data: bytes, name: str = "") -> Document:
    pages, _ = parse_pdf_pages(data)
    return extract_pdf_ordered(order_pages(pages), name=name)


def extract_pdf_ordered(
    ordered_pages: list[list[_Line]],
    name: str = "",
    first_page: int = 1,
    table_mode: str = "fast",
) -> Document:
    """``first_page`` keeps prov page numbers true when a page_range
    slice (C10) was applied upstream. ``table_mode`` ∈ {fast,
    accurate}: accurate additionally recovers ragged grids via
    column-anchor clustering (_ragged_table_grid)."""
    items: list[DocItem] = []
    saw_title = False
    for page_no, ordered in enumerate(ordered_pages, start=first_page):
        for block in _blocks_from_lines(ordered):
            bbox = _line_bbox(block[0])
            for ln in block[1:]:
                bbox = _merge_bbox(bbox, _line_bbox(ln))
            prov = [Prov(page_no=page_no, bbox=bbox)]
            if table_mode == "accurate" and not _block_is_table(block):
                ragged = _ragged_table_grid(block)
                if ragged is not None:
                    ncol = len(ragged[0])
                    items.append(
                        DocItem(
                            TABLE,
                            "",
                            prov=prov,
                            table=TableData(
                                len(ragged),
                                ncol,
                                [[TableCell(c) for c in row] for row in ragged],
                            ),
                        )
                    )
                    continue
            if _block_is_table(block):
                grid = [
                    [TableCell(r.text.strip()) for r in ln.runs] for ln in block
                ]
                ncol = max(len(r) for r in grid)
                for row in grid:
                    while len(row) < ncol:
                        row.append(TableCell(""))
                items.append(
                    DocItem(
                        TABLE,
                        "",
                        prov=prov,
                        table=TableData(len(grid), ncol, grid),
                    )
                )
                continue
            size = max(ln.size for ln in block)
            txt = " ".join(ln.text() for ln in block).strip()
            if not txt:
                continue
            if size >= _TITLE_SIZE and not saw_title:
                items.append(DocItem(TITLE, txt, level=1, prov=prov))
                saw_title = True
            elif size >= _HEADER_SIZE:
                items.append(DocItem(SECTION_HEADER, txt, level=2, prov=prov))
            else:
                items.append(DocItem(TEXT, txt, prov=prov))
    doc = Document(
        name=name,
        items=items,
        num_pages=len(ordered_pages),
        origin_mimetype="application/pdf",
    )
    return assign_charspans(doc)


def page_texts_ordered(ordered_pages: list[list[_Line]]) -> list[str]:
    """Per-page plain text (the F2 projection feeding quality
    analysis, reference:docling_serve/pdf_analysis.py:52-72)."""
    return [
        "\n".join(ln.text() for ln in ordered) for ordered in ordered_pages
    ]


def pdf_page_texts(data: bytes) -> list[str]:
    pages, _ = parse_pdf_pages(data)
    return page_texts_ordered(order_pages(pages))
