"""Post-processing operators T2-T4 (BiDi markdown) and A5 (markdown
downgrades) — pure functions shared by the Spark stage and the oracle.

T2-T4 replicate the reference's algorithm byte-for-byte
(reference:docling_serve/post_processing_bidi.py:17-87): split the
markdown keeping line ends, flag lines containing Arabic codepoints,
group consecutive RTL lines, and rewrite each RTL line by preserving
its markdown prefix (#{1,6}, bullets, >) and applying BiDi display
reordering to the body.

A5 replicates the markdown->text/html/doctags downgrades
(reference:docling_serve/response_preparation.py:24-71).
"""

from __future__ import annotations

import re

from docling_serve_spark.extract.bidi import get_display

# T2 — RTL line predicate (post_processing_bidi.py:17)
ARABIC_RE = re.compile(r"[؀-ۿ]")

# T4 — markdown prefix capture (post_processing_bidi.py:25-30)
_PREFIX_RE = re.compile(
    r"^(?P<prefix>\s*(?:#{1,6}\s+|[-+*]\s+|>\s*))?(?P<body>.*?)(?P<nl>\n?)$"
)


def line_is_rtl(line: str) -> bool:
    return bool(ARABIC_RE.search(line))


def bidi_line(raw: str) -> str:
    """T3 — rewrite one RTL line, markdown prefix preserved."""
    m = _PREFIX_RE.match(raw)
    prefix = m.group("prefix") or ""
    body = m.group("body") or ""
    nl = m.group("nl") or ""
    return prefix + get_display(body) + nl


def process_markdown_bidi(text: str) -> str:
    """T2 — walk lines, rewrite consecutive RTL blocks, keep LTR lines
    untouched (post_processing_bidi.py:60-87)."""
    if not ARABIC_RE.search(text):  # fast path: no RTL content at all
        return text
    out: list[str] = []
    for raw in text.splitlines(keepends=True):
        out.append(bidi_line(raw) if line_is_rtl(raw) else raw)
    return "".join(out)


# A5 — markdown -> plain-text downgrade (response_preparation.py:60-65)
_MD_STRIP_RE = re.compile(r"[#*_`\[\]()]")
_NL_COLLAPSE_RE = re.compile(r"\n+")


def markdown_to_text(md: str) -> str:
    return _NL_COLLAPSE_RE.sub("\n", _MD_STRIP_RE.sub("", md)).strip()


def markdown_to_html_fallback(md: str) -> str:
    """A5 html downgrade without a markdown lib
    (response_preparation.py:58)."""
    return f"<pre>{md}</pre>"


def markdown_to_doctags(md: str) -> str:
    """A5 doctags downgrade (response_preparation.py:69)."""
    return f"<document>{md}</document>"
