"""Fast one-shot driver for stdlib ``html.parser.HTMLParser``.

``HTMLParser.feed`` is the single largest CPU item in the extraction
profile. Its cost is not the tag parsing itself but the incremental
``goahead`` loop: per-event line/column bookkeeping (``updatepos``
counts newlines over every consumed span), buffered-feed bookkeeping,
and charref-split guards that only matter for chunked feeding.

``feed_fast`` replays CPython 3.11's ``goahead(end=1)`` control flow
exactly — same branch order, same incomplete-construct recovery, same
rawtext (script/style) handling — but one-shot over the whole string,
delegating every tag construct to the parser's own ``parse_starttag``
/ ``parse_endtag`` / ``parse_comment`` / ``parse_pi`` /
``parse_html_declaration`` methods, so attribute/entity/tolerance
semantics are the stdlib's by construction (public CPython source:
Lib/html/parser.py). Only valid for ``convert_charrefs=True`` parsers,
which is what the tree builder uses.

Byte-equality with ``feed()+close()`` is enforced by differential
tests over the full synthetic corpus, adversarial junk, reference
fixtures, and hypothesis fuzzing (tests/test_fasthtml.py).
"""

from __future__ import annotations

import re
from html import unescape

# Fast paths for the overwhelmingly common WELL-FORMED tag shapes;
# anything the narrow grammars below do not match exactly falls back
# to the stdlib parse_starttag/parse_endtag, so tolerance semantics
# for malformed input are unchanged (differential + hypothesis tests
# in tests/test_fasthtml.py enforce byte-equality either way).
# Quoted attr values exclude '<' (stdlib allows it; those rare tags
# take the fallback), unquoted values are not fast-pathed at all.
_FAST_START = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*(?:\s*=\s*(?:\"[^\"<]*\"|'[^'<]*'))?)*)"
    r"\s*(/?)>"
)
_FAST_ATTR = re.compile(
    r"\s+([a-zA-Z_:][-a-zA-Z0-9_:.]*)(?:\s*=\s*(?:\"([^\"<]*)\"|'([^'<]*)'))?"
)
_FAST_END = re.compile(r"</([a-zA-Z][a-zA-Z0-9]*)\s*>")


def feed_fast(p, text: str) -> None:
    """Equivalent of ``p.feed(text); p.close()`` for a whole document,
    minus position bookkeeping. ``p`` must be an ``HTMLParser`` with
    ``convert_charrefs=True``."""
    p.rawdata = text
    i, n = 0, len(text)
    handle_data = p.handle_data
    find = text.find
    while i < n:
        if p.cdata_elem:
            # rawtext mode: only the exact close tag is interesting;
            # unclosed rawtext is dropped (goahead: break on no match)
            m = p.interesting.search(text, i)
            if not m:
                i = n
                break
            j = m.start()
            if i < j:
                handle_data(text[i:j])  # raw: no charref conversion
            i = j
        else:
            j = find("<", i)
            if j < 0:
                handle_data(unescape(text[i:]))
                i = n
                break
            if i < j:
                handle_data(unescape(text[i:j]))
            i = j
        # i is at '<'
        c = text[i + 1:i + 2]
        if c and c.isascii() and c.isalpha():  # starttagopen
            m = _FAST_START.match(text, i)
            if m:
                tag = m.group(1).lower()
                p.lasttag = tag
                attrs = []
                for am in _FAST_ATTR.finditer(m.group(2)):
                    v = am.group(2) if am.group(2) is not None else am.group(3)
                    if v is not None and "&" in v:
                        v = unescape(v)
                    attrs.append((am.group(1).lower(), v))
                if m.group(3):
                    p.handle_startendtag(tag, attrs)
                else:
                    p.handle_starttag(tag, attrs)
                    if tag in p.CDATA_CONTENT_ELEMENTS:
                        p.set_cdata_mode(tag)
                k = m.end()
            else:
                k = p.parse_starttag(i)
        elif c == "/":
            if p.cdata_elem is None:
                m = _FAST_END.match(text, i)
            else:  # rawtext close tags need stdlib cdata handling
                m = None
            if m:
                p.handle_endtag(m.group(1).lower())
                k = m.end()
            else:
                k = p.parse_endtag(i)
        elif text.startswith("<!--", i):
            k = p.parse_comment(i)
        elif c == "?":
            k = p.parse_pi(i)
        elif c == "!":
            k = p.parse_html_declaration(i)
        elif i + 1 < n:
            handle_data("<")
            i += 1
            continue
        else:  # lone trailing '<' (goahead breaks; close() emits it)
            handle_data("<")
            i = n
            break
        if k < 0:
            # incomplete construct at EOF: goahead(end=1) recovery —
            # emit through the next '>', else to the next '<', else
            # just the '<'
            k = find(">", i + 1)
            if k < 0:
                k = find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            if p.cdata_elem:
                handle_data(text[i:k])
            else:
                handle_data(unescape(text[i:k]))
        i = k
    p.rawdata = ""
