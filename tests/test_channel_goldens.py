"""Committed byte-level goldens: every export channel for the first
200 synthetic pages, hashed per url. Any change to parsing, scoring,
ordering, serialization, or normalization shows up here as a diff —
the cross-round drift detector for the north rule's byte-identity
contract.

If a change is INTENTIONAL (a deliberate algorithm change), regenerate
with the snippet in this file's git history and say so in the commit.
"""

import hashlib
import json
from pathlib import Path

from docling_serve_spark.extract.core import ExtractOptions, extract_document
from docling_serve_spark.sources.pages import gen_page

GOLDENS = json.loads(
    (Path(__file__).parent / "goldens_channel_md5.json").read_text()
)


def _hash_channels(res) -> str:
    h = hashlib.md5()
    for ch in (res.extracted_text, res.md_content, res.html_content,
               res.doctags_content, res.json_content, res.spans_json):
        h.update(ch.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()


def test_all_channels_match_committed_goldens():
    opts = ExtractOptions(to_formats=("md", "html", "doctags", "json"))
    mismatches = []
    for i in range(200):
        r = gen_page(i)
        res = extract_document(r["html"], name=r["url"], lang=r["lang"], opts=opts)
        g = GOLDENS[r["url"]]
        if (res.status, res.doc_type, _hash_channels(res)) != (
            g["status"], g["doc_type"], g["md5"]
        ):
            mismatches.append(r["url"])
    assert not mismatches, f"{len(mismatches)} drifted: {mismatches[:5]}"
