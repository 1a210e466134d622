"""Replay the reference repo's own golden fixtures through our
operators (SURVEY.md §5.2 item 4): the OCR-benchmark markdown exports
(reference:"OCR Benchmarks"/*/*.md — full Arabic documents) exercise
the BiDi T2-T4 and A5 downgrade paths on real data, and hypothesis
checks the algebraic invariants the byte-identity contract rests on."""

import re
from pathlib import Path

import pytest
from hypothesis import given, settings, strategies as st

from docling_serve_spark.extract.postprocess import (
    ARABIC_RE,
    line_is_rtl,
    markdown_to_text,
    process_markdown_bidi,
)
from docling_serve_spark.operators.dedup import norm_text  # noqa: F401 (spark twin)

FIXTURES = sorted(Path("/root/reference/OCR Benchmarks").rglob("*.md"))


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.parent.name + "/" + p.name)
def test_bidi_structure_preserved_on_reference_goldens(path):
    src = path.read_text(errors="replace")
    out = process_markdown_bidi(src)
    src_lines = src.splitlines(keepends=True)
    out_lines = out.splitlines(keepends=True)
    # line structure is preserved exactly
    assert len(src_lines) == len(out_lines)
    n_rtl = 0
    for a, b in zip(src_lines, out_lines):
        if line_is_rtl(a):
            n_rtl += 1
            # reordering permutes characters within the line (UAX#9 L4
            # mirrors paired brackets, so canonicalize those), never
            # adds/drops any
            canon = str.maketrans(")]}»", "([{«")
            assert sorted(a.translate(canon)) == sorted(b.translate(canon)), (
                "char multiset changed"
            )
        else:
            assert a == b, "LTR line must be untouched"
    assert n_rtl > 100  # the goldens are genuinely Arabic-heavy


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.parent.name + "/" + p.name)
def test_markdown_prefixes_survive_bidi(path):
    src = path.read_text(errors="replace")
    out = process_markdown_bidi(src)
    prefix = re.compile(r"^(\s*(?:#{1,6}\s+|[-+*]\s+|>\s*))")
    for a, b in zip(src.splitlines(), out.splitlines()):
        ma, mb = prefix.match(a), prefix.match(b)
        if ma and ARABIC_RE.search(a):
            assert mb and mb.group(1) == ma.group(1), (a[:40], b[:40])


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.parent.name + "/" + p.name)
def test_a5_downgrade_on_reference_goldens(path):
    src = path.read_text(errors="replace")
    txt = markdown_to_text(src)
    assert not re.search(r"[#*_`\[\]()]", txt)
    assert "\n\n" not in txt
    # idempotent: a second downgrade is a no-op
    assert markdown_to_text(txt) == txt


# --- algebraic invariants (hypothesis) ----------------------------- #

text_st = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_markdown_to_text_idempotent(s):
    once = markdown_to_text(s)
    assert markdown_to_text(once) == once


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_bidi_preserves_line_structure(s):
    out = process_markdown_bidi(s)
    assert len(out.splitlines(keepends=True)) == len(s.splitlines(keepends=True))
    assert len(out) == len(s)


@settings(max_examples=100, deadline=None)
@given(text_st)
def test_bidi_ltr_fixed_point(s):
    """Text with no Arabic codepoints must pass through unchanged."""
    stripped = ARABIC_RE.sub("", s)
    assert process_markdown_bidi(stripped) == stripped
