"""Property tests for the X27 normalization primitives (pure Python
level — the Spark operator applies these elementwise, so the
properties lift to the DataFrame op)."""

import re
import unicodedata

from hypothesis import given, settings, strategies as st

from docling_serve_spark.operators.normalize import (
    _CTRL_RE,
    _WS_RE,
    _fold_accents,
)


def _clean_py(s: str) -> str:
    return re.sub(_WS_RE, " ", re.sub(_CTRL_RE, "", s)).strip()


def _norm_py(s: str) -> str:
    return unicodedata.normalize("NFC", _clean_py(s))


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_normalize_idempotent(s):
    once = _norm_py(s)
    assert _norm_py(once) == once


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_fold_accents_idempotent_and_no_marks(s):
    folded = _fold_accents(s)
    assert _fold_accents(folded) == folded
    assert not any(unicodedata.combining(c) for c in folded)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_clean_output_has_no_ctrl_or_ws_runs(s):
    out = _clean_py(s)
    assert not re.search(_CTRL_RE, out)
    assert "  " not in out and "\t" not in out and "\n" not in out
    assert out == out.strip()


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=100))
def test_fold_never_lengthens_beyond_nfd(s):
    # folding only removes combining marks from the NFD form
    nfd = unicodedata.normalize("NFD", s)
    assert len(_fold_accents(s)) <= len(nfd)


def test_charset_decls_quote_styles_and_legacy_top(spark):
    from docling_serve_spark.operators.normalize import charset_decl_stats

    pages = spark.createDataFrame(
        [
            ("http://h.com/1", b'<meta charset="utf-8">'),
            ("http://h.com/2",
             b'<meta http-equiv="Content-Type" '
             b'content="text/html; charset=windows-1256">'),
            ("http://h.com/3", b"<meta charset='windows-1256'>"),
            ("http://h.com/4", b"<meta charset=GBK>"),
            ("http://h.com/5", b"<p>no declaration</p>"),
        ],
        "url string, html binary",
    )
    r = charset_decl_stats(pages).collect()[0]
    assert (r["n_pages"], r["n_declared"], r["n_utf8"],
            r["n_legacy"]) == (5, 4, 1, 3)
    assert r["top_legacy"] == "windows-1256"
    assert r["legacy_bp"] == 6000
