"""Differential test: the fast scanner must produce the same DOM tree
— hence byte-identical extraction — as stdlib HTMLParser on every
corpus we have, plus adversarial junk."""

import json

import pytest
from hypothesis import given, settings, strategies as st

from docling_serve_spark.extract import html_extract as hx
from docling_serve_spark.sources.pages import gen_page


def _tree_sig(node) -> tuple:
    if node.tag == "":
        return ("#text", node.text)
    return (
        node.tag,
        tuple(sorted((k, v) for k, v in node.attrs.items())),
        tuple(_tree_sig(c) for c in node.children),
    )


def _run(text: str, use_fast: bool):
    from docling_serve_spark.extract.fasthtml import feed_fast

    b = hx._TreeBuilder()
    try:
        if use_fast:
            feed_fast(b, text)
        else:
            b.feed(text)
            b.close()
        return ("ok", _tree_sig(b.root))
    except Exception as e:  # stdlib raises on some junk (<![' ...)
        return ("exc", type(e).__name__)


def assert_same_tree(text: str):
    assert _run(text, False) == _run(text, True), text[:200]


def test_corpus_differential():
    """Every synthetic page (incl. the degenerate-HTML buckets) parses
    to an identical tree."""
    n_html = 0
    for i in range(3000):
        row = gen_page(i)
        data = bytes(row["html"])
        if data.startswith(b"%PDF"):
            continue
        n_html += 1
        assert_same_tree(data.decode("utf-8", errors="replace"))
    assert n_html > 2500


JUNK = [
    "",
    "plain text no tags",
    "<p>unclosed everywhere<div><span>x",
    "a < b and c > d",
    "<p>ent: &amp; &lt; &#65; &#x42; &unknown; &",
    "x<3 and y<z>w</z>",
    "<script>if (a<b && c>d) { x = '<p>'; }</script><p>after</p>",
    "<style>a > b { color: red }</style><p>s</p>",
    "<!-- comment <p>not a tag</p> --><p>real</p>",
    "<!DOCTYPE html><?php echo '<b>no</b>'; ?><p>x</p>",
    "<![CDATA[ <p>raw</p> ]]><p>y</p>",
    '<div id="a&amp;b" class=\'q\' data-x=unquoted disabled><p>t</p></div>',
    "<p/>self<br/><hr />closed",
    "<P>UPPER</P><DiV>mixed</dIv>",
    "<td colspan=2 rowspan='3'>c</td>",
    "<a href='x>y'>tricky attr</a>",
    "<p>trailing open <",
    "<script>never closed",
    "<em>stray </p> end</em>",
    "\x00<p>null byte</p>",
    "<p title=\"multi\nline\">x</p>",
    "<br><br/><br >",
]


@pytest.mark.parametrize("text", JUNK, ids=range(len(JUNK)))
def test_junk_differential(text):
    assert_same_tree(text)


def test_reference_fixture_differential():
    """The reference's html-ish golden exports parse identically."""
    from pathlib import Path

    for p in sorted(Path("/root/reference/OCR Benchmarks").rglob("*.md")):
        assert_same_tree(p.read_text(errors="replace")[:100000])


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(
            list("<>/=\"'& ;abcdiv!?#-\nphtml123defxysc ript&amp;")
        ),
        max_size=120,
    )
)
def test_fuzz_differential(text):
    assert_same_tree(text)


def test_extraction_output_identical_fast_vs_slow():
    """End-to-end: extract_html over both build paths is byte-equal."""
    for i in range(300):
        row = gen_page(i)
        data = bytes(row["html"])
        if data.startswith(b"%PDF"):
            continue
        text = data.decode("utf-8", errors="replace")
        fast_root = hx._build_tree(text, fast=True)
        slow_root = hx._build_tree(text, fast=False)
        assert json.dumps(_tree_sig(fast_root)) == json.dumps(_tree_sig(slow_root))


def test_more_junk_from_probes():
    cases = [
        "<p attr='x<b>y", "<p attr='x<b>y'>z</p>", "</p attr='a>b'>x",
        "</1>", "</ >", "</->x", "<p a=&amp;b>x</p>", "< p>x", "<1tag>y",
        "<p (a)=1>t", "<p a = '1' >x", "<p/ >x", "<p //>x", "<-", "<!>x",
        "<?>y", "<!x>z", "a&ampz;b", "a&#999999999;b",
        "<script>a</script end>b", "<script>a</scriptx>b</script>c",
        "<svg><circle r=1/></svg>", "<p attr", "<p attr='x", "</p", "</",
        "<![CDATA[ unclosed", "<!-- unclosed", "<!['foo']>c",
        "<p attr=/>z", "<textarea><p>x</p></textarea>",
    ]
    for c in cases:
        assert_same_tree(c)
