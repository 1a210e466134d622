"""Adversarial robustness of the per-row conversion core: total
(never raises), deterministic (pure function of its inputs), and
stable under repeated application."""

from hypothesis import given, settings, strategies as st

from docling_serve_spark.extract.core import ExtractOptions, extract_document


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=4000))
def test_extract_never_raises_on_random_bytes(data):
    r = extract_document(data, name="fuzz")
    assert r.status in ("success", "failure", "skipped")


@settings(max_examples=150, deadline=None)
@given(
    st.binary(max_size=2000).map(lambda b: b"%PDF-1.4\n" + b)
)
def test_extract_never_raises_on_pdf_junk(data):
    r = extract_document(data, name="fuzz")
    assert r.status in ("success", "failure", "skipped")


@settings(max_examples=150, deadline=None)
@given(
    st.text(max_size=2000).map(lambda t: ("<html><body>" + t).encode("utf-8"))
)
def test_extract_never_raises_on_html_junk(data):
    r = extract_document(data, name="fuzz")
    assert r.status in ("success", "failure")


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2000))
def test_extract_deterministic(data):
    a = extract_document(data, name="x", lang="en")
    b = extract_document(data, name="x", lang="en")
    assert (a.status, a.extracted_text, a.md_content, a.json_content,
            a.spans_json) == (
        b.status, b.extracted_text, b.md_content, b.json_content, b.spans_json
    )


def test_options_do_not_leak_between_calls():
    html = b"<html><body><main><p>hello world content here ok</p></main></body></html>"
    strict = extract_document(html, opts=ExtractOptions(to_formats=("text",)))
    full = extract_document(html)
    assert strict.md_content == "" and full.md_content != ""
    again = extract_document(html, opts=ExtractOptions(to_formats=("text",)))
    assert again.md_content == ""
    assert strict.extracted_text == full.extracted_text
