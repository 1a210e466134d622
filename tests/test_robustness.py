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


def test_pdf_mutation_fuzz_typed_errors_only():
    """Seeded mutation fuzz over the xref/encrypt/filter paths: every
    mutation must either parse or raise PdfParseError — never an
    untyped exception (those would poison a whole Spark task instead
    of one failure row). 3,000-mutation sweeps run green offline;
    this is the fast regression slice."""
    import random

    from docling_serve_spark.extract.pdf_extract import (
        PdfParseError,
        parse_pdf_pages,
    )
    from tests.test_realworld_pdf import _make_encrypted_pdf, _xref_stream_pdf

    rng = random.Random(20260817)
    for seed_doc in (_make_encrypted_pdf(3), _xref_stream_pdf()):
        for _ in range(120):
            data = bytearray(seed_doc)
            for _ in range(rng.randrange(1, 10)):
                data[rng.randrange(len(data))] = rng.randrange(256)
            if rng.random() < 0.3:
                data = data[: rng.randrange(16, len(data))]
            try:
                parse_pdf_pages(bytes(data))
            except PdfParseError:
                pass


def test_encoding_pdf_mutation_fuzz_typed_errors_only():
    """Same contract for the simple-font /Encoding path: hostile
    Differences arrays / encoding dicts must never raise untyped."""
    import random

    from docling_serve_spark.extract.pdf_extract import (
        PdfParseError,
        parse_pdf_pages,
    )
    from tests.test_pdf_extract import _font_pdf

    seed_doc = _font_pdf(
        "<< /Type /Font /Subtype /Type1 /Encoding 6 0 R >>",
        b"abc \x93x\xc8 def \x97",
        extra_objs=(
            "6 0 obj\n<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
            "/Differences [ 97 /quoteright /emdash /uni20AC 200 /g42 ] >>\n"
            "endobj\n"
        ),
    )
    rng = random.Random(4242)
    for _ in range(250):
        data = bytearray(seed_doc)
        for _ in range(rng.randrange(1, 12)):
            data[rng.randrange(len(data))] = rng.randrange(256)
        if rng.random() < 0.3:
            data = data[: rng.randrange(16, len(data))]
        try:
            parse_pdf_pages(bytes(data))
        except PdfParseError:
            pass


def test_fast_scanner_mutation_equivalence():
    """Mutate simple content streams; whenever the fast scanner
    accepts a mutant, its runs must equal the general tokenizer's.
    (Rejection is always allowed — fallback is the safe direction.)"""
    import random

    import docling_serve_spark.extract.pdf_extract as px

    base = (
        "BT /F1 12 Tf 1 0 0 1 72 720 Tm (first line) Tj "
        "0 -14 Td (it's a 5cm [test]) Tj 2 0 0 2 10 600 Tm (big) ' ET"
    )
    rng = random.Random(77)
    checked = 0
    for _ in range(800):
        s = list(base)
        for _ in range(rng.randrange(1, 6)):
            k = rng.randrange(len(s))
            s[k] = chr(rng.randrange(32, 127))
        mutant = "".join(s)
        fast = px._parse_content_fast(mutant, None)
        if fast is None:
            continue
        checked += 1
        saved = px._parse_content_fast
        px._parse_content_fast = lambda a, b: None
        try:
            general = px._parse_content(mutant)
        finally:
            px._parse_content_fast = saved
        assert [
            (round(r.x, 6), round(r.y, 6), round(r.size, 6), r.text) for r in fast
        ] == [
            (round(r.x, 6), round(r.y, 6), round(r.size, 6), r.text)
            for r in general
        ], mutant
    assert checked > 100


@given(
    st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 0xFFFF),
                  st.integers(0, 0xFFFF)),
        min_size=1, max_size=4,
    ),
    st.binary(max_size=64),
)
@settings(max_examples=200, deadline=None)
def test_fontmap_variable_decode_total_and_terminates(ranges, raw):
    """Mixed-width CMap decoding must be total: any declared range set
    (including hostile inverted/overlapping ones) over any byte string
    decodes without raising and consumes the whole input."""
    from docling_serve_spark.extract.pdf_extract import _FontMap

    norm = tuple((w, min(lo, hi), max(lo, hi)) for w, lo, hi in ranges)
    fm = _FontMap(norm[0][0], {0x41: "A"}, ranges=norm)
    out = fm.decode(raw.decode("latin-1"))
    assert isinstance(out, str)
