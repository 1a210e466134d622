"""PDF parse (C1-C4) + quality/dispatch (F1-F10) unit tests."""

import random

import pytest

from docling_serve_spark.extract.pdf_extract import (
    PdfParseError,
    extract_pdf,
    is_tagged_pdf,
    parse_pdf_pages,
    pdf_page_texts,
)
from docling_serve_spark.extract.quality import (
    analyze_pages,
    avg_space_run,
    control_ratio,
    decide_mode,
    escape_count,
    quality_score,
    sample_indicators,
    sample_pages,
    symbol_ratio,
)
from docling_serve_spark.sources.pages import _synth_pdf, gen_page


def _pdf(tagged=False, body_lines=None, title="The Doc Title"):
    lines = ["BT /F1 12 Tf"]
    lines.append(f"/F1 18 Tf 1 0 0 1 72 720 Tm ({title}) Tj /F1 12 Tf")
    y = 690
    for t in body_lines or ["line one text", "line two text"]:
        y -= 14
        lines.append(f"1 0 0 1 72 {y} Tm ({t}) Tj")
    lines.append("ET")
    stream = "\n".join(lines)
    mark = "/MarkInfo << /Marked true >> " if tagged else ""
    return (
        "%PDF-1.4\n"
        f"1 0 obj\n<< /Type /Catalog /Pages 2 0 R {mark}>>\nendobj\n"
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>\nendobj\n"
        f"4 0 obj\n<< /Length {len(stream)} >>\nstream\n{stream}\nendstream\nendobj\n"
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    ).encode("latin-1")


def test_basic_parse_title_and_body():
    doc = extract_pdf(_pdf())
    assert doc.num_pages == 1
    assert doc.items[0].item_type == "title"
    assert doc.items[0].text == "The Doc Title"
    assert "line one text line two text" in doc.items[1].text


def test_tagged_flag():
    assert is_tagged_pdf(_pdf(tagged=True))
    assert not is_tagged_pdf(_pdf(tagged=False))


def test_escaped_strings():
    doc = extract_pdf(_pdf(body_lines=[r"paren \( and \) and \\ done"]))
    assert "paren ( and ) and \\ done" in doc.items[-1].text


def test_not_a_pdf_raises():
    with pytest.raises(PdfParseError):
        parse_pdf_pages(b"<html>nope</html>")


def test_synth_corpus_pdfs_parse():
    rng = random.Random("t:1")
    data = _synth_pdf(rng, 1, "en")
    pages, tagged = parse_pdf_pages(data)
    assert 10 <= len(pages) <= 200
    doc = extract_pdf(data)
    assert doc.num_pages == len(pages)
    assert len(doc.items) > len(pages)  # multiple blocks per page
    # at least one aligned table block detected (every ~3rd page has one)
    assert any(i.item_type == "table" for i in doc.items)


def _flate_pdf(stream: str, length: int | None = None) -> bytes:
    import zlib

    comp = zlib.compress(stream.encode("latin-1"))
    n = len(comp) if length is None else length
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >>\nendobj\n"
        + f"4 0 obj\n<< /Length {n} /Filter /FlateDecode >>\nstream\n".encode()
        + comp
        + b"\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
    )


def test_flate_stream_parses_same_as_raw():
    raw = _pdf(body_lines=["compressed body line"])
    stream = "BT /F1 12 Tf\n/F1 18 Tf 1 0 0 1 72 720 Tm (The Doc Title) Tj /F1 12 Tf\n1 0 0 1 72 676 Tm (compressed body line) Tj\nET"
    doc_raw = extract_pdf(_pdf(body_lines=["compressed body line"]))
    doc_flate = extract_pdf(_flate_pdf(stream))
    assert [i.text for i in doc_flate.items] == [i.text for i in doc_raw.items]


def test_flate_stream_with_embedded_endstream_bytes():
    # a compressed stream whose bytes contain the literal markers must
    # not derail the /Length-aware object scan
    stream = (
        "BT /F1 12 Tf\n1 0 0 1 72 720 Tm (endstream endobj inside text) Tj\nET"
    )
    doc = extract_pdf(_flate_pdf(stream))
    assert any("endstream endobj inside text" in i.text for i in doc.items)


def test_corrupt_flate_raises_typed_error():
    data = _flate_pdf("BT ET").replace(b"stream\n", b"stream\nXX", 1)
    with pytest.raises(PdfParseError):
        parse_pdf_pages(data)


def test_synth_corpus_compressed_matches_uncompressed():
    # even i -> compressed, odd i -> raw; same rng state => same text
    rng_a = random.Random("t:9")
    rng_b = random.Random("t:9")
    comp = _synth_pdf(rng_a, 2, "en")
    raw = _synth_pdf(rng_b, 3, "en")
    assert len(comp) < len(raw)
    assert b"/Filter /FlateDecode" in comp and b"/Filter" not in raw
    assert pdf_page_texts(comp) == pdf_page_texts(raw)


def test_two_column_reading_order():
    # two columns: left column fully precedes right column in output
    lines = ["BT /F1 12 Tf"]
    for k, t in enumerate(["L1 text", "L2 text"]):
        lines.append(f"1 0 0 1 72 {700 - k * 14} Tm ({t}) Tj")
    for k, t in enumerate(["R1 text", "R2 text"]):
        lines.append(f"1 0 0 1 400 {700 - k * 14} Tm ({t}) Tj")
    lines.append("ET")
    stream = "\n".join(lines)
    data = (
        "%PDF-1.4\n"
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        "3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
        f"4 0 obj\n<< /Length {len(stream)} >>\nstream\n{stream}\nendstream\nendobj\n"
    ).encode("latin-1")
    texts = pdf_page_texts(data)
    assert texts[0].splitlines() == ["L1 text", "L2 text", "R1 text", "R2 text"]


# --- F2-F9 quality heuristics (reference:docling_serve/pdf_analysis.py) ---


def test_sample_pages_rule():
    pages = [f"page {i} text" for i in range(30)]
    # step = 30//10 = 3 -> pages 0-4 plus every 3rd
    samples = sample_pages(pages)
    assert samples[:5] == [f"page {i} text" for i in range(5)]
    assert "page 6 text" in samples and "page 7 text" not in samples


def test_predicates():
    assert control_ratio("abc\x00\x01\x02defg") > 0.03
    assert symbol_ratio("!!!???...,,,") > 0.30
    assert escape_count(r"\af \be \c1 \d2 \e3 \f4") == 6
    assert avg_space_run("a    b    c") > 2.5
    assert sample_indicators("clean normal prose text here") == 0
    assert sample_indicators("bad��text") == 2  # F7 counts each


def test_quality_score_and_classification():
    # U+FFFD is also category So, so F4 trips too: 3 (F7) + 1 (F4) = 4
    poor = ["�" * 3 + "x"]
    assert quality_score(poor) == 4.0
    good = ["perfectly normal text sample"]
    assert quality_score(good) == 0.0


@pytest.mark.parametrize(
    "has_text,is_tagged,quality,expected",
    [
        (True, True, "good", "skip"),
        (True, False, "poor", "force"),
        (True, True, "poor", "force"),
        (True, False, "good", "redo"),
        (False, False, "unknown", "force"),
        (False, True, "unknown", "force"),
    ],
)
def test_decision_tree(has_text, is_tagged, quality, expected):
    assert decide_mode(has_text, is_tagged, quality) == expected


def test_analyze_pages_end_to_end():
    a = analyze_pages(["good clean text"] * 3, is_tagged=True)
    assert a.recommended_mode == "skip" and not a.needs_ocr
    b = analyze_pages([], is_tagged=False)
    assert b.recommended_mode == "force" and not b.has_text


# --- C4 table_mode accurate (reference:datamodel/convert.py:212-223) ---


def _ragged_table_pdf():
    """3-column table whose middle row is missing the middle cell —
    fast mode rejects it (run counts differ), accurate recovers it."""
    rows = [
        (700, [(72, "h1"), (220, "h2"), (370, "h3")]),
        (686, [(72, "a1"), (370, "a3")]),
        (672, [(72, "b1"), (220, "b2"), (370, "b3")]),
    ]
    lines = ["BT /F1 12 Tf"]
    for y, cells in rows:
        for x, t in cells:
            lines.append(f"1 0 0 1 {x} {y} Tm ({t}) Tj")
    lines.append("ET")
    stream = "\n".join(lines)
    return (
        "%PDF-1.4\n"
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>\nendobj\n"
        f"4 0 obj\n<< /Length {len(stream)} >>\nstream\n{stream}\nendstream\nendobj\n"
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    ).encode("latin-1")


def test_table_mode_accurate_recovers_ragged_grid():
    from docling_serve_spark.extract.core import ExtractOptions, extract_document

    data = _ragged_table_pdf()
    fast = extract_document(data, name="t.pdf")
    acc = extract_document(
        data, name="t.pdf", opts=ExtractOptions(table_mode="accurate")
    )
    import json as _json

    fast_doc = _json.loads(
        extract_document(
            data, name="t.pdf",
            opts=ExtractOptions(to_formats=("json",)),
        ).json_content
    )
    acc_doc = _json.loads(
        extract_document(
            data, name="t.pdf",
            opts=ExtractOptions(to_formats=("json",), table_mode="accurate"),
        ).json_content
    )
    assert fast_doc["tables"] == []  # ragged -> fast mode sees prose
    assert len(acc_doc["tables"]) == 1
    grid = acc_doc["tables"][0]["data"]["grid"]
    assert [[c["text"] for c in row] for row in grid] == [
        ["h1", "h2", "h3"], ["a1", "", "a3"], ["b1", "b2", "b3"],
    ]
    # strict-text channel unaffected in fast mode; accurate joins rows
    assert fast.status == acc.status == "success"


def test_table_mode_accurate_leaves_prose_alone():
    from docling_serve_spark.extract.core import ExtractOptions, extract_document

    data = _pdf(body_lines=["just a normal paragraph line here",
                            "and a second one below it"])
    fast = extract_document(data, name="p.pdf")
    acc = extract_document(
        data, name="p.pdf", opts=ExtractOptions(table_mode="accurate")
    )
    assert fast.extracted_text == acc.extracted_text
    assert "table" not in [i for i in ()]  # no-op guard; channels equal is the check
    assert fast.md_content == acc.md_content


def test_inline_images_stripped_not_text():
    """BI...ID...EI raw pixel bytes are not tokens — binary containing
    '(junk) Tj'-shaped bytes must not leak text runs; prose that
    merely mentions BI/ID inside a string stays intact."""
    from docling_serve_spark.extract.pdf_extract import _parse_content

    s = ("BT /F1 12 Tf 1 0 0 1 72 700 Tm (real text) Tj ET\n"
         "BI /W 4 /H 4 /BPC 8 /CS /G ID \x00\x01(junk) Tj\x9f\xff EI\n"
         "BT 1 0 0 1 72 680 Tm (more real) Tj ET")
    assert [r.text for r in _parse_content(s)] == ["real text", "more real"]
    prose = "BT 1 0 0 1 0 0 Tm (the BI and ID teams) Tj ET"
    assert [r.text for r in _parse_content(prose)] == ["the BI and ID teams"]


def test_tm_scale_sets_effective_font_size():
    """cairo-family writers emit 'Tf 1' and carry the real size in
    the text matrix; effective size = tf_size * sqrt(|det Tm|), so
    heading detection keeps working on those PDFs."""
    from docling_serve_spark.extract.pdf_extract import _parse_content

    runs = _parse_content("BT /F1 1 Tf 13.17 0 0 -13.17 90 151 Tm (scaled) Tj ET")
    assert abs(runs[0].size - 13.17) < 0.01
    runs = _parse_content("BT /F1 18 Tf 1 0 0 1 72 720 Tm (classic) Tj ET")
    assert runs[0].size == 18.0
    # Tf AFTER Tm also picks up the matrix scale
    runs = _parse_content("BT 2 0 0 -2 0 700 Tm /F1 9 Tf (late tf) Tj ET")
    assert abs(runs[0].size - 18.0) < 1e-9


def test_ctm_flip_lands_in_device_space():
    """cairo-family streams draw under '1 0 0 -1 0 H cm'; positions
    must come out in standard y-up device space so reading order
    sorts correctly, and q/Q must save/restore the CTM."""
    from docling_serve_spark.extract.pdf_extract import _parse_content

    s = ("1 0 0 -1 0 792 cm BT 13 0 0 -13 90 151 Tm /F1 1 Tf (first) Tj "
         "13 0 0 -13 90 300 Tm (second) Tj ET")
    rs = _parse_content(s)
    assert abs(rs[0].y - (792 - 151)) < 0.1
    assert abs(rs[0].size - 13) < 0.01
    assert [r.text for r in sorted(rs, key=lambda r: -r.y)] == ["first", "second"]

    s3 = ("q 2 0 0 2 0 0 cm BT /F1 6 Tf 1 0 0 1 10 10 Tm (big) Tj ET Q "
          "BT /F1 6 Tf 1 0 0 1 10 10 Tm (small) Tj ET")
    rs3 = _parse_content(s3)
    assert rs3[0].size == 12.0 and rs3[1].size == 6.0  # scale restored


def test_td_advances_in_text_space():
    """Td operands are text-space units: under a scaled matrix the
    device advance is scaled too (naive x += tx collapses scaled
    line spacing into the y-tolerance)."""
    from docling_serve_spark.extract.pdf_extract import _parse_content

    s = "BT 10 0 0 10 50 700 Tm /F1 1 Tf (l1) Tj 0 -2 Td (l2) Tj ET"
    rs = _parse_content(s)
    assert abs(rs[0].y - rs[1].y - 20) < 0.01  # 2 text units * scale 10


def test_form_xobject_inherits_ctm():
    """A Do-invoked form draws under the invoker's CURRENT ctm — an
    OCR text layer placed under a flip matrix must land in device
    space like everything else."""
    from docling_serve_spark.extract.pdf_extract import _parse_content

    form = "BT /F1 10 Tf 1 0 0 1 72 100 Tm (layer) Tj ET"
    page = "1 0 0 -1 0 792 cm q /X0 Do Q"
    rs = _parse_content(page, None, {"X0": (form, None, None)})
    assert rs[0].text == "layer"
    assert abs(rs[0].y - (792 - 100)) < 0.1


# ---- simple-font /Encoding resolution (no ToUnicode) ----------------


def _escape_pdf_bytes(bs: bytes) -> bytes:
    out = bytearray()
    for b in bs:
        if b in (0x28, 0x29, 0x5C):  # ( ) backslash
            out += b"\\" + bytes([b])
        else:
            out.append(b)
    return bytes(out)


def _font_pdf(font_obj: str, text: bytes, extra_objs: str = "") -> bytes:
    stream = (
        b"BT /F1 12 Tf 1 0 0 1 72 720 Tm ("
        + _escape_pdf_bytes(text)
        + b") Tj ET"
    )
    head = (
        "%PDF-1.4\n"
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
        f"4 0 obj\n<< /Length {len(stream)} >>\nstream\n"
    ).encode("latin-1")
    tail = (
        "\nendstream\nendobj\n"
        f"5 0 obj\n{font_obj}\nendobj\n"
        f"{extra_objs}"
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    ).encode("latin-1")
    return head + stream + tail


def _first_text(data: bytes) -> str:
    pages, _ = parse_pdf_pages(data)
    return "".join(r.text for r in pages[0])


def test_winansi_encoding_maps_80_9f_region():
    doc = _font_pdf(
        "<< /Type /Font /Subtype /TrueType /BaseFont /Arial "
        "/Encoding /WinAnsiEncoding >>",
        b"\x93Hi\x94 \x97 it\x92s \x85",
    )
    assert _first_text(doc) == "“Hi” — it’s …"


def test_macroman_encoding_upper_half():
    doc = _font_pdf(
        "<< /Type /Font /Subtype /Type1 /BaseFont /Times "
        "/Encoding /MacRomanEncoding >>",
        b"caf\x8e \xd0 \xa5",
    )
    assert _first_text(doc) == "café – •"


def test_differences_array_with_agl_and_uni_names():
    enc = (
        "6 0 obj\n<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
        "/Differences [ 97 /quoteright /emdash /uni20AC 200 /g42 ] >>\n"
        "endobj\n"
    )
    doc = _font_pdf(
        "<< /Type /Font /Subtype /Type1 /Encoding 6 0 R >>",
        b"abc \x93x\xc8",
        extra_objs=enc,
    )
    # a->quoteright b->emdash c->Euro; base WinAnsi still applies to
    # 0x93; code 200 names an unknown subset glyph -> raw passthrough
    assert _first_text(doc) == "’—€ “x\xc8"


def test_inline_encoding_dict_differences():
    doc = _font_pdf(
        "<< /Type /Font /Subtype /Type1 "
        "/Encoding << /Differences [ 88 /bullet ] >> >>",
        b"X and Y",
    )
    assert _first_text(doc) == "• and Y"


def test_tounicode_wins_over_encoding(tmp_path):
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "1 begincodespacerange <00> <FF> endcodespacerange\n"
        "1 beginbfchar <41> <005A> endbfchar\n"
        "end"
    )
    extra = (
        f"6 0 obj\n<< /Length {len(cmap)} >>\nstream\n{cmap}\n"
        "endstream\nendobj\n"
    )
    doc = _font_pdf(
        "<< /Type /Font /Subtype /TrueType /Encoding /WinAnsiEncoding "
        "/ToUnicode 6 0 R >>",
        b"A\x93",
    )
    # splice the extra object in before the trailer
    doc = doc.replace(b"trailer", extra.encode("latin-1") + b"trailer", 1)
    # ToUnicode maps 0x41 -> Z and, being authoritative, replaces the
    # whole encoding: 0x93 has no CMap entry so passes through raw
    assert _first_text(doc) == "Z\x93"


def test_type0_identity_encoding_is_not_a_simple_encoding():
    from docling_serve_spark.extract.pdf_extract import _font_encoding_map

    assert _font_encoding_map(
        {}, "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H >>"
    ) is None


def test_glyph_name_fallbacks():
    from docling_serve_spark.extract.glyphlist import glyph_to_unicode

    assert glyph_to_unicode("emdash") == "—"
    assert glyph_to_unicode("a.sc") == "a"
    assert glyph_to_unicode("uni0041") == "A"
    assert glyph_to_unicode("u1F600") == "\U0001f600"
    assert glyph_to_unicode("uniD800") is None  # lone surrogate
    assert glyph_to_unicode("g42") is None
    assert glyph_to_unicode("cid107") is None


# ---- fast simple-stream scanner vs general tokenizer ----------------


def _runs_sig(runs):
    return [(round(r.x, 6), round(r.y, 6), round(r.size, 6), r.text) for r in runs]


def _general_parse(stream, fonts=None):
    import docling_serve_spark.extract.pdf_extract as px

    saved = px._parse_content_fast
    px._parse_content_fast = lambda s, f: None
    try:
        return px._parse_content(stream, fonts)
    finally:
        px._parse_content_fast = saved


def test_fast_scanner_matches_general_on_corpus_streams():
    import re as _re

    import docling_serve_spark.extract.pdf_extract as px

    taken = 0
    i = pdfs = 0
    while pdfs < 25:
        r = gen_page(i)
        i += 1
        if r["html"][:5] != b"%PDF-":
            continue
        pdfs += 1
        text = r["html"].decode("latin-1")
        for m in _re.finditer(r"stream\r?\n(.*?)endstream", text, _re.DOTALL):
            s = m.group(1)
            fast = px._parse_content_fast(s, None)
            if fast is None:
                continue
            taken += 1
            assert _runs_sig(fast) == _runs_sig(_general_parse(s))
    assert taken > 500  # the corpus genuinely exercises the fast path


@pytest.mark.parametrize(
    "stream",
    [
        # state-bearing ops outside any span must force the general path
        "BT /F1 12 Tf 1 0 0 1 10 10 Tm [(a) -200 (b)] TJ ET",
        "BT 2 TL (x) ' ET",
        "0.5 0 0 0.5 0 0 cm BT (x) Tj ET",
        "BT (a) Tj ET q 1 0 0 1 5 5 cm Q",
        "BT <48656C6C6F> Tj ET",
        "BT 12 TL T* (x) Tj ET",
        "BT /F1 12 Tf (a) 5 Tj ET",  # Tj without adjacent string
    ],
)
def test_fast_scanner_falls_back_on_complex_ops(stream):
    import docling_serve_spark.extract.pdf_extract as px

    assert px._parse_content_fast(stream, None) is None
    # and the public entry still parses it (general path)
    px._parse_content(stream)


@pytest.mark.parametrize(
    "stream",
    [
        # needle substrings INSIDE string literals must stay fast
        "BT /F1 12 Tf 1 0 0 1 10 700 Tm (it's 5cm [wide] BT TJ < ok) Tj ET",
        'BT (he said "hi" \\' + "\\" + '") Tj ET',
        "BT (OBTAIN Td Tm Tf Do) Tj 0 -14 Td (next) Tj ET",
    ],
)
def test_fast_scanner_handles_needles_inside_literals(stream):
    import docling_serve_spark.extract.pdf_extract as px

    fast = px._parse_content_fast(stream, None)
    assert fast is not None
    assert _runs_sig(fast) == _runs_sig(_general_parse(stream))


def test_fast_scanner_quote_op_advances_line():
    import docling_serve_spark.extract.pdf_extract as px

    stream = "BT 1 0 0 1 50 700 Tm (one) Tj (two) ' ET"
    fast = px._parse_content_fast(stream, None)
    assert fast is not None
    assert _runs_sig(fast) == _runs_sig(_general_parse(stream))
    assert fast[1].y == 700 - 14.0  # default leading
