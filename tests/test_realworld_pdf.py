"""Real-world PDF coverage (C1): the reference repo's own test PDFs —
Word/LibreOffice exports with FlateDecode streams, indirect /Length
refs, /Contents arrays, subset fonts with ToUnicode CMaps (1- and
2-byte codes), Arabic/Greek text — must extract real text, not typed
failures. (The reference converts these via docling-parse/pypdfium2,
docling_conversion.py:153-165; these fixtures are replayed directly.)
"""

import glob
import os

import pytest

from docling_serve_spark.extract.core import extract_document
from docling_serve_spark.extract.pdf_extract import (
    _FontMap,
    _parse_cmap,
    _parse_content,
)

REF = "/root/reference/test-files"

# the small fixtures (the two Doc 13 scans are 1000+-page OCR scans —
# they parse, but belong in the probe script, not the unit suite)
SMALL = [
    p for p in sorted(
        glob.glob(f"{REF}/english/*.pdf") + glob.glob(f"{REF}/greek/*.pdf")
    )
]

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="no reference fixtures"
)


@needs_ref
@pytest.mark.parametrize("path", SMALL, ids=lambda p: os.path.basename(p))
def test_reference_pdf_extracts_text(path):
    r = extract_document(open(path, "rb").read(), name=path)
    assert r.status == "success"
    assert r.num_pages >= 5
    assert len(r.extracted_text) > 1000


@needs_ref
def test_reference_pdf_known_content():
    r = extract_document(
        open(f"{REF}/english/SOP Returns.pdf", "rb").read(), name="sop"
    )
    assert "Standard Operating Procedure" in r.extracted_text
    assert "Samsung" in r.extracted_text
    g = extract_document(
        open(f"{REF}/greek/HR Greek.pdf", "rb").read(), name="hr"
    )
    assert "Αρτοποιεία" in g.extracted_text  # Greek via ToUnicode CMap


@needs_ref
def test_reference_arabic_pdf_extracts():
    r = extract_document(
        open(f"{REF}/arabic/Other.pdf", "rb").read(), name="ar"
    )
    assert r.status == "success"
    assert len(r.extracted_text) > 10_000
    n_ar = sum(1 for ch in r.extracted_text if "؀" <= ch <= "ۿ")
    assert n_ar > 1000  # actual Arabic codepoints decoded


# ------------------------- unit coverage -------------------------- #

def test_cmap_bfchar_and_bfrange():
    cmap = """
/CIDInit /ProcSet findresource begin
1 begincodespacerange <00> <FF> endcodespacerange
2 beginbfchar
<01> <0053>
<02> <0074>
endbfchar
1 beginbfrange
<10> <12> <0041>
endbfrange
endcmap
"""
    fm = _parse_cmap(cmap)
    assert fm.width == 1
    assert fm.decode("\x01\x02") == "St"
    assert fm.decode("\x10\x11\x12") == "ABC"


def test_cmap_two_byte_codes():
    cmap = """
1 begincodespacerange <0000> <FFFF> endcodespacerange
1 beginbfchar <0045> <00E9> endbfchar
"""
    fm = _parse_cmap(cmap)
    assert fm.width == 2
    assert fm.decode("\x00\x45") == "é"


def test_cmap_bfrange_array_form():
    fm = _parse_cmap(
        "1 begincodespacerange <00> <FF> endcodespacerange "
        "1 beginbfrange <05> <06> [<0058> <0059>] endbfrange"
    )
    assert fm.decode("\x05\x06") == "XY"


def test_hex_strings_and_tj_with_font():
    fonts = {"F1": _FontMap(1, {1: "H", 2: "i"})}
    stream = "BT /F1 12 Tf 1 0 0 1 72 700 Tm [<0102>] TJ ET"
    runs = _parse_content(stream, fonts)
    assert len(runs) == 1 and runs[0].text == "Hi"
    # without the font map the raw codes pass through
    raw = _parse_content("BT /F9 12 Tf 1 0 0 1 72 700 Tm (plain) Tj ET", fonts)
    assert raw[0].text == "plain"


def test_dict_tokens_do_not_break_parsing():
    stream = "/H1<</MCID 0>>BDC BT 56.8 700 Td /F1 24 Tf (text) Tj ET EMC"
    runs = _parse_content(stream)
    assert runs[0].text == "text"
    assert runs[0].x == 56.8 and runs[0].y == 700.0


def test_object_stream_pdf_parses():
    """PDF 1.5+ ObjStm: catalog/pages/page dicts packed inside a
    compressed container stream; only the content stream is a
    top-level object."""
    import zlib

    from docling_serve_spark.extract.pdf_extract import parse_pdf_pages

    content = "BT /F1 12 Tf 1 0 0 1 72 700 Tm (packed objects work) Tj ET"
    packed_objs = [
        (1, "<< /Type /Catalog /Pages 2 0 R >>"),
        (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    ]
    offsets, bodies, off = [], [], 0
    for num, body in packed_objs:
        offsets.append(f"{num} {off}")
        bodies.append(body)
        off += len(body) + 1
    payload = " ".join(offsets) + "\n" + "\n".join(bodies) + "\n"
    first = len(" ".join(offsets)) + 1
    comp = zlib.compress(payload.encode("latin-1"))
    pdf = (
        b"%PDF-1.5\n"
        + f"5 0 obj\n<< /Type /ObjStm /N 3 /First {first} /Length {len(comp)} "
          f"/Filter /FlateDecode >>\nstream\n".encode("latin-1")
        + comp
        + b"\nendstream\nendobj\n"
        + f"4 0 obj\n<< /Length {len(content)} >>\nstream\n{content}\nendstream\nendobj\n".encode("latin-1")
        + b"%%EOF\n"
    )
    pages, _ = parse_pdf_pages(pdf)
    assert len(pages) == 1
    assert pages[0][0].text == "packed objects work"


def test_form_xobject_text_expanded():
    """OCR tools put the text layer in a Form XObject invoked via Do."""
    import zlib

    from docling_serve_spark.extract.pdf_extract import parse_pdf_pages

    form = "BT /F1 10 Tf 1 0 0 1 72 700 Tm (ocr layer text) Tj ET"
    page_content = "q /OCRLayer Do Q"
    pdf = (
        "%PDF-1.5\n"
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        "/Resources << /XObject << /OCRLayer 5 0 R >> >> >>\nendobj\n"
        f"4 0 obj\n<< /Length {len(page_content)} >>\nstream\n{page_content}\nendstream\nendobj\n"
        f"5 0 obj\n<< /Subtype /Form /Length {len(form)} >>\nstream\n{form}\nendstream\nendobj\n"
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    ).encode("latin-1")
    pages, _ = parse_pdf_pages(pdf)
    assert len(pages) == 1
    assert any(r.text == "ocr layer text" for r in pages[0])


def test_incremental_update_last_root_wins():
    from docling_serve_spark.extract.pdf_extract import parse_pdf_pages

    c_old = "BT 1 0 0 1 72 700 Tm (old revision) Tj ET"
    c_new = "BT 1 0 0 1 72 700 Tm (new revision) Tj ET"
    pdf = (
        "%PDF-1.4\n"
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        f"4 0 obj\n<< /Length {len(c_old)} >>\nstream\n{c_old}\nendstream\nendobj\n"
        "trailer << /Root 1 0 R >>\n"
        # incremental update appends a new revision
        "11 0 obj\n<< /Type /Catalog /Pages 12 0 R >>\nendobj\n"
        "12 0 obj\n<< /Type /Pages /Kids [13 0 R] /Count 1 >>\nendobj\n"
        "13 0 obj\n<< /Type /Page /Parent 12 0 R /Contents 14 0 R >>\nendobj\n"
        f"14 0 obj\n<< /Length {len(c_new)} >>\nstream\n{c_new}\nendstream\nendobj\n"
        "trailer << /Root 11 0 R >>\n%%EOF\n"
    ).encode("latin-1")
    pages, _ = parse_pdf_pages(pdf)
    assert len(pages) == 1
    assert pages[0][0].text == "new revision"


def test_flate_png_predictor_streams():
    """DecodeParms /Predictor 12 (PNG Up) on an ObjStm — the layout
    modern writers emit for container streams."""
    import zlib

    from docling_serve_spark.extract.pdf_extract import (
        _decode_stream,
        _png_unpredict,
    )

    # build predictor-encoded data: rows of 4 bytes, filter 2 (Up)
    rows = [b"\x01\x02\x03\x04", b"\x05\x06\x07\x08"]
    enc = bytearray()
    prev = bytes(4)
    for r in rows:
        enc.append(2)
        enc.extend((r[i] - prev[i]) & 0xFF for i in range(4))
        prev = r
    assert _png_unpredict(bytes(enc), 4) == b"".join(rows)

    comp = zlib.compress(bytes(enc)).decode("latin-1")
    head = "<< /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> >>"
    out = _decode_stream(head, comp)
    assert out.encode("latin-1") == b"".join(rows)

    # predictor 1 (none declared numerically) leaves data untouched
    head_np = "<< /Filter /FlateDecode /DecodeParms << /Predictor 1 >> >>"
    plain = zlib.compress(b"hello").decode("latin-1")
    assert _decode_stream(head_np, plain) == "hello"


def test_cmap_bfrange_surrogate_range_dropped():
    """A hostile/malformed bfrange crossing U+D800-DFFF must not emit
    lone surrogates (they fail Arrow serialization of the whole batch,
    turning one bad crawl PDF into a full-task failure)."""
    fm = _parse_cmap(
        "1 begincodespacerange <0000> <FFFF> endcodespacerange "
        "1 beginbfrange <0000> <0004> <D7FE> endbfrange"
    )
    out = fm.decode("\x00\x00\x00\x01\x00\x02\x00\x03\x00\x04")
    assert out == "퟾퟿"  # D800..DFFF dropped
    for ch in out:
        assert not 0xD800 <= ord(ch) <= 0xDFFF
    import pyarrow as pa

    pa.array(["".join(fm.map.values())])  # must not raise


# ------------------------- xref resolution ------------------------- #

def _xref_stream_pdf() -> bytes:
    """Minimal PDF 1.5 file whose ONLY cross-reference is a /Type
    /XRef stream (W [1 2 1], Flate, PNG Up predictor) and whose page
    dict lives inside an /ObjStm container — the modern-writer layout
    the brute scan cannot see without the container merge, and the
    xref chain must resolve end-to-end."""
    import zlib

    buf = bytearray(b"%PDF-1.5\n")
    offsets = {}

    def emit(num, body: bytes):
        offsets[num] = len(buf)
        buf.extend(f"{num} 0 obj\n".encode())
        buf.extend(body)
        buf.extend(b"\nendobj\n")

    content = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (xref stream works) Tj ET"
    emit(4, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content))
    # objstm holds catalog(1), pages(2), page(3)
    inner = (
        b"<< /Type /Catalog /Pages 2 0 R >>"
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    )
    hdr = b"1 0 2 33 3 68 "
    stm_payload = hdr + inner
    packed = zlib.compress(stm_payload)
    emit(
        5,
        b"<< /Type /ObjStm /N 3 /First %d /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(hdr), len(packed), packed),
    )
    # xref stream (object 6): entries for objects 0-6
    xref_off = len(buf)

    def row(typ, f2, f3):
        return bytes([typ]) + f2.to_bytes(2, "big") + bytes([f3])

    rows = [
        row(0, 0, 255),            # 0: free
        row(2, 5, 0),              # 1: in objstm 5 idx 0
        row(2, 5, 1),              # 2: in objstm 5 idx 1
        row(2, 5, 2),              # 3: in objstm 5 idx 2
        row(1, offsets[4], 0),     # 4: content stream
        row(1, offsets[5], 0),     # 5: objstm
        row(1, xref_off, 0),       # 6: this xref stream
    ]
    # PNG Up predictor, Columns = 4 (row width)
    pred = bytearray()
    prev = bytes(4)
    for r in rows:
        pred.append(2)
        pred.extend((r[i] - prev[i]) & 0xFF for i in range(4))
        prev = r
    xdata = zlib.compress(bytes(pred))
    emit(
        6,
        b"<< /Type /XRef /Size 7 /W [1 2 1] /Root 1 0 R "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> "
        b"/Length %d >>\nstream\n%s\nendstream" % (len(xdata), xdata),
    )
    buf.extend(b"startxref\n%d\n%%%%EOF\n" % xref_off)
    return bytes(buf)


def test_xref_stream_fixture_resolves():
    from docling_serve_spark.extract import pdf_extract as px

    data = _xref_stream_pdf()
    text = data.decode("latin-1")
    objects, root = px._xref_objects(text)
    assert root == 1
    assert 3 in objects  # page dict merged out of the ObjStm
    pages, tagged = px.parse_pdf_pages(data)
    assert len(pages) == 1
    assert "xref stream works" in " ".join(r.text for r in pages[0])


def test_all_reference_pdfs_resolve_via_xref_chain():
    """Every reference PDF must take the O(xref) path (no silent
    fallback) and produce the same pages/chars as the brute scan."""
    import glob as _glob
    import re as _re

    from docling_serve_spark.extract import pdf_extract as px

    pdfs = sorted(_glob.glob("/root/reference/test-files/*/*.pdf"))
    assert len(pdfs) == 16
    for p in pdfs:
        text = open(p, "rb").read().decode("latin-1")
        objects, root = px._xref_objects(text)  # must not raise
        xp = px._build_pages(
            objects, [str(root)] if root is not None else [], stream_fallback=False
        )
        bp = px._build_pages(
            px._scan_objects(text),
            _re.findall(r"/Root\s+(\d+)\s+0\s+R", text),
            stream_fallback=True,
        )
        xt = ["".join(r.text for r in pg) for pg in xp]
        bt = ["".join(r.text for r in pg) for pg in bp]
        assert xt == bt, p


def test_truncated_trailer_falls_back_to_scan():
    """Crawl PDFs are often truncated mid-transfer; severed xref chain
    must fall back to the sequential scan, not fail the document."""
    from docling_serve_spark.extract import pdf_extract as px

    data = _xref_stream_pdf()
    # keep objects 4/5 but destroy the xref stream + startxref
    cut = data.find(b"6 0 obj")
    pages, _ = px.parse_pdf_pages(data[:cut])
    assert any("xref stream works" in r.text for pg in pages for r in pg)


def test_binary_stream_with_obj_shaped_bytes_xref_path():
    """A compressed stream containing literal 'N 0 obj' bytes confuses
    a sequential scanner; the xref path never scans stream interiors."""
    from docling_serve_spark.extract import pdf_extract as px

    data = _xref_stream_pdf()
    # splice a decoy object-shaped payload as a new stream object 7
    # BEFORE the xref stream; xref does not list it, so it is invisible
    decoy = b"999 0 obj\n<< >>\nstream\nBT (decoy text) Tj ET\nendstream\nendobj\n"
    idx = data.find(b"6 0 obj")
    patched = data[:idx] + decoy + data[idx:]
    # fix startxref offset (everything after idx shifted by len(decoy))
    import re as _re

    old_off = int(_re.search(rb"startxref\s+(\d+)", patched).group(1))
    patched = _re.sub(
        rb"startxref\s+\d+", b"startxref\n%d" % (old_off + len(decoy)), patched
    )
    pages, _ = px.parse_pdf_pages(patched)
    text = " ".join(r.text for pg in pages for r in pg)
    assert "xref stream works" in text
    assert "decoy text" not in text


# ------------------------- filter chains -------------------------- #

def _one_page_pdf(stream_obj: bytes) -> bytes:
    """Wrap a raw `4 0 obj` content-stream object into a 1-page PDF."""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + stream_obj
        + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )


def _extract_one(pdf: bytes) -> str:
    from docling_serve_spark.extract.pdf_extract import parse_pdf_pages

    pages, _ = parse_pdf_pages(pdf)
    return " ".join(r.text for pg in pages for r in pg)


CONTENT = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (filter chain works) Tj ET"


def test_asciihex_filter():
    enc = CONTENT.hex().encode() + b">"
    obj = (b"4 0 obj\n<< /Filter /ASCIIHexDecode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
           % (len(enc), enc))
    assert "filter chain works" in _extract_one(_one_page_pdf(obj))


def test_ascii85_filter():
    import base64

    enc = base64.a85encode(CONTENT) + b"~>"
    obj = (b"4 0 obj\n<< /Filter /ASCII85Decode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
           % (len(enc), enc))
    assert "filter chain works" in _extract_one(_one_page_pdf(obj))


def test_runlength_filter():
    # naive RLE: emit literal runs of <=128 bytes, terminated by EOD
    out = bytearray()
    for i in range(0, len(CONTENT), 120):
        chunk = CONTENT[i : i + 120]
        out.append(len(chunk) - 1)
        out.extend(chunk)
    out.append(128)
    obj = (b"4 0 obj\n<< /Filter /RunLengthDecode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
           % (len(out), bytes(out)))
    assert "filter chain works" in _extract_one(_one_page_pdf(obj))


def _lzw_encode(data: bytes) -> bytes:
    """Reference LZW encoder (early-change), for round-trip testing."""
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    bits = []
    w = b""

    def put(code):
        bits.extend(int(b) for b in format(code, f"0{width}b"))

    put(256)  # clear
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            put(table[w])
            table[wc] = next_code
            next_code += 1
            # encoder table runs one entry ahead of the decoder's, so
            # with EarlyChange=1 it bumps at 2^w where the decoder
            # bumps at 2^w - 1
            if next_code >= (1 << width) and width < 12:
                width += 1
            w = bytes([ch])
    if w:
        put(table[w])
    put(257)  # EOD
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, len(bits), 8)
    )


def test_lzw_filter_roundtrip():
    from docling_serve_spark.extract.pdf_extract import _lzw_decode

    for payload in (CONTENT, b"aaaaaaaaaaaaaaaaaaaab", bytes(range(256)) * 3):
        assert _lzw_decode(_lzw_encode(payload)) == payload


def test_lzw_filter_in_pdf():
    enc = _lzw_encode(CONTENT)
    obj = (b"4 0 obj\n<< /Filter /LZWDecode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
           % (len(enc), enc))
    assert "filter chain works" in _extract_one(_one_page_pdf(obj))


def test_filter_chain_a85_then_flate():
    """Array form applied in order: [/ASCII85Decode /FlateDecode]."""
    import base64
    import zlib

    enc = base64.a85encode(zlib.compress(CONTENT)) + b"~>"
    obj = (b"4 0 obj\n<< /Filter [/ASCII85Decode /FlateDecode] /Length %d >>\n"
           b"stream\n%s\nendstream\nendobj\n" % (len(enc), enc))
    assert "filter chain works" in _extract_one(_one_page_pdf(obj))


def test_image_filter_yields_no_garbage():
    from docling_serve_spark.extract.pdf_extract import _decode_stream

    assert _decode_stream("<< /Filter /DCTDecode >>", "\xff\xd8junk") == ""


# ------------------------ encrypted PDFs -------------------------- #
# Crawl PDFs are often RC4-encrypted with an EMPTY user password —
# viewers open them silently, but the bytes are enciphered. Fixtures
# are generated with the spec algorithms (2/3/4/5) directly.

_ID0 = bytes.fromhex("0123456789abcdef0123456789abcdef")


def _make_encrypted_pdf(r: int, p: int = -44) -> bytes:
    import hashlib

    from docling_serve_spark.extract.pdf_extract import (
        _PW_PAD,
        _object_key,
        _rc4,
    )

    nbytes = 16 if r >= 3 else 5
    # Algorithm 3: /O for empty owner+user password
    okey = hashlib.md5(_PW_PAD).digest()
    if r >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey).digest()
    okey = okey[:nbytes]
    o = _rc4(okey, _PW_PAD)
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)
    # Algorithm 2: file key for empty user password
    key = hashlib.md5(
        _PW_PAD + o[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + _ID0
    ).digest()[:nbytes]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()[:nbytes]
    # Algorithm 4/5: /U
    if r == 2:
        u = _rc4(key, _PW_PAD)
    else:
        u = _rc4(key, hashlib.md5(_PW_PAD + _ID0).digest())
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u += b"\x00" * 16
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (secret crawl text) Tj ET"
    enc_content = _rc4(_object_key(key, 4), content)

    def hexs(b):
        return b"<" + b.hex().encode() + b">"

    v, lengths = (1, b"") if r == 2 else (2, b"/Length 128 ")
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(enc_content), enc_content)
        + b"5 0 obj\n<< /Filter /Standard /V %d /R %d " % (v, r)
        + lengths
        + b"/P %d /O %s /U %s >>\nendobj\n" % (p, hexs(o), hexs(u))
        + b"trailer << /Root 1 0 R /Encrypt 5 0 R /ID [%s %s] >>\n%%%%EOF\n"
        % (hexs(_ID0), hexs(_ID0))
    )


@pytest.mark.parametrize("r", [2, 3])
def test_rc4_encrypted_empty_password_extracts(r):
    pdf = _make_encrypted_pdf(r)
    res = extract_document(pdf, name=f"enc-r{r}")
    assert res.status == "success"
    assert "secret crawl text" in res.extracted_text


def test_password_protected_pdf_contained_failure():
    pdf = _make_encrypted_pdf(3)
    # corrupt /U: the empty user password no longer verifies
    import re as _re

    m = _re.search(rb"/U <([0-9a-f]+)>", pdf)
    bad = pdf.replace(m.group(1), b"00" * (len(m.group(1)) // 2))
    res = extract_document(bad, name="locked")
    assert res.status == "failure"
    assert "password" in (res.error or "")


def test_unknown_encryption_revision_contained_failure():
    pdf = _make_encrypted_pdf(3).replace(b"/V 2 /R 3", b"/V 7 /R 9")
    res = extract_document(pdf, name="exotic")
    assert res.status == "failure"
    assert "unsupported encryption" in (res.error or "")


def _make_aesv2_pdf() -> bytes:
    """V4 R4 /CFM /AESV2 fixture (128-bit key, empty passwords)."""
    import hashlib

    from docling_serve_spark.extract import aes as _aes
    from docling_serve_spark.extract.pdf_extract import (
        _PW_PAD,
        _object_key,
        _rc4,
    )

    p = -44
    okey = hashlib.md5(_PW_PAD).digest()
    for _ in range(50):
        okey = hashlib.md5(okey).digest()
    okey = okey[:16]
    o = _rc4(okey, _PW_PAD)
    for i in range(1, 20):
        o = _rc4(bytes(b ^ i for b in okey), o)
    key = hashlib.md5(
        _PW_PAD + o[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + _ID0
    ).digest()[:16]
    for _ in range(50):
        key = hashlib.md5(key[:16]).digest()[:16]
    u = _rc4(key, hashlib.md5(_PW_PAD + _ID0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    u += b"\x00" * 16
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (aes v2 secret) Tj ET"
    iv = bytes(range(16))
    enc_content = iv + _aes.cbc_encrypt(
        _object_key(key, 4, aes=True), _aes.pad_pkcs5(content), iv
    )

    def hexs(b):
        return b"<" + b.hex().encode() + b">"

    return (
        b"%PDF-1.6\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(enc_content), enc_content)
        + b"5 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128 "
        b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF "
        + b"/P %d /O %s /U %s >>\nendobj\n" % (p, hexs(o), hexs(u))
        + b"trailer << /Root 1 0 R /Encrypt 5 0 R /ID [%s %s] >>\n%%%%EOF\n"
        % (hexs(_ID0), hexs(_ID0))
    )


def test_aesv2_encrypted_empty_password_extracts():
    res = extract_document(_make_aesv2_pdf(), name="aesv2")
    assert res.status == "success"
    assert "aes v2 secret" in res.extracted_text


def _make_aes256_pdf(r: int) -> bytes:
    """V5 AES-256 fixture: R5 (SHA-256 salts) or R6 (Algorithm 2.B
    hardened hash), empty user password."""
    import hashlib

    from docling_serve_spark.extract import aes as _aes
    from docling_serve_spark.extract.pdf_extract import _hash_2b

    val_salt = b"VALSALT1"
    key_salt = b"KEYSALT2"
    file_key = bytes(range(32))
    if r == 6:
        uhash = _hash_2b(b"", val_salt)
        inter = _hash_2b(b"", key_salt)
    else:
        uhash = hashlib.sha256(val_salt).digest()
        inter = hashlib.sha256(key_salt).digest()
    u = uhash + val_salt + key_salt
    ue = _aes.cbc_encrypt(inter, file_key, b"\x00" * 16)
    o = b"\x11" * 48  # owner path unused by the empty-user flow
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (aes256 secret text) Tj ET"
    iv = bytes(reversed(range(16)))
    enc_content = iv + _aes.cbc_encrypt(file_key, _aes.pad_pkcs5(content), iv)

    def hexs(b):
        return b"<" + b.hex().encode() + b">"

    return (
        b"%PDF-2.0\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(enc_content), enc_content)
        + b"5 0 obj\n<< /Filter /Standard /V 5 /R %d /Length 256 " % r
        + b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF "
        + b"/P -44 /O %s /U %s /UE %s >>\nendobj\n" % (hexs(o), hexs(u), hexs(ue))
        + b"trailer << /Root 1 0 R /Encrypt 5 0 R /ID [%s %s] >>\n%%%%EOF\n"
        % (hexs(_ID0), hexs(_ID0))
    )


@pytest.mark.parametrize("r", [5, 6])
def test_aes256_encrypted_empty_password_extracts(r):
    res = extract_document(_make_aes256_pdf(r), name=f"aes256-r{r}")
    assert res.status == "success"
    assert "aes256 secret text" in res.extracted_text


def test_aes256_password_protected_contained():
    pdf = _make_aes256_pdf(6)
    import re as _re

    m = _re.search(rb"/U <([0-9a-f]{96})>", pdf)
    bad = pdf.replace(m.group(1), b"00" * 48)
    res = extract_document(bad, name="locked256")
    assert res.status == "failure"
    assert "password" in (res.error or "")


def test_unencrypted_with_decoy_encrypt_bytes_unaffected():
    """'/Encrypt N 0 R' bytes inside a stream body must not flip an
    unencrypted file into the decrypt path."""
    decoy = b"BT (about /Encrypt 3 0 R syntax) Tj ET\n" + CONTENT
    obj = (b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
           % (len(decoy), decoy))
    assert "filter chain works" in _extract_one(_one_page_pdf(obj))


@needs_ref
def test_tj_offsets_produce_word_spaces():
    """pdftex-style PDFs encode inter-word gaps as negative TJ
    offsets, not literal spaces: before offset-aware decoding this
    file extracted 'SOPBakeries OperationalStandardOperatingProcedures'."""
    r = extract_document(open(f"{REF}/english/SOP.pdf", "rb").read(), name="sop")
    assert "Standard Operating Procedures (SOP) Manual" in r.extracted_text
    assert "Table of Contents" in r.extracted_text
    assert "TableofContents" not in r.extracted_text


# --------------- Type0 / CID composite fonts (ISO 32000 §9.7) ------ #

def _type0_pdf() -> bytes:
    """Synthetic CJK/Arabic composite-font fixture per ISO 32000 §9.7:
    a /Type0 font under /Identity-H with a CIDFontType2 descendant and
    a 2-byte ToUnicode CMap (bfchar incl. a surrogate-pair target,
    bfrange); a second Type0 with NO ToUnicode (its Identity CIDs are
    glyph ids — must emit nothing, never latin-1 mojibake); a third
    whose ToUnicode lies about its codespace (<00><FF>) — the encoding
    CMap, not the ToUnicode header, governs the 2-byte code width."""
    tou = (b"/CIDInit /ProcSet findresource begin\n"
           b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
           b"4 beginbfchar\n"
           b"<0001> <65E5>\n<0002> <672C>\n<0003> <8A9E>\n"
           b"<0008> <D842DFB7>\n"
           b"endbfchar\n"
           b"1 beginbfrange\n<0004> <0005> <0633>\nendbfrange\n"
           b"endcmap end end")
    tou_bad_cs = (b"1 begincodespacerange <00> <FF> endcodespacerange\n"
                  b"1 beginbfchar\n<0001> <03A7>\nendbfchar\nendcmap")
    content = (b"BT /F1 14 Tf 1 0 0 1 72 700 Tm <000100020003> Tj "
               b"1 0 0 1 72 680 Tm [<0004> -200 <0005>] TJ "
               b"1 0 0 1 72 660 Tm <0008> Tj ET "
               b"BT /F2 12 Tf 1 0 0 1 72 640 Tm <00060007> Tj ET "
               b"BT /F3 12 Tf 1 0 0 1 72 620 Tm <0001> Tj ET")
    plain = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
            b"<< /Font << /F1 5 0 R /F2 8 0 R /F3 9 0 R >> >> >>"),
        5: (b"<< /Type /Font /Subtype /Type0 /BaseFont /TestCJK "
            b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
            b"/ToUnicode 7 0 R >>"),
        6: (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /TestCJK "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /DW 1000 /W [1 [600 600 600]] >>"),
        8: (b"<< /Type /Font /Subtype /Type0 /BaseFont /NoToUni "
            b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>"),
        9: (b"<< /Type /Font /Subtype /Type0 /BaseFont /BadCodespace "
            b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
            b"/ToUnicode 10 0 R >>"),
    }
    streams = {4: content, 7: tou, 10: tou_bad_cs}
    out = [b"%PDF-1.5\n"]
    for n in sorted(plain | streams):
        if n in plain:
            out.append(b"%d 0 obj\n%s\nendobj\n" % (n, plain[n]))
        else:
            s = streams[n]
            out.append(
                b"%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
                % (n, len(s), s)
            )
    out.append(b"trailer << /Root 1 0 R >>\n%%EOF\n")
    return b"".join(out)


def test_type0_identity_h_cjk_and_arabic():
    text = _extract_one(_type0_pdf())
    assert "日本語" in text            # 2-byte bfchar codes
    assert "س ش" in text              # bfrange + TJ gap -> word space
    assert "\U00020BB7" in text       # surrogate-pair ToUnicode target


def test_type0_without_tounicode_emits_nothing():
    text = _extract_one(_type0_pdf())
    # F2's <00060007> CIDs have no unicode mapping: nothing may leak
    assert "\x06" not in text and "\x07" not in text


def test_type0_encoding_overrides_tounicode_codespace():
    text = _extract_one(_type0_pdf())
    # F3's ToUnicode claims 1-byte codes; Identity-H forces 2-byte, so
    # <0001> is ONE code -> U+03A7, never two split bytes
    assert "Χ" in text


def test_type0_full_pipeline_success():
    r = extract_document(_type0_pdf(), name="type0.pdf")
    assert r.status == "success"
    assert "日本語" in r.extracted_text


# ------- mixed-width codespace ranges (Adobe CMap spec §7.2) -------- #

_RKSJ_CMAP = """
/CIDInit /ProcSet findresource begin
2 begincodespacerange
<00> <80>
<8140> <FCFC>
endcodespacerange
3 beginbfchar
<41> <0041>
<8140> <3000>
<8160> <301C>
endbfchar
endcmap
"""


def test_cmap_mixed_width_codespace_decodes_variably():
    """Shift-JIS-shaped codespace: 1-byte ASCII codes interleaved with
    2-byte codes starting at 0x81 — a fixed-width split garbles both."""
    fm = _parse_cmap(_RKSJ_CMAP)
    assert fm.ranges is not None and fm._widths == [1, 2]
    # A <8140> A <8160> : widths 1,2,1,2
    assert fm.decode("\x41\x81\x40\x41\x81\x60") == "A　A〜"
    # unmapped 1-byte code inside the range passes through raw
    assert fm.decode("\x42") == "\x42"
    # unmapped 2-byte code inside the range emits nothing
    assert fm.decode("\x82\x50") == ""
    # bytes outside every range (0x81 at end, no second byte) skip
    assert fm.decode("\x41\xff") == "A"


def test_cmap_single_width_multi_range_stays_fixed():
    fm = _parse_cmap(
        "2 begincodespacerange <00> <3F> <40> <FF> endcodespacerange "
        "1 beginbfchar <41> <0058> endbfchar"
    )
    assert fm.ranges is None and fm.width == 1
    assert fm.decode("\x41") == "X"


def _rksj_type0_pdf() -> bytes:
    """Type0 font under a non-Identity encoding whose ToUnicode
    declares a mixed 1/2-byte codespace (the 90ms-RKSJ shape): the
    hex string mixes 1-byte and 2-byte codes in one run."""
    tou = (b"/CIDInit /ProcSet findresource begin\n"
           b"2 begincodespacerange\n<00> <80>\n<8140> <FCFC>\n"
           b"endcodespacerange\n"
           b"4 beginbfchar\n"
           b"<48> <0048>\n<69> <0069>\n<8140> <3042>\n<8141> <3044>\n"
           b"endbfchar\nendcmap end end")
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm <48698140814148> Tj ET"
    plain = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> >>"),
        5: (b"<< /Type /Font /Subtype /Type0 /BaseFont /TestRKSJ "
            b"/Encoding /90ms-RKSJ-H /DescendantFonts [6 0 R] "
            b"/ToUnicode 7 0 R >>"),
        6: (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /TestRKSJ "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
            b"/Supplement 6 >> /DW 1000 >>"),
    }
    streams = {4: content, 7: tou}
    out = [b"%PDF-1.5\n"]
    for n in sorted(plain | streams):
        if n in plain:
            out.append(b"%d 0 obj\n%s\nendobj\n" % (n, plain[n]))
        else:
            s = streams[n]
            out.append(
                b"%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
                % (n, len(s), s)
            )
    out.append(b"trailer << /Root 1 0 R >>\n%%EOF\n")
    return b"".join(out)


def test_type0_rksj_mixed_width_end_to_end():
    text = _extract_one(_rksj_type0_pdf())
    assert "HiあいH" in text


def test_type0_identity_still_forces_fixed_two_byte():
    # the Identity-H override must strip variable ranges too: a lying
    # mixed-width ToUnicode under Identity-H decodes fixed-2-byte
    fm = _parse_cmap(_RKSJ_CMAP)
    forced = _FontMap(2, fm.map)
    assert forced.decode("\x81\x40") == "　"
