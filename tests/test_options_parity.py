"""ConvertDocumentsOptions parity: page_range (C10), image export
modes (E6), Arabic-correction gate (F11/T1), document timeout (C11),
picture items."""

import json

from docling_serve_spark.extract.core import ExtractOptions, extract_document
from docling_serve_spark.extract.html_extract import extract_html
from docling_serve_spark.sources.pages import gen_page


def _first_pdf():
    for i in range(500):
        row = gen_page(i)
        if bytes(row["html"]).startswith(b"%PDF"):
            return bytes(row["html"]), row["url"]
    raise AssertionError("no pdf in corpus")


IMG_HTML = (
    b"<html><body><main><article><h1>T</h1>"
    b'<p>Some long enough paragraph of body text for scoring here.</p>'
    b'<figure><img src="https://x/img.png" alt="A chart">'
    b"<figcaption>Fig 1</figcaption></figure>"
    b'<img src="/rel.jpg">'
    b"</article></main></body></html>"
)


def test_picture_items_extracted():
    doc = extract_html(IMG_HTML)
    pics = [i for i in doc.items if i.item_type == "picture"]
    assert len(pics) == 2
    assert pics[0].image_ref == "https://x/img.png"
    assert pics[0].text == "A chart"
    # pictures occupy no span in the strict-text channel
    assert all(p.prov[0].charspan[0] == p.prov[0].charspan[1] for p in pics)


def test_image_export_modes():
    outs = {}
    for mode in ("embedded", "placeholder", "referenced"):
        r = extract_document(
            IMG_HTML, name="img",
            opts=ExtractOptions(
                image_export_mode=mode,
                to_formats=("md", "html", "doctags", "json"),
            ),
        )
        assert r.status == "success"
        outs[mode] = r
        # text channel is mode-independent (pictures carry no text)
        assert r.extracted_text == outs["embedded"].extracted_text
    assert "<!-- image -->" in outs["placeholder"].md_content
    assert "![A chart](https://x/img.png)" in outs["referenced"].md_content
    assert "data:image/png;base64," in outs["embedded"].md_content
    assert '<img src="https://x/img.png"' in outs["referenced"].html_content
    j = json.loads(outs["embedded"].json_content)
    assert len(j["pictures"]) == 2
    assert j["pictures"][0]["image"]["uri"] == "https://x/img.png"


def test_page_range_slices_with_true_page_numbers():
    data, url = _first_pdf()
    full = extract_document(data, name=url)
    sliced = extract_document(
        data, name=url, opts=ExtractOptions(page_range=(2, 3))
    )
    assert full.num_pages > 3
    assert sliced.num_pages == 2
    spans = json.loads(sliced.spans_json)
    assert spans and {s["page_no"] for s in spans} <= {2, 3}
    # analysis still ran on the full document
    assert sliced.recommended_mode == full.recommended_mode


def test_arabic_gate():
    ar = "المحتوى العربي الكامل لهذه الوثيقة طويل بما يكفي للبوابة".encode()
    html = b"<html><body><main><p>" + ar + b"</p></main></body></html>"
    off = extract_document(html, name="a", lang="ar")
    assert not off.arabic_dispatched  # disabled by default (fork .env)
    on = extract_document(
        html, name="a", lang="ar", opts=ExtractOptions(enable_arabic_correction=True)
    )
    assert on.arabic_dispatched
    en = extract_document(
        b"<html><body><main><p>plain english text here</p></main></body></html>",
        name="e", lang="en",
        opts=ExtractOptions(enable_arabic_correction=True),
    )
    assert not en.arabic_dispatched
    # codepoint-majority fallback when lang column is empty
    unk = extract_document(
        html, name="u", lang="", opts=ExtractOptions(enable_arabic_correction=True)
    )
    assert unk.arabic_dispatched


def test_document_timeout():
    data, url = _first_pdf()
    r = extract_document(
        data, name=url, opts=ExtractOptions(document_timeout_s=1e-9)
    )
    assert r.status == "failure"
    assert r.error == "document timeout"
    ok = extract_document(
        data, name=url, opts=ExtractOptions(document_timeout_s=3600)
    )
    assert ok.status == "success"


def test_ocrmypdf_mode_conflict_normalization():
    """P2 — redo_ocr + deskew/clean demotes to force
    (reference:ocrmypdf_middleware.py:131-138)."""
    o = ExtractOptions(
        enable_ocrmypdf_preprocessing=True,
        ocrmypdf_redo_ocr=True,
        ocrmypdf_deskew=True,
    ).normalized()
    assert not o.ocrmypdf_redo_ocr and o.force_ocr
    clean = ExtractOptions(ocrmypdf_redo_ocr=True).normalized()
    assert clean.ocrmypdf_redo_ocr and not clean.force_ocr


def test_office_container_routed_and_counted():
    r = extract_document(b"PK\x03\x04junkzip", name="d.docx")
    assert r.doc_type == "office"
    assert r.status == "failure"
    assert "office" in r.error


def test_gzip_pages_inflated_transparently():
    import gzip

    row = gen_page(4)
    plain = extract_document(row["html"], name=row["url"], lang=row["lang"])
    gz = extract_document(
        gzip.compress(bytes(row["html"])), name=row["url"], lang=row["lang"]
    )
    assert gz.status == plain.status
    assert gz.extracted_text == plain.extracted_text
    # corrupt gzip falls through to a failure row, never raises
    bad = extract_document(b"\x1f\x8bgarbage", name="bad.gz")
    assert bad.status == "failure"


def test_utf16_html_decoded():
    html16 = (
        "<html><body><main><p>utf sixteen page body with enough text"
        "</p></main></body></html>"
    ).encode("utf-16")  # emits BOM
    r = extract_document(html16, name="u16")
    assert r.doc_type == "html"
    assert r.status == "success"
    assert "utf sixteen page body" in r.extracted_text


def test_from_formats_allowlist_skips_counted():
    row = gen_page(4)
    r = extract_document(
        row["html"], name=row["url"],
        opts=ExtractOptions(from_formats=("pdf",)),
    )
    assert r.status == "skipped"
    assert "from_formats" in r.error


def test_gzip_bomb_capped_not_inflated():
    """A small gzip member expanding past max_file_size must be
    skip-routed without materializing the full payload."""
    import gzip

    bomb = gzip.compress(b"\x00" * (4 * 1024 * 1024))  # ~4 KB compressed
    r = extract_document(
        bomb, name="bomb.gz",
        opts=ExtractOptions(max_file_size_bytes=1024 * 1024),
    )
    assert r.status == "skipped"
    assert "gzip payload exceeds max_file_size" in r.error


def test_ocr_engine_lang_mapping():
    """ocr_lang passes through for easyocr, maps via P4 for
    tesseract engines (unknown codes dropped,
    reference:ocr_language_utils.py:160-175)."""
    easy = ExtractOptions(ocr_engine="easyocr", ocr_lang=("fr", "xx"))
    assert easy.tesseract_langs() == ("fr", "xx")
    tess = ExtractOptions(ocr_engine="tesseract", ocr_lang=("fr", "en", "xx"))
    assert tess.tesseract_langs() == ("fra", "eng")
    cli = ExtractOptions(ocr_engine="tesseract_cli", ocr_lang=("ar",))
    assert cli.tesseract_langs() == ("ara",)


def test_recorded_option_fields_roundtrip():
    o = ExtractOptions(pdf_backend="pypdfium2", images_scale=1.5,
                       abort_on_error=True)
    assert o.pdf_backend == "pypdfium2"
    assert o.images_scale == 1.5
    assert o.abort_on_error


TABLE_HTML = (
    b"<html><body><main><article><h1>T</h1>"
    b"<p>Some long enough paragraph of body text for scoring here.</p>"
    b"<table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table>"
    b"</article></main></body></html>"
)


def test_do_table_structure_off_degrades_to_text():
    on = extract_document(TABLE_HTML, name="t")
    off = extract_document(
        TABLE_HTML, name="t", opts=ExtractOptions(do_table_structure=False)
    )
    assert "| k | v |" in on.md_content  # structured
    assert "| k | v |" not in off.md_content  # degraded
    assert "k v" in off.extracted_text  # content kept as text rows
    assert "a 1" in off.extracted_text


# Field-by-field parity with the reference's ConvertDocumentsOptions
# (reference:datamodel/convert.py:114-479 + :383-386). Every reference
# field maps to an ExtractOptions field or is explicitly declared
# server-only / external-config with a reason.
REFERENCE_FIELD_MAP = {
    "from_formats": "from_formats",
    "to_formats": "to_formats",
    "image_export_mode": "image_export_mode",
    "do_ocr": "do_ocr",
    "force_ocr": "force_ocr",
    "ocr_engine": "ocr_engine",
    "ocr_lang": "ocr_lang",
    "pdf_backend": "pdf_backend",
    "table_mode": "table_mode",
    "pipeline": "pipeline",
    "page_range": "page_range",
    "document_timeout": "document_timeout_s",
    "abort_on_error": "abort_on_error",
    "return_as_file": None,  # server-only: zip packaging of the HTTP response
    "do_table_structure": "do_table_structure",
    "include_images": "include_images",
    "images_scale": "images_scale",
    "md_page_break_placeholder": "page_break_placeholder",
    "do_code_enrichment": "do_code_enrichment",
    "do_formula_enrichment": "do_formula_enrichment",
    "do_picture_classification": "do_picture_classification",
    "do_picture_description": "do_picture_description",
    "picture_description_area_threshold": "picture_description_area_threshold",
    "picture_description_local": None,  # nested external-VLM config
    "picture_description_api": None,  # nested external-API config
    "enable_arabic_correction": "enable_arabic_correction",
    "enable_ai_vision": "enable_ai_vision",
    "ai_vision_preserve_formatting": "ai_vision_preserve_formatting",
    "ai_vision_include_page_breaks": "ai_vision_include_page_breaks",
    "enable_ocrmypdf_preprocessing": "enable_ocrmypdf_preprocessing",
    "ocrmypdf_deskew": "ocrmypdf_deskew",
    "ocrmypdf_clean": "ocrmypdf_clean",
    "enable_bidi_processing": "enable_bidi_processing",
}

# reference defaults we must mirror (usage.md + convert.py examples)
REFERENCE_DEFAULTS = {
    "to_formats": ("md",),
    "do_ocr": True,
    "force_ocr": False,
    "ocr_engine": "easyocr",
    "ocr_lang": (),
    "pdf_backend": "dlparse_v4",
    "table_mode": "fast",
    "pipeline": "standard",
    "abort_on_error": False,
    "do_table_structure": True,
    "include_images": True,
    "images_scale": 2.0,
    "image_export_mode": "embedded",
    "do_code_enrichment": False,
    "do_formula_enrichment": False,
    "do_picture_classification": False,
    "do_picture_description": False,
    "picture_description_area_threshold": 0.05,
    "enable_arabic_correction": False,
    "enable_ai_vision": False,
    "ai_vision_preserve_formatting": True,
    "ai_vision_include_page_breaks": True,
    "enable_ocrmypdf_preprocessing": False,
    "ocrmypdf_deskew": False,
    "ocrmypdf_clean": False,
    "enable_bidi_processing": True,
}


def test_every_reference_option_field_is_mapped():
    import dataclasses

    fields = {f.name for f in dataclasses.fields(ExtractOptions)}
    for ref_field, ours in REFERENCE_FIELD_MAP.items():
        if ours is not None:
            assert ours in fields, f"{ref_field} -> {ours} missing"


def test_reference_defaults_mirrored():
    o = ExtractOptions()
    for ref_field, expected in REFERENCE_DEFAULTS.items():
        ours = REFERENCE_FIELD_MAP[ref_field]
        assert getattr(o, ours) == expected, (ref_field, ours)


def test_include_images_off_drops_pictures():
    keep = extract_document(IMG_HTML, name="i", opts=ExtractOptions())
    drop = extract_document(
        IMG_HTML, name="i", opts=ExtractOptions(include_images=False)
    )
    assert "![A chart]" in keep.md_content or "data:image" in keep.md_content
    assert "A chart" not in drop.md_content
    assert "img" not in drop.md_content
    # text channel identical (pictures never carry text)
    assert keep.extracted_text == drop.extracted_text


def test_routable_types_cover_docling_inputformat():
    """S4 parity: the router accepts exactly docling 2.36's
    InputFormat values (the reference defaults from_formats to
    list(InputFormat), datamodel/convert.py:115-125)."""
    from docling_serve_spark.extract.core import ROUTABLE_TYPES

    DOCLING_236_INPUTFORMAT = {
        "docx", "pptx", "html", "image", "pdf", "asciidoc", "md",
        "csv", "xlsx", "xml_uspto", "xml_jats", "json_docling",
    }
    assert set(ROUTABLE_TYPES) == DOCLING_236_INPUTFORMAT
