"""Per-row conversion core: one page row in -> one result row out.

This is the engine's equivalent of the reference's
``run_conversion`` worker body
(reference:docling_serve/engines/async_local/worker.py:85-257):
source normalization -> format routing (S4) -> PDF analysis (F1-F10)
-> parse/extract (C1-C8) -> channel export (E1-E7) -> BiDi
post-processing (T2-T4). It is a *pure function* of
(bytes, name, lang, options), which is what makes the Spark pipeline's
output byte-identical to this single-node oracle (the north-rule
invariant, SURVEY.md §5.2).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from docling_serve_spark.docmodel.export import (
    export_to_doctags,
    export_to_html,
    export_to_json,
    export_to_markdown,
    export_to_text,
)
from docling_serve_spark.docmodel.model import Document
from docling_serve_spark.extract.html_extract import extract_html
from docling_serve_spark.extract.data_extract import DataParseError
from docling_serve_spark.extract.office_extract import OfficeParseError
from docling_serve_spark.extract.pdf_extract import (
    PdfParseError,
    extract_pdf_ordered,
    order_pages,
    page_texts_ordered,
    parse_pdf_pages,
)
from docling_serve_spark.extract.postprocess import process_markdown_bidi
from docling_serve_spark.extract.quality import (
    MODE_SKIP,
    QUALITY_UNKNOWN,
    analyze_pages,
    force_ocr_effective,
    quality_score,
    sample_pages,
)

DOC_TYPE_HTML = "html"
DOC_TYPE_PDF = "pdf"
DOC_TYPE_DOCX = "docx"
DOC_TYPE_PPTX = "pptx"
DOC_TYPE_XLSX = "xlsx"
DOC_TYPE_MD = "md"
DOC_TYPE_ASCIIDOC = "asciidoc"
DOC_TYPE_IMAGE = "image"
DOC_TYPE_OFFICE = "office"  # PK container of unrecognized flavor
# docling InputFormat values (reference defaults from_formats to ALL
# of InputFormat, datamodel/convert.py:115-125 — csv/xml_jats/
# xml_uspto/json_docling included)
DOC_TYPE_CSV = "csv"
DOC_TYPE_XML_JATS = "xml_jats"
DOC_TYPE_XML_USPTO = "xml_uspto"
DOC_TYPE_JSON_DOCLING = "json_docling"
DOC_TYPE_UNKNOWN = "unknown"

# every type the router can dispatch (the reference's InputFormat set,
# reference:docs/usage.md:9 — docx/pptx/html/image/pdf/asciidoc/md —
# plus xlsx, which docling's InputFormat also accepts)
ROUTABLE_TYPES = (
    DOC_TYPE_HTML, DOC_TYPE_PDF, DOC_TYPE_DOCX, DOC_TYPE_PPTX,
    DOC_TYPE_XLSX, DOC_TYPE_MD, DOC_TYPE_ASCIIDOC, DOC_TYPE_IMAGE,
    DOC_TYPE_CSV, DOC_TYPE_XML_JATS, DOC_TYPE_XML_USPTO,
    DOC_TYPE_JSON_DOCLING,
)

STATUS_SUCCESS = "success"
STATUS_FAILURE = "failure"
STATUS_SKIPPED = "skipped"

ALL_FORMATS = ("md", "text", "html", "doctags", "json")

_IMAGE_MAGICS = (
    b"\x89PNG\r\n\x1a\n",
    b"\xff\xd8\xff",  # JPEG
    b"GIF87a",
    b"GIF89a",
    b"II*\x00",  # TIFF LE
    b"MM\x00*",  # TIFF BE
    b"BM",  # BMP
)


def _sniff_markup(head: bytes) -> str | None:
    """Markdown vs AsciiDoc heuristic over decodable text that is not
    HTML (the reference routes by extension, convert.py:115-125; a
    crawl has none). Conservative: only explicit structural markers
    classify; plain prose stays 'unknown'."""
    try:
        text = head.decode("utf-8")
    except UnicodeDecodeError:
        return None
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    if not lines:
        return None
    first = lines[0]
    if first.startswith("= ") or any(
        ln.startswith(("== ", "|===")) for ln in lines
    ):
        return DOC_TYPE_ASCIIDOC
    if first.startswith(("# ", "## ")) or any(
        ln.startswith(("## ", "```")) for ln in lines
    ):
        return DOC_TYPE_MD
    return None


def _sniff_csv(head: bytes) -> str | None:
    """Conservative CSV detection: >=3 non-empty lines sharing an
    IDENTICAL count (>=1) of the same delimiter. Prose with commas has
    varying counts per line; tables do not."""
    try:
        text = head.decode("utf-8")
    except UnicodeDecodeError:
        return None
    lines = [ln for ln in text.split("\n") if ln.strip()][:6]
    # drop the final (possibly truncated by the 4 KiB probe) line
    if len(lines) > 3:
        lines = lines[:-1]
    if len(lines) < 3:
        return None
    for delim in (",", ";", "\t", "|"):
        counts = [ln.count(delim) for ln in lines]
        if counts[0] >= 1 and all(c == counts[0] for c in counts):
            return DOC_TYPE_CSV
    return None


def sniff_doc_type(data: bytes) -> str:
    """S4 — format routing by magic bytes + structure (the reference
    routes on from_formats + file extension,
    reference:docling_serve/datamodel/convert.py:115-125; a crawl
    corpus has no extensions, so sniff content)."""
    if data[:2] in (b"\xff\xfe", b"\xfe\xff") and not any(
        data.startswith(m) for m in _IMAGE_MAGICS
    ):
        # UTF-16 BOM: decode enough to re-sniff (crawls carry these)
        try:
            return sniff_doc_type(
                data[:2048].decode("utf-16", errors="ignore").encode("utf-8")
            )
        except Exception:  # noqa: BLE001
            return DOC_TYPE_UNKNOWN
    if data.startswith(b"%PDF"):
        return DOC_TYPE_PDF
    if data.startswith(b"PK\x03\x04"):
        # OOXML container: flavor from the part names riding the local
        # file headers (C9)
        from docling_serve_spark.extract.office_extract import detect_ooxml

        return detect_ooxml(data) or DOC_TYPE_OFFICE
    if any(data.startswith(m) for m in _IMAGE_MAGICS):
        return DOC_TYPE_IMAGE
    head = data[:1024].lstrip().lower()
    if head.startswith(b"{") and b'"schema_name"' in data[:2048]:
        # the engine's own json channel round-trips (docling
        # InputFormat.JSON_DOCLING)
        if b"doclingdocument" in data[:2048].lower():
            return DOC_TYPE_JSON_DOCLING
    if head.startswith(b"<?xml") or head.startswith(b"<!doctype article") \
            or head.startswith(b"<!doctype us-patent"):
        # structured-XML flavors the reference routes via docling
        # backends (XML declaration / DTD required — an HTML5 fragment
        # using <article> must stay on the html path). Checked BEFORE
        # the html substring probes: JATS uses a <body> element too.
        probe = data[:4096].lower()
        if b"<us-patent" in probe or b"<patdoc" in probe:
            return DOC_TYPE_XML_USPTO
        if b"<article" in probe and (
            b"<front" in probe or b"<article-title" in probe or b"jats" in probe
        ):
            return DOC_TYPE_XML_JATS
        return DOC_TYPE_HTML  # xhtml and friends
    if head.startswith(b"<!doctype") or head.startswith(b"<html"):
        return DOC_TYPE_HTML
    if b"<html" in head or b"<body" in head or b"<head" in head:
        return DOC_TYPE_HTML
    # permissive: tag-looking content is treated as html fragment
    if head.startswith(b"<"):
        return DOC_TYPE_HTML
    return _sniff_markup(data[:4096]) or _sniff_csv(data[:4096]) or DOC_TYPE_UNKNOWN


@dataclass(frozen=True)
class ExtractOptions:
    """Batch-job analog of ConvertDocumentsOptions
    (reference:docling_serve/datamodel/convert.py:114-479); defaults
    mirror the reference's."""

    # default mirrors the reference: markdown only (convert.py:127-137
    # "Optional, defaults to Markdown"); extracted_text (the
    # north-rule strict-text column) and spans are always produced
    to_formats: tuple[str, ...] = ("md",)
    do_ocr: bool = True
    force_ocr: bool = False
    enable_bidi_processing: bool = True  # convert.py:456-466
    max_file_size_bytes: int = 200 * 1024 * 1024  # ocrmypdf_settings.py:32
    max_num_pages: int = 0  # 0 = unlimited (docling_conversion.py:252-254)
    page_break_placeholder: str = ""  # convert.py:299-305
    # C10 — page_range [first, last], 1-based inclusive; last=0 = open
    # (reference:datamodel/convert.py:230-236 default [1, max])
    page_range: tuple[int, int] = (1, 0)
    # E6 — image_export_mode ∈ {embedded, placeholder, referenced}
    # (convert.py:139-151, default embedded)
    image_export_mode: str = "embedded"
    # C4 — table_mode ∈ {fast, accurate} (convert.py:212-223, default
    # fast); accurate also recovers ragged grids by column anchoring
    table_mode: str = "fast"
    # F11/T1 — Arabic-correction dispatch gate (fork default OFF via
    # .env DOCLING_ARABIC_ENABLED=false; correction itself is an
    # external LLM service -> no-op fallback offline,
    # arabic_correction_middleware.py:171-180)
    enable_arabic_correction: bool = False
    # C11 — per-document wall-clock budget in seconds; 0 = unlimited
    # (convert.py:238-245, settings.py:49)
    document_timeout_s: float = 0.0
    # C6 — enrichment flags (convert.py:307-349): external-model
    # stages, dispatch-only offline; carried so job configs round-trip
    do_code_enrichment: bool = False
    do_formula_enrichment: bool = False
    do_picture_classification: bool = False
    do_picture_description: bool = False
    # C7 — pipeline ∈ {standard, vlm} (convert.py:225-228); vlm is the
    # external SmolDocling path, dispatch-only offline
    pipeline: str = "standard"
    # S4 — from_formats allow-list (convert.py:115-125): sniffed types
    # outside the list are skipped + counted, not failed; default is
    # every routable format, as the reference defaults to all
    from_formats: tuple[str, ...] = ROUTABLE_TYPES
    # P1/P2 — OCRMyPDF preprocessing surface (ocrmypdf_middleware.py:
    # 79-200); compute is an external binary, the mode logic is ours
    enable_ocrmypdf_preprocessing: bool = False
    ocrmypdf_deskew: bool = False
    ocrmypdf_clean: bool = False
    ocrmypdf_redo_ocr: bool = False
    # P1 — OCRMyPDF per-file size cap (ocrmypdf_settings.py:32)
    ocrmypdf_max_file_size_mb: int = 200
    # A1 — AI-Vision trigger gate (worker.py:119-127; middleware
    # compute is an external VLM service, the trigger predicate is ours)
    enable_ai_vision: bool = False
    # A4/A5 — AI-Vision output shaping flags (convert.py:400-421);
    # recorded; the page-break marker join is operator A4
    ai_vision_preserve_formatting: bool = True
    ai_vision_include_page_breaks: bool = True
    # C6 — picture-description area gate (convert.py:351-357); the
    # description model itself is an external service
    picture_description_area_threshold: float = 0.05
    # C5 — OCR engine selection + languages (convert.py:175-198);
    # engines are external, the dispatch surface and the P4 language
    # mapping are ours
    ocr_engine: str = "easyocr"
    ocr_lang: tuple[str, ...] = ()
    # C1 — pdf_backend (convert.py:200-210): accepted + recorded; this
    # engine has exactly one from-scratch backend
    pdf_backend: str = "dlparse_v4"
    # O6/batch — abort_on_error (convert.py:247-255): job-level
    # fail-fast, enforced by the checkpointed runner (warehouse.py)
    abort_on_error: bool = False
    # C4 — do_table_structure (convert.py:257-267): when off, table
    # regions degrade to plain text rows
    do_table_structure: bool = True
    # E6 — include_images + images_scale (convert.py:269-297): when
    # off, picture items are dropped from every channel; scale rides
    # along for the (external) raster path
    include_images: bool = True
    images_scale: float = 2.0

    def tesseract_langs(self) -> tuple[str, ...]:
        """P4 — ocr_lang codes mapped to tesseract codes for the
        tesseract engines (ocr_language_utils.py:160-175: unknown
        codes are dropped); other engines take the codes verbatim."""
        if not self.ocr_engine.startswith("tesseract"):
            return self.ocr_lang
        from docling_serve_spark.extract.langmap import (
            convert_to_tesseract_codes,
        )

        return tuple(convert_to_tesseract_codes(list(self.ocr_lang)))

    def normalized(self) -> "ExtractOptions":
        """P2 — mode-conflict resolution: redo_ocr cannot combine with
        page-altering preprocessing (deskew/clean); demote to force
        (reference:ocrmypdf_middleware.py:131-138). Driver-side, once."""
        from dataclasses import replace

        if self.ocrmypdf_redo_ocr and (self.ocrmypdf_deskew or self.ocrmypdf_clean):
            return replace(self, ocrmypdf_redo_ocr=False, force_ocr=True)
        return self


@dataclass
class ExtractionResult:
    """One output row (DocumentResponse ⊕ analysis ⊕ counters,
    reference:datamodel/responses.py:22-36 + pdf_analysis.py:26-32)."""

    name: str
    status: str
    doc_type: str
    extracted_text: str = ""
    md_content: str = ""
    html_content: str = ""
    doctags_content: str = ""
    json_content: str = ""
    spans_json: str = "[]"
    num_pages: int = 0
    n_items: int = 0
    # F1-F10 analysis surface
    has_text: bool = False
    is_tagged: bool = False
    text_quality: str = QUALITY_UNKNOWN
    quality_score: float = 0.0
    recommended_mode: str = ""
    force_ocr_effective: bool = False
    ocr_invoked: bool = False
    arabic_dispatched: bool = False
    # A1 — AI-Vision trigger (worker.py:119-127)
    ai_vision_triggered: bool = False
    # P1/P3 — OCRMyPDF dispatch + post-preprocess force_ocr reset
    # (worker.py:215-220)
    ocrmypdf_performed: bool = False
    error: str = ""
    errors: list[str] = field(default_factory=list)


def _spans_json(doc: Document) -> str:
    spans = []
    for item in doc.items:
        for p in item.prov:
            spans.append(
                {
                    "label": item.item_type,
                    "page_no": p.page_no,
                    "bbox": p.bbox.as_dict(),
                    "charspan": list(p.charspan),
                }
            )
    return json.dumps(spans, ensure_ascii=False, sort_keys=True, separators=(",", ":"))


def _degrade_items(doc: Document, opts: ExtractOptions) -> Document:
    """do_table_structure=False degrades table regions to plain text
    rows (structure model off, content kept — convert.py:257-267);
    include_images=False drops picture items from every channel
    (convert.py:269-278). Charspans are re-assigned afterwards."""
    from docling_serve_spark.docmodel.export import assign_charspans
    from docling_serve_spark.docmodel.model import (
        PICTURE,
        TABLE,
        TEXT,
        DocItem,
        table_to_rows,
    )

    if opts.do_table_structure and opts.include_images:
        return doc
    items = []
    for it in doc.items:
        if it.item_type == TABLE and not opts.do_table_structure:
            rows = table_to_rows(it.table) if it.table else []
            t = "\n".join(
                " ".join(c for c in r if c) for r in rows
            ).strip()
            if t:
                items.append(DocItem(TEXT, t, prov=it.prov))
        elif it.item_type == PICTURE and not opts.include_images:
            continue
        else:
            items.append(it)
    doc.items = items
    return assign_charspans(doc)


def _export_channels(
    res: ExtractionResult, doc: Document, opts: ExtractOptions, lang: str
) -> None:
    """E1-E7 + T2-T4 wiring (worker.py:238-257 order: export, then
    BiDi on md)."""
    doc = _degrade_items(doc, opts)
    res.extracted_text = export_to_text(doc)
    if "md" in opts.to_formats:
        md = export_to_markdown(
            doc,
            page_break_placeholder=opts.page_break_placeholder or None,
            image_mode=opts.image_export_mode,
        )
        if opts.enable_bidi_processing:
            md = process_markdown_bidi(md)
        res.md_content = md
    if "html" in opts.to_formats:
        res.html_content = export_to_html(doc, image_mode=opts.image_export_mode)
    if "doctags" in opts.to_formats:
        res.doctags_content = export_to_doctags(doc)
    if "json" in opts.to_formats:
        res.json_content = export_to_json(doc)
    res.spans_json = _spans_json(doc)
    res.num_pages = doc.num_pages
    res.n_items = len(doc.items)
    # F11 Arabic gate: dispatch flag + offline no-op correction with
    # per-row fallback (the reference's graceful degradation,
    # arabic_correction_middleware.py:171-180); gate mirrors F11
    # (len >= 10 and Arabic detected; we use the lang column / Arabic
    # codepoint majority instead of langdetect)
    if opts.enable_arabic_correction:
        t = res.extracted_text.strip()
        n_ar = sum(1 for ch in t if "؀" <= ch <= "ۿ")
        res.arabic_dispatched = len(t) >= 10 and (
            lang.lower().startswith("ar") or n_ar * 2 > len(t)
        )


def extract_document(
    data: bytes,
    name: str = "",
    lang: str = "",
    opts: ExtractOptions | None = None,
) -> ExtractionResult:
    """The per-row conversion: pure, deterministic, total (never
    raises — failures become status rows, mirroring the reference's
    per-document error containment at worker.py:274-287)."""
    import time as _time

    opts = opts or ExtractOptions()
    t0 = _time.monotonic()
    if data and data[:2] == b"\x1f\x8b":
        # gzip member (crawls often store compressed bodies): inflate
        # before sniffing — but STREAM-decompress with a hard cap so a
        # gzip bomb (realistic in crawl data) cannot expand unbounded
        # in executor memory before the F13 size guard sees it; on
        # corrupt streams fall through to the unknown-format failure row
        import gzip as _gzip
        import io as _io

        inflated = None
        try:
            with _gzip.GzipFile(fileobj=_io.BytesIO(data)) as gz:
                inflated = gz.read(opts.max_file_size_bytes + 1)
        except Exception:  # noqa: BLE001
            pass
        if inflated is not None:
            if len(inflated) > opts.max_file_size_bytes:
                res = ExtractionResult(
                    name=name, status=STATUS_SKIPPED,
                    doc_type=DOC_TYPE_UNKNOWN,
                )
                res.error = (
                    "gzip payload exceeds max_file_size "
                    f"(> {opts.max_file_size_bytes} bytes)"
                )
                return res
            data = inflated
    doc_type = sniff_doc_type(data or b"")
    res = ExtractionResult(name=name, status=STATUS_SUCCESS, doc_type=doc_type)

    def timed_out() -> bool:
        # C11 — wall-clock budget checked between stages (the
        # reference cancels between pipeline stages too; a stage in
        # flight cannot be preempted)
        return (
            opts.document_timeout_s > 0
            and _time.monotonic() - t0 > opts.document_timeout_s
        )

    if not data:
        res.status = STATUS_FAILURE
        res.error = "empty input"
        return res
    if len(data) > opts.max_file_size_bytes:
        # F13 oversize guard: routed to the skip bucket, counted
        res.status = STATUS_SKIPPED
        res.error = f"file exceeds max_file_size ({len(data)} bytes)"
        return res
    if doc_type in ROUTABLE_TYPES and doc_type not in opts.from_formats:
        # S4 — from_formats allow-list (convert.py:115-125)
        res.status = STATUS_SKIPPED
        res.error = f"format not in from_formats: {doc_type}"
        return res

    try:
        if doc_type == DOC_TYPE_PDF:
            # parse + reading-order ONCE; quality projection and doc
            # assembly share the ordered lines (a PDF row is ~50x an
            # HTML row — re-parsing doubled the heavy bucket's cost)
            pages, tagged = parse_pdf_pages(data)
            if timed_out():
                res.status = STATUS_FAILURE
                res.error = "document timeout"
                return res
            ordered = order_pages(pages)
            page_texts = page_texts_ordered(ordered)
            if opts.max_num_pages and len(page_texts) > opts.max_num_pages:
                res.status = STATUS_SKIPPED
                res.error = f"exceeds max_num_pages ({len(page_texts)})"
                return res
            analysis = analyze_pages(page_texts, tagged)
            res.has_text = analysis.has_text
            res.is_tagged = analysis.is_tagged
            res.text_quality = analysis.text_quality
            res.quality_score = quality_score(sample_pages(page_texts))
            res.recommended_mode = analysis.recommended_mode
            res.force_ocr_effective = (
                opts.do_ocr
                and force_ocr_effective(analysis.recommended_mode, opts.force_ocr)
            )
            # OCR dispatch: rows needing OCR are *counted* (C5 is an
            # external engine offline — SURVEY.md §2.3); the text
            # channel falls back to embedded text.
            res.ocr_invoked = opts.do_ocr and analysis.recommended_mode != MODE_SKIP
            # A1 — AI-Vision trigger predicate (worker.py:119-127:
            # enabled ∧ recommended_mode=='force' ∧ supported type —
            # the middleware's supported_extensions default is ['.pdf'],
            # ai_vision_settings.py:18)
            res.ai_vision_triggered = (
                opts.enable_ai_vision
                and analysis.recommended_mode == "force"
            )
            # P1/P3 — OCRMyPDF dispatch: performed for any enabled PDF
            # under the size cap (ocrmypdf_middleware.py:70-100); when
            # performed, the preprocessor already did the OCR, so the
            # conversion must not force-redo it (worker.py:215-220 sets
            # options.force_ocr=False)
            res.ocrmypdf_performed = (
                opts.enable_ocrmypdf_preprocessing
                and len(data) <= opts.ocrmypdf_max_file_size_mb * 1024 * 1024
            )
            if res.ocrmypdf_performed:
                res.force_ocr_effective = False
            # C10 — page_range slice (analysis above ran on the full
            # document, as the reference's pre-conversion analysis
            # does); prov page numbers stay true via first_page
            first, last = opts.page_range
            first = max(1, first)
            sel = ordered[first - 1 : (last if last > 0 else None)]
            doc = extract_pdf_ordered(
                sel, name=name, first_page=first, table_mode=opts.table_mode
            )
            _export_channels(res, doc, opts, lang)
        elif doc_type == DOC_TYPE_HTML:
            doc = extract_html(data, name=name)
            if timed_out():
                res.status = STATUS_FAILURE
                res.error = "document timeout"
                return res
            res.has_text = any(i.text for i in doc.items)
            _export_channels(res, doc, opts, lang)
            if not doc.items:
                res.status = STATUS_FAILURE
                res.error = "no content extracted"
        elif doc_type in (DOC_TYPE_DOCX, DOC_TYPE_PPTX, DOC_TYPE_XLSX):
            # C9 — OOXML parse (stdlib zipfile + ElementTree)
            from docling_serve_spark.extract.office_extract import (
                extract_docx,
                extract_pptx,
                extract_xlsx,
            )

            fn = {
                DOC_TYPE_DOCX: extract_docx,
                DOC_TYPE_PPTX: extract_pptx,
                DOC_TYPE_XLSX: extract_xlsx,
            }[doc_type]
            doc = fn(data, name=name)
            if timed_out():
                res.status = STATUS_FAILURE
                res.error = "document timeout"
                return res
            res.has_text = any(i.text for i in doc.items)
            _export_channels(res, doc, opts, lang)
            if not doc.items:
                res.status = STATUS_FAILURE
                res.error = "no content extracted"
        elif doc_type in (DOC_TYPE_MD, DOC_TYPE_ASCIIDOC):
            # C9 — markup parse
            from docling_serve_spark.extract.markup_extract import (
                extract_asciidoc,
                extract_md,
            )

            fn = extract_md if doc_type == DOC_TYPE_MD else extract_asciidoc
            doc = fn(data, name=name)
            res.has_text = any(i.text for i in doc.items)
            _export_channels(res, doc, opts, lang)
            if not doc.items:
                res.status = STATUS_FAILURE
                res.error = "no content extracted"
        elif doc_type in (
            DOC_TYPE_CSV,
            DOC_TYPE_XML_JATS,
            DOC_TYPE_XML_USPTO,
            DOC_TYPE_JSON_DOCLING,
        ):
            # remaining docling InputFormats (convert.py:115-125)
            from docling_serve_spark.extract.data_extract import (
                extract_csv,
                extract_docling_json,
                extract_jats,
                extract_uspto,
            )

            fn = {
                DOC_TYPE_CSV: extract_csv,
                DOC_TYPE_XML_JATS: extract_jats,
                DOC_TYPE_XML_USPTO: extract_uspto,
                DOC_TYPE_JSON_DOCLING: extract_docling_json,
            }[doc_type]
            doc = fn(data, name=name)
            res.has_text = any(i.text or i.table for i in doc.items)
            _export_channels(res, doc, opts, lang)
            if not doc.items:
                res.status = STATUS_FAILURE
                res.error = "no content extracted"
        elif doc_type == DOC_TYPE_IMAGE:
            # C5 boundary — a raster's text IS the OCR output, and the
            # engines are external offline (SURVEY §2.3); the dispatch
            # surface is computed and counted like every other OCR row
            res.has_text = False
            res.recommended_mode = "force"
            res.force_ocr_effective = opts.do_ocr
            res.ocr_invoked = opts.do_ocr
            res.num_pages = 1
        elif doc_type == DOC_TYPE_OFFICE:
            res.status = STATUS_FAILURE
            res.error = "unsupported format: office container of unknown flavor"
        else:
            res.status = STATUS_FAILURE
            res.error = "unsupported format"
    except PdfParseError as e:
        res.status = STATUS_FAILURE
        res.error = f"pdf parse error: {e}"
    except OfficeParseError as e:
        res.status = STATUS_FAILURE
        res.error = f"office parse error: {e}"
    except DataParseError as e:
        res.status = STATUS_FAILURE
        res.error = f"data parse error: {e}"
    except Exception as e:  # noqa: BLE001 — per-row containment
        res.status = STATUS_FAILURE
        res.error = f"{type(e).__name__}: {e}"
    return res
