"""Deterministic synthetic Common-Crawl-style pages corpus.

Exactly the BASELINE.json ``input_hint`` shape:
``(url string, warc_ts timestamp, html binary, text string,
lang string)`` with the FIXTURES.md §1 mix: ~90% small HTML pages
(boilerplate chrome + main article), ~8% degenerate HTML, ~2% heavy
synthetic PDFs (10-200 pages) to exercise type sniffing, size
bucketing and skew.

Every row is a pure function of (seed, i) — ``random.Random(f"{seed}:{i}")``
— so generation is order-independent and distributes over executors
with no driver-side loop (``spark.range(n)`` + ``mapInPandas``).
"""

from __future__ import annotations

import datetime as _dt
import random
from collections.abc import Iterator

_WORDS = {
    "en": ("the quick brown fox jumps over lazy dog data pipeline spark "
           "document extraction layout table content analysis quality "
           "crawl corpus engine batch partition shuffle scale text page").split(),
    "fr": ("le renard brun rapide saute par dessus chien donnees document "
           "extraction tableau contenu analyse qualite moteur page texte "
           "corpus partition echelle flux calcul rapide grande").split(),
    "es": ("el zorro marron rapido salta sobre perro datos documento "
           "extraccion tabla contenido analisis calidad motor pagina "
           "texto corpus particion escala flujo calculo grande").split(),
    "de": ("der schnelle braune fuchs springt uber hund daten dokument "
           "extraktion tabelle inhalt analyse qualitat motor seite text "
           "korpus partition skala fluss berechnung grosse").split(),
    "zh": "数据 文档 提取 表格 内容 分析 质量 引擎 页面 文本 语料 分区 规模 流程 计算 大规模 网页 爬虫 批处理 索引".split(),
    "ar": ("البيانات الوثيقة استخراج الجدول المحتوى التحليل الجودة "
           "المحرك الصفحة النص المدونة التقسيم الحجم التدفق الحساب "
           "الكبير الويب الزاحف الدفعة الفهرس").split(),
}
_LANGS = ("en", "en", "en", "fr", "es", "de", "zh", "ar")  # en-weighted

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def _sentence(rng: random.Random, lang: str, n: int) -> str:
    words = _WORDS[lang]
    sep = "" if lang == "zh" else " "
    s = sep.join(rng.choice(words) for _ in range(n))
    return s[0].upper() + s[1:] if lang not in ("zh", "ar") and s else s


def _paragraph(rng: random.Random, lang: str) -> str:
    return ". ".join(
        _sentence(rng, lang, rng.randint(6, 14)) for _ in range(rng.randint(2, 5))
    ) + "."


def _html_page(rng: random.Random, i: int, lang: str) -> bytes:
    title = _sentence(rng, lang, rng.randint(3, 6))
    nav = "".join(
        f'<li><a href="/s{k}">{_sentence(rng, lang, 2)}</a></li>' for k in range(6)
    )
    paras = [_paragraph(rng, lang) for _ in range(rng.randint(3, 10))]
    heads = [_sentence(rng, lang, rng.randint(2, 4)) for _ in range(rng.randint(1, 3))]
    lis = [_sentence(rng, lang, rng.randint(3, 7)) for _ in range(rng.randint(0, 5))]
    n_tr = rng.randint(2, 5)
    table = (
        "<table><tr><th>k</th><th>v</th></tr>"
        + "".join(
            f"<tr><td>{_sentence(rng, lang, 1)}</td><td>{rng.randint(0, 999)}</td></tr>"
            for _ in range(n_tr)
        )
        + "</table>"
    )
    body = [f"<h1>{title}</h1>"]
    for j, p in enumerate(paras):
        if j < len(heads):
            body.append(f"<h2>{heads[j]}</h2>")
        body.append(f"<p>{p}</p>")
    if lis:
        body.append("<ul>" + "".join(f"<li>{x}</li>" for x in lis) + "</ul>")
    body.append(table)
    sidebar = "".join(f'<a href="/r{k}">{_sentence(rng, lang, 3)}</a>' for k in range(8))
    html = (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title><style>body{{margin:0}}</style>"
        "<script>var x=1;function f(){return x}</script></head><body>"
        f'<header><ul class="nav">{nav}</ul></header>'
        f'<div class="sidebar">{sidebar}</div>'
        f"<main><article>{''.join(body)}</article></main>"
        f"<footer><p>© {2020 + i % 5} example.com — "
        f'{_sentence(rng, lang, 4)}</p></footer>'
        "</body></html>"
    )
    return html.encode("utf-8")


def _degenerate_html(rng: random.Random, i: int, lang: str) -> bytes:
    kind = rng.randint(0, 3)
    if kind == 0:
        return b"<!DOCTYPE html><html><head></head><body></body></html>"
    if kind == 1:  # unclosed tags
        return (
            f"<html><body><p>{_paragraph(rng, lang)}<p>{_paragraph(rng, lang)}"
            f"<div><ul><li>{_sentence(rng, lang, 4)}"
        ).encode("utf-8")
    if kind == 2:  # no main content, chrome only
        return (
            '<html><body><nav><a href="/">x</a></nav>'
            '<footer>footer only</footer></body></html>'
        ).encode("utf-8")
    return b"\xff\xfenot really text \x00\x01"  # undecodable junk


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _synth_pdf(rng: random.Random, i: int, lang: str) -> bytes:
    """Synthetic PDF exercising the C1-C4 parser subset: title run
    (18pt), section headers (14pt), body lines (12pt), one aligned
    table block per ~3 pages, ~25% tagged, ~20% 2-column. Content
    streams are /FlateDecode-compressed for even ``i`` (keyed off the
    row index, NOT an rng draw, so the text content of every page is
    unchanged vs the uncompressed-only corpus) — real crawl PDFs are
    virtually always Flate-compressed, so goldens cover both."""
    n_pages = rng.randint(10, 200)
    tagged = rng.random() < 0.25
    two_col = rng.random() < 0.20
    compress = i % 2 == 0
    wlang = "en" if lang == "zh" else lang  # latin-1 content streams
    if wlang == "ar":
        wlang = "en"

    objs: list[bytes] = []

    def obj(body: str) -> int:
        objs.append(body.encode("latin-1"))
        return len(objs)

    page_refs: list[int] = []
    content_refs: list[int] = []
    for p in range(n_pages):
        lines: list[str] = ["BT /F1 12 Tf"]
        if p == 0:
            lines.append(
                f"/F1 18 Tf 1 0 0 1 72 720 Tm ({_pdf_escape(_sentence(rng, wlang, 4))}) Tj /F1 12 Tf"
            )
            y = 690
        else:
            lines.append("1 0 0 1 72 740 Tm () Tj")
            y = 740
        cols = ([72, 320] if two_col else [72])
        for cx in cols:
            ly = y
            n_lines = rng.randint(8, 18)
            block_break = rng.randint(3, 6)
            for k in range(n_lines):
                if k % block_break == 0 and k > 0:
                    ly -= 30  # paragraph gap
                else:
                    ly -= 14
                if k == 0 and rng.random() < 0.4:
                    lines.append(
                        f"/F1 14 Tf 1 0 0 1 {cx} {ly} Tm ({_pdf_escape(_sentence(rng, wlang, 3))}) Tj /F1 12 Tf"
                    )
                    continue
                lines.append(
                    f"1 0 0 1 {cx} {ly} Tm ({_pdf_escape(_sentence(rng, wlang, rng.randint(4, 9)))}) Tj"
                )
            y_after = ly
        if p % 3 == 1 and not two_col:
            ty = y_after - 40
            for r in range(3):
                for c, tx in enumerate((72, 220, 380)):
                    lines.append(
                        f"1 0 0 1 {tx} {ty - r * 14} Tm ({_pdf_escape(_sentence(rng, wlang, 1))}{r}{c}) Tj"
                    )
        lines.append("ET")
        stream = "\n".join(lines)
        if compress:
            import zlib

            comp = zlib.compress(stream.encode("latin-1")).decode("latin-1")
            cref = obj(
                f"<< /Length {len(comp)} /Filter /FlateDecode >>\n"
                f"stream\n{comp}\nendstream\n"
            )
        else:
            cref = obj(
                f"<< /Length {len(stream)} >>\nstream\n{stream}\nendstream\n"
            )
        content_refs.append(cref)
        page_refs.append(0)  # placeholder, filled after pages obj known

    pages_ref = len(objs) + n_pages + 1
    for p in range(n_pages):
        r = obj(
            f"<< /Type /Page /Parent {pages_ref} 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_refs[p]} 0 R >>\n"
        )
        page_refs[p] = r
    kids = " ".join(f"{r} 0 R" for r in page_refs)
    obj(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>\n")
    mark = "/MarkInfo << /Marked true >> " if tagged else ""
    cat = obj(f"<< /Type /Catalog /Pages {pages_ref} 0 R {mark}>>\n")

    out = [b"%PDF-1.4\n"]
    for n, body in enumerate(objs, start=1):
        out.append(f"{n} 0 obj\n".encode("latin-1"))
        out.append(body)
        out.append(b"endobj\n")
    out.append(f"trailer << /Root {cat} 0 R /Size {len(objs) + 1} >>\n".encode("latin-1"))
    out.append(b"%%EOF\n")
    return b"".join(out)


def _synth_docx(rng: random.Random, lang: str) -> bytes:
    """Minimal deterministic docx: fixed zip timestamps + stored
    (uncompressed) entries so bytes are a pure function of content."""
    import io
    import zipfile

    wlang = lang if lang in _WORDS else "en"
    title = _sentence(rng, wlang, rng.randint(3, 6))
    paras = [_paragraph(rng, wlang) for _ in range(rng.randint(2, 6))]
    body = [
        '<w:p><w:pPr><w:pStyle w:val="Title"/></w:pPr>'
        f"<w:r><w:t>{title}</w:t></w:r></w:p>"
    ]
    for k, p in enumerate(paras):
        if k == 1:
            body.append(
                '<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
                f"<w:r><w:t>{_sentence(rng, wlang, 3)}</w:t></w:r></w:p>"
            )
        body.append(f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>")
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w='
        '"http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{''.join(body)}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, content in (
            ("[Content_Types].xml", "<Types/>"),
            ("word/document.xml", doc),
        ):
            info = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            zf.writestr(info, content)
    return buf.getvalue()


def _synth_md(rng: random.Random, lang: str) -> bytes:
    wlang = lang if lang in _WORDS else "en"
    parts = [f"# {_sentence(rng, wlang, rng.randint(3, 5))}", ""]
    for _ in range(rng.randint(2, 5)):
        parts += [_paragraph(rng, wlang), ""]
    parts += [f"## {_sentence(rng, wlang, 2)}", ""]
    parts += [f"- {_sentence(rng, wlang, 4)}" for _ in range(rng.randint(2, 4))]
    return "\n".join(parts).encode("utf-8")


def _synth_csv(rng: random.Random, lang: str) -> bytes:
    wlang = lang if lang in _WORDS else "en"
    n_cols = rng.randint(3, 6)
    n_rows = rng.randint(4, 20)
    header = [
        _sentence(rng, wlang, 1).rstrip(".").lower() for _ in range(n_cols)
    ]
    lines = [",".join(header)]
    for _ in range(n_rows):
        lines.append(
            ",".join(
                str(rng.randint(0, 9999))
                if rng.random() < 0.4
                else _sentence(rng, wlang, 1).rstrip(".")
                for _ in range(n_cols)
            )
        )
    return "\n".join(lines).encode("utf-8")


def _synth_jats(rng: random.Random, lang: str) -> bytes:
    wlang = lang if lang in _WORDS else "en"
    secs = []
    for _ in range(rng.randint(1, 3)):
        secs.append(
            f"<sec><title>{_sentence(rng, wlang, 2).rstrip('.')}</title>"
            + "".join(
                f"<p>{_paragraph(rng, wlang)}</p>"
                for _ in range(rng.randint(1, 3))
            )
            + "</sec>"
        )
    return (
        '<?xml version="1.0"?><article><front><article-meta><title-group>'
        f"<article-title>{_sentence(rng, wlang, 4).rstrip('.')}</article-title>"
        "</title-group><abstract>"
        f"<p>{_paragraph(rng, wlang)}</p></abstract></article-meta></front>"
        f"<body>{''.join(secs)}</body></article>"
    ).encode("utf-8")


def _synth_uspto(rng: random.Random, lang: str) -> bytes:
    wlang = lang if lang in _WORDS else "en"
    claims = "".join(
        f"<claim><claim-text>{i + 1}. {_sentence(rng, wlang, 8)}</claim-text></claim>"
        for i in range(rng.randint(1, 4))
    )
    return (
        '<?xml version="1.0"?><us-patent-grant>'
        "<us-bibliographic-data-grant><invention-title>"
        f"{_sentence(rng, wlang, 3).rstrip('.')}</invention-title>"
        "</us-bibliographic-data-grant>"
        f"<abstract><p>{_paragraph(rng, wlang)}</p></abstract>"
        f"<description><p>{_paragraph(rng, wlang)}</p></description>"
        f"<claims>{claims}</claims></us-patent-grant>"
    ).encode("utf-8")


def _synth_docling_json(rng: random.Random, lang: str) -> bytes:
    """A DoclingDocument-shaped json payload (the engine's own E5
    channel round-trips through InputFormat.JSON_DOCLING)."""
    import json as _json

    wlang = lang if lang in _WORDS else "en"
    texts = [
        {"label": "title", "text": _sentence(rng, wlang, 3).rstrip("."),
         "level": 0, "prov": []}
    ] + [
        {"label": "text", "text": _paragraph(rng, wlang), "level": 0, "prov": []}
        for _ in range(rng.randint(1, 4))
    ]
    return _json.dumps(
        {
            "schema_name": "DoclingDocument",
            "version": "1.0.0",
            "name": "payload",
            "origin": {"mimetype": "application/json", "filename": "payload"},
            "num_pages": 1,
            "texts": texts,
            "tables": [],
            "pictures": [],
        },
        ensure_ascii=False, sort_keys=True, separators=(",", ":"),
    ).encode("utf-8")


def _synth_asciidoc(rng: random.Random, lang: str) -> bytes:
    wlang = lang if lang in _WORDS else "en"
    parts = [f"= {_sentence(rng, wlang, rng.randint(3, 5))}", ""]
    for _ in range(rng.randint(1, 3)):
        parts += [_paragraph(rng, wlang), ""]
    parts += [f"== {_sentence(rng, wlang, 2)}", ""]
    parts += [f"* {_sentence(rng, wlang, 4)}" for _ in range(rng.randint(2, 4))]
    return "\n".join(parts).encode("utf-8")


def _zip_stored(parts: list[tuple[str, str]]) -> bytes:
    """Deterministic zip: fixed timestamps, stored entries."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, content in parts:
            info = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            zf.writestr(info, content)
    return buf.getvalue()


def _synth_pptx(rng: random.Random, lang: str) -> bytes:
    wlang = lang if lang in _WORDS else "en"
    a = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
    p = 'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
    parts = [("ppt/presentation.xml", "<p:presentation/>")]
    for s in range(1, rng.randint(2, 5) + 1):
        title = _sentence(rng, wlang, rng.randint(2, 4))
        bullets = "".join(
            f"<a:p><a:r><a:t>{_sentence(rng, wlang, rng.randint(4, 8))}</a:t></a:r></a:p>"
            for _ in range(rng.randint(2, 4))
        )
        parts.append((
            f"ppt/slides/slide{s}.xml",
            f"<p:sld {p} {a}><p:cSld><p:spTree>"
            f"<p:sp><p:txBody><a:p><a:r><a:t>{title}</a:t></a:r></a:p></p:txBody></p:sp>"
            f"<p:sp><p:txBody>{bullets}</p:txBody></p:sp>"
            "</p:spTree></p:cSld></p:sld>",
        ))
    return _zip_stored(parts)


def _synth_xlsx(rng: random.Random, lang: str) -> bytes:
    wlang = lang if lang in _WORDS else "en"
    words = _WORDS[wlang]
    shared = [rng.choice(words) for _ in range(rng.randint(4, 8))]
    si = "".join(f"<si><t>{w}</t></si>" for w in shared)
    rows = []
    for r in range(1, rng.randint(3, 7) + 1):
        cells = []
        for ci, col in enumerate("ABC"):
            if ci == 0:
                idx = rng.randint(0, len(shared) - 1)
                cells.append(f'<c r="{col}{r}" t="s"><v>{idx}</v></c>')
            else:
                cells.append(f'<c r="{col}{r}"><v>{rng.randint(0, 999)}</v></c>')
        rows.append(f'<row r="{r}">{"".join(cells)}</row>')
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    return _zip_stored([
        ("xl/workbook.xml",
         f'<workbook {ns}><sheets><sheet name="Data" sheetId="1"/></sheets></workbook>'),
        ("xl/sharedStrings.xml", f"<sst {ns}>{si}</sst>"),
        ("xl/worksheets/sheet1.xml",
         f"<worksheet {ns}><sheetData>{''.join(rows)}</sheetData></worksheet>"),
    ])


def _synth_image(rng: random.Random) -> bytes:
    """PNG-magic blob with a deterministic pseudo-payload; the engine
    routes rasters to the OCR dispatch bucket without decoding."""
    n = rng.randint(64, 512)
    body = bytes((i * 73 + n) % 256 for i in range(n))
    return b"\x89PNG\r\n\x1a\n" + body


def gen_page(i: int, seed: int = 42) -> dict:
    """One corpus row — pure function of (seed, i). Mix: ~79% HTML,
    8% degenerate, 2% PDF, and ~11% across the other routable formats
    (docx/pptx/xlsx/md/asciidoc/image/csv/jats/uspto/json_docling) so
    the pipeline gate exercises every router branch."""
    rng = random.Random(f"{seed}:{i}")
    lang = _LANGS[rng.randint(0, len(_LANGS) - 1)]
    roll = rng.random()
    if roll < 0.02:
        html = _synth_pdf(rng, i, lang)
        kind = "pdf"
    elif roll < 0.10:
        html = _degenerate_html(rng, i, lang)
        kind = "degenerate"
    elif roll < 0.13:
        html = _synth_docx(rng, lang)
        kind = "docx"
    elif roll < 0.15:
        html = _synth_md(rng, lang)
        kind = "md"
    elif roll < 0.16:
        html = _synth_asciidoc(rng, lang)
        kind = "asciidoc"
    elif roll < 0.17:
        html = _synth_image(rng)
        kind = "image"
    elif roll < 0.18:
        html = _synth_pptx(rng, lang)
        kind = "pptx"
    elif roll < 0.19:
        html = _synth_xlsx(rng, lang)
        kind = "xlsx"
    elif roll < 0.195:
        html = _synth_csv(rng, lang)
        kind = "csv"
    elif roll < 0.20:
        html = _synth_jats(rng, lang)
        kind = "jats"
    elif roll < 0.205:
        html = _synth_uspto(rng, lang)
        kind = "uspto"
    elif roll < 0.21:
        html = _synth_docling_json(rng, lang)
        kind = "json_docling"
    else:
        html = _html_page(rng, i, lang)
        kind = "html"
    # crawler-provided noisy text: NOT the expected output
    noisy = _paragraph(rng, lang if lang in _WORDS else "en")
    ts = _EPOCH + _dt.timedelta(seconds=rng.randint(0, 365 * 24 * 3600))
    return {
        "url": f"https://site{i % 200}.example/{lang}/doc{i}",
        "warc_ts": ts,
        "html": html,
        "text": noisy if kind != "degenerate" else "",
        "lang": lang,
    }


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def build_pages_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: spark.range(n) -> mapInPandas(gen_page).
    No driver-side materialization — scales to any n."""
    import pandas as pd

    def gen_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [gen_page(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    base = spark.range(n, numPartitions=partitions or max(8, n // 2000 or 1))
    return base.mapInPandas(gen_batches, schema=PAGES_SCHEMA)


def write_pages_parquet(path: str, n: int, seed: int = 42) -> None:
    """Local (non-Spark) writer for small test fixtures."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [gen_page(i, seed) for i in range(n)]
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us", tz="UTC")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        ),
    )
    pq.write_table(table, path)
