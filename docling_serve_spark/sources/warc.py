"""WARC source: ingest Common-Crawl-style WARC files into the pages
table shape ``(url, warc_ts, html, text, lang)``.

The reference ingests per-request uploads (S1/S3,
reference:datamodel/requests.py:16-50); a crawl-scale batch engine
ingests the crawl's native container instead. WARC/1.0 is the ISO
28500 public format: concatenated records, each
``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<Content-Length bytes>\\r\\n\\r\\n``;
Common Crawl stores one gzip member per record (a "gzipped WARC"),
which stdlib gzip reads as a concatenated stream.

Scale shape: WARC files are the unit of parallelism (exactly how
production Common-Crawl jobs shard — one ~1 GB file per task), read
via Spark's ``binaryFile`` source and parsed per-file inside
``mapInPandas``. Only ``response`` records with an http payload
become rows; the HTTP header block is stripped so ``html`` is the
body bytes the extractor expects.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_MAX_RECORD = 64 * 1024 * 1024  # cap a single record's payload


def _parse_warc_stream(buf: bytes) -> Iterator[dict]:
    """Yield response records from raw (already-inflated) WARC bytes."""
    view = memoryview(buf)
    pos = 0
    n = len(buf)
    while pos < n:
        # find record start
        start = buf.find(b"WARC/", pos)
        if start == -1:
            return
        head_end = buf.find(b"\r\n\r\n", start)
        if head_end == -1:
            return
        header_block = bytes(view[start:head_end]).decode(
            "latin-1", errors="replace"
        )
        headers: dict[str, str] = {}
        for line in header_block.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + 4
        body_end = min(body_start + min(length, _MAX_RECORD), n)
        # advance past the FULL declared length (copy only the capped
        # prefix): resuming inside an oversized payload would let a body
        # containing literal 'WARC/1.0' text be parsed as a forged record
        pos = min(body_start + length, n)
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = _dt.datetime.strptime(
                ts_raw, "%Y-%m-%dT%H:%M:%SZ"
            ).replace(tzinfo=_dt.timezone.utc)
        except ValueError:
            ts = None
        payload = bytes(view[body_start:body_end])
        # strip the HTTP response header block if present, keeping the
        # status line and Content-Type for the CDX capture index (the
        # two HTTP-level fields CDX records carry)
        status = 0
        mime = ""
        if payload.startswith(b"HTTP/"):
            he = payload.find(b"\r\n\r\n")
            if he != -1:
                http_head = payload[:he].decode("latin-1", errors="replace")
                http_lines = http_head.split("\r\n")
                parts = http_lines[0].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for hl in http_lines[1:]:
                    if hl.lower().startswith("content-type:"):
                        # drop parameters (charset=...) — CDX keeps
                        # the bare media type
                        mime = hl.split(":", 1)[1].split(";")[0].strip()
                        break
                payload = payload[he + 4 :]
        if url and payload:
            yield {
                "url": url,
                "warc_ts": ts,
                "html": payload,
                "text": "",
                "lang": "",
                "http_status": status,
                "mime": mime,
            }


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Inflate-if-gzipped, then parse records. Gzipped WARCs are
    concatenated members; ``gzip.GzipFile`` reads them all."""
    if data[:2] == b"\x1f\x8b":
        # decompress member-by-member so a truncated/corrupt trailing
        # member (interrupted transfer) still yields the records of the
        # intact leading members — gzip.GzipFile.read() is all-or-nothing
        out = []
        rest = data
        while rest[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            try:
                out.append(d.decompress(rest))
                out.append(d.flush())
            except zlib.error:
                break
            if not d.eof:  # truncated final member
                break
            rest = d.unused_data
        data = b"".join(out)
    yield from _parse_warc_stream(data)


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files -> pages DataFrame. One file per task (binaryFile
    rows are whole files — the natural Common-Crawl shard); record
    parsing happens executor-side in an Arrow-batched stage."""

    def parse(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(content)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    files = (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("content")
    )
    return files.mapInPandas(parse, schema=PAGES_SCHEMA)


CAPTURES_SCHEMA = (
    "url string, warc_ts timestamp, http_status int, mime string, "
    "html binary"
)


def read_warc_captures(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files -> captures DataFrame with the HTTP-level fields
    CDX records carry (status line + bare Content-Type media type),
    which the pages contract drops. Feed this to
    ``operators.urltools.cdx_index(status_col=..., mime_col=...)`` to
    index a crawl with real capture metadata. Same one-file-per-task
    scan shape as ``read_warc``."""

    def parse(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(content)))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "http_status", "mime", "html"],
            )

    files = (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("content")
    )
    return files.mapInPandas(parse, schema=CAPTURES_SCHEMA)


def write_warc(path: str, records: list[tuple[str, bytes]],
               gzip_members: bool = True) -> None:
    """Test/fixture writer: (url, body) pairs -> a WARC file with one
    gzip member per record (the Common Crawl layout)."""
    out = io.BytesIO()
    for url, body in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
            + http
            + b"\r\n\r\n"
        )
        out.write(gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def wet_records(results: DataFrame, url_col: str = "url",
                ts_col: str = "warc_ts",
                text_col: str = "extracted_text") -> DataFrame:
    """(url, wet_record) — serialize extracted text as WET-style
    ``conversion`` records (ISO 28500 WARC/1.0; the WET sidecar format
    Common Crawl publishes its own extracted text in), so downstream
    tooling built for CC WET files consumes this engine's output
    directly. The inverse of this module's reader: read WARC →
    extract → write WET closes the crawl interop loop.

    Header set matches CC WET conversion records: WARC-Type,
    WARC-Target-URI, WARC-Date (UTC ISO-8601 from the crawl
    timestamp — deterministic, never wall-clock), Content-Type, and
    Content-Length in BYTES of the UTF-8 payload (octet_length, not
    chars — multi-byte text would corrupt record framing otherwise).

    Pure codegen concat — a narrow map with zero shuffles; writing is
    `df.select("wet_record").write.text(...)`, one file per partition,
    the same file-level parallelism the reader shards by."""
    payload = F.encode(F.col(text_col), "UTF-8")
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nWARC-Date: "),
        F.date_format(
            F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ),
        F.lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
        F.col(text_col),
        F.lit("\r\n\r\n"),
    )
    return results.select(F.col(url_col).alias("url"),
                          rec.alias("wet_record"))


def _json_escape(col):
    """Minimal JSON string escaping with identical regexp semantics
    on both engines: backslash first, then the double quote. (Crawl
    titles are whitespace-collapsed upstream, so the control-char
    escapes JSON also demands cannot occur here by construction.)"""
    return F.regexp_replace(
        F.regexp_replace(col, r"\\", r"\\\\"), '"', r'\\"'
    )


def wat_records(pages: DataFrame, url_col: str = "url",
                ts_col: str = "warc_ts",
                html_col: str = "html") -> DataFrame:
    """(url, wat_record) — WAT-style metadata records, completing the
    Common-Crawl sidecar triple this module now covers end to end:
    WARC (read), WET (extracted text, ``wet_records``), WAT (capture
    metadata, this). Each record is an ISO 28500 ``metadata`` record
    whose JSON payload carries the fields CC's WAT files lead with —
    the page title and the outgoing-link count — plus the payload
    digest that keys revisit dedup (X58).

    The JSON is built by CONCAT with a fixed key order and minimal
    escaping, not an engine JSON serializer, so the bytes are
    engine-independent (the oracle pins them); Content-Length is
    UTF-8 octets of the payload, exactly as in ``wet_records``.
    Title/link extraction is the same codegen'd regexp family as
    ``operators.pagemeta`` — the whole record is a zero-shuffle
    narrow map over the page scan."""
    h = F.col(html_col).cast("string")
    # strip C0 controls BEFORE the whitespace fold: raw crawl titles
    # can carry them, and a bare control char inside a JSON string is
    # invalid JSON (the escaping below only covers \ and ")
    title = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_extract(h, "(?is)<title[^>]*>([^<]*)</title>", 1),
                r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "",
            ),
            r"\s+", " ",
        )
    )
    n_links = F.size(
        F.regexp_extract_all(h, F.lit('(?i)href="https?://'), F.lit(0))
    ).cast("bigint")
    payload = F.concat(
        F.lit('{"url":"'), _json_escape(F.col(url_col)),
        F.lit('","title":"'), _json_escape(title),
        F.lit('","n_links":'), n_links.cast("string"),
        F.lit(',"digest":"'), F.sha2(F.col(html_col), 256),
        F.lit('"}'),
    )
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nWARC-Date: "),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit("\r\nContent-Type: application/json\r\nContent-Length: "),
        F.octet_length(F.encode(payload, "UTF-8")).cast("string"),
        F.lit("\r\n\r\n"),
        payload,
        F.lit("\r\n\r\n"),
    )
    return pages.select(F.col(url_col).alias("url"),
                        rec.alias("wat_record"))
