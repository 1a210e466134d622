"""WARC source (Common-Crawl ingestion): record parsing, gzip member
concatenation, HTTP header stripping, and the Spark reader."""

import gzip

import pytest

from docling_serve_spark.sources.warc import (
    parse_warc_bytes,
    write_warc,
)


def _records():
    return [
        ("https://a.example/x", b"<html><body><main><p>page a body text here</p></main></body></html>"),
        ("https://b.example/y", b"<html><body><main><p>page b body text here</p></main></body></html>"),
    ]


def test_parse_gzipped_members(tmp_path):
    p = str(tmp_path / "f.warc.gz")
    write_warc(p, _records(), gzip_members=True)
    rows = list(parse_warc_bytes(open(p, "rb").read()))
    assert [r["url"] for r in rows] == ["https://a.example/x", "https://b.example/y"]
    # http headers stripped: payload starts with the html
    assert rows[0]["html"].startswith(b"<html>")
    assert rows[0]["warc_ts"] is not None


def test_parse_plain_warc(tmp_path):
    p = str(tmp_path / "f.warc")
    write_warc(p, _records(), gzip_members=False)
    rows = list(parse_warc_bytes(open(p, "rb").read()))
    assert len(rows) == 2


def test_non_response_records_skipped():
    rec = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://c.example/z\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 10\r\n\r\n"
        b"0123456789\r\n\r\n"
    )
    rows = list(parse_warc_bytes(rec))
    assert len(rows) == 1
    assert rows[0]["url"] == "https://c.example/z"
    assert rows[0]["html"] == b"0123456789"  # no HTTP block -> raw payload


def test_truncated_and_garbage_inputs():
    assert list(parse_warc_bytes(b"")) == []
    assert list(parse_warc_bytes(b"not a warc at all")) == []
    assert list(parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response")) == []
    # corrupt gzip header falls through to raw scan, finds nothing
    assert list(parse_warc_bytes(gzip.compress(b"junk")[:8])) == []


def test_warc_through_spark_extraction(spark, tmp_path):
    p = str(tmp_path / "crawl.warc.gz")
    write_warc(p, _records())
    from docling_serve_spark.operators.extract_stage import run_extraction
    from docling_serve_spark.sources.catalog import read_pages

    pages = read_pages(spark, f"warc:{p}")
    rows = {r.url: r for r in run_extraction(pages).collect()}
    assert set(rows) == {"https://a.example/x", "https://b.example/y"}
    assert all(r.status == "success" for r in rows.values())
    assert "page a body text here" in rows["https://a.example/x"].extracted_text


def test_oversized_record_cannot_forge_embedded_warc(monkeypatch):
    """A payload larger than _MAX_RECORD is truncated for copying, but
    the scanner must advance past the FULL declared length — otherwise
    a body containing literal 'WARC/1.0' text (pages about the WARC
    format exist in crawls) is parsed as a forged record."""
    import docling_serve_spark.sources.warc as warc_mod

    monkeypatch.setattr(warc_mod, "_MAX_RECORD", 16)
    forged = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://evil.example/forged\r\n"
        b"Content-Length: 4\r\n\r\nhack"
    )
    body = b"x" * 20 + forged  # forged text sits past the copy cap
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://real.example/page\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body + b"\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://real.example/next\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    )
    rows = list(parse_warc_bytes(rec))
    urls = [r["url"] for r in rows]
    assert "https://evil.example/forged" not in urls
    assert urls == ["https://real.example/page", "https://real.example/next"]
    assert rows[0]["html"] == b"x" * 16  # capped copy


def test_truncated_final_gzip_member_keeps_leading_members(tmp_path):
    """Member-by-member decompression: a truncated final member (an
    interrupted transfer) must not discard the intact leading members."""
    p = str(tmp_path / "f.warc.gz")
    write_warc(p, _records(), gzip_members=True)
    data = open(p, "rb").read()
    rows = list(parse_warc_bytes(data[:-80]))  # chop into 2nd member's data
    assert [r["url"] for r in rows] == ["https://a.example/x"]


def test_wet_records_roundtrip_through_warc_reader(spark):
    """The WET writer's output must parse back through this module's
    own WARC record scanner: same framing, byte-exact payload, and
    Content-Length in octets (multi-byte text)."""
    from docling_serve_spark.sources.warc import _parse_warc_stream, wet_records

    rows = [("u1", "2024-01-02 03:04:05", "plain ascii text"),
            ("u2", "2024-01-02 03:04:05", "arabic محرك mixed")]
    df = spark.createDataFrame(rows, "url string, ts string, t string").selectExpr(
        "url", "CAST(ts AS TIMESTAMP) AS warc_ts", "t AS extracted_text"
    )
    recs = {r["url"]: r["wet_record"]
            for r in wet_records(df).collect()}
    blob = "".join(recs[u] for u in ("u1", "u2")).encode("utf-8")
    # the reader yields only http response records; WET conversion
    # records carry no http block, so scan framing manually
    text = blob.decode("utf-8")
    assert text.count("WARC/1.0\r\n") == 2
    for u, _, t in rows:
        payload = t
        n = len(payload.encode("utf-8"))
        assert f"Content-Length: {n}\r\n\r\n{payload}\r\n\r\n" in text
        assert f"WARC-Target-URI: {u}\r\n" in text
    assert "WARC-Date: 2024-01-02T03:04:05Z" in text
    assert _parse_warc_stream  # reader stays importable beside writer


def test_read_warc_captures_http_status_and_mime(tmp_path, spark):
    """The captures reader keeps the HTTP status line and the BARE
    Content-Type media type (charset params dropped); a header-less
    payload reports status 0 / empty mime."""
    def rec(url, http_body):
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + f"Content-Length: {len(http_body)}\r\n\r\n".encode()
            + http_body + b"\r\n\r\n"
        )

    ok = (b"HTTP/1.1 200 OK\r\n"
          b"Content-Type: text/html; charset=UTF-8\r\n\r\n<html>a</html>")
    nf = (b"HTTP/1.1 404 Not Found\r\n"
          b"Content-Type: application/pdf\r\n\r\n%PDF-gone")
    raw = b"<html>no http block</html>"
    p = str(tmp_path / "caps.warc")
    with open(p, "wb") as f:
        f.write(rec("https://e.com/ok", ok) + rec("https://e.com/nf", nf)
                + rec("https://e.com/raw", raw))

    from docling_serve_spark.sources.warc import read_warc_captures

    got = {r["url"]: r for r in read_warc_captures(spark, p).collect()}
    assert got["https://e.com/ok"]["http_status"] == 200
    assert got["https://e.com/ok"]["mime"] == "text/html"
    assert bytes(got["https://e.com/ok"]["html"]) == b"<html>a</html>"
    assert got["https://e.com/nf"]["http_status"] == 404
    assert got["https://e.com/nf"]["mime"] == "application/pdf"
    assert got["https://e.com/raw"]["http_status"] == 0
    assert got["https://e.com/raw"]["mime"] == ""
    # composes with cdx_index: real capture metadata flows through
    from docling_serve_spark.operators.urltools import cdx_index
    idx = {r["url"]: r for r in cdx_index(
        read_warc_captures(spark, p),
        mime_col="mime", status_col="http_status",
    ).collect()}
    assert idx["https://e.com/nf"]["status"] == 404
    assert idx["https://e.com/nf"]["mime"] == "application/pdf"


def test_wat_records_json_escaping_and_framing(spark):
    """The hand-built JSON payload must parse with a real JSON
    parser even when the title carries quotes and backslashes, and
    Content-Length must equal the payload's UTF-8 octets."""
    import hashlib
    import json as _json
    from docling_serve_spark.sources.warc import wat_records

    html = ('<html><head><title> A "quoted" \\ title </title></head>'
            '<body><a href="https://x.example/a">x</a>'
            '<a href="/rel">skip</a>arabic محرك</body></html>').encode()
    df = spark.createDataFrame(
        [("https://e.com/p", "2024-01-02 03:04:05", bytearray(html))],
        "url string, ts string, html binary",
    ).selectExpr("url", "CAST(ts AS TIMESTAMP) AS warc_ts", "html")
    rec = wat_records(df).collect()[0]["wat_record"]
    head, _, rest = rec.partition("\r\n\r\n")
    payload = rest[: rest.index("\r\n\r\n")]
    meta = _json.loads(payload)
    assert meta["title"] == 'A "quoted" \\ title'
    assert meta["n_links"] == 1            # relative href not counted
    assert meta["digest"] == hashlib.sha256(html).hexdigest()
    assert f"Content-Length: {len(payload.encode('utf-8'))}" in head
    assert "WARC-Type: metadata" in head
    assert "Content-Type: application/json" in head


def test_wat_title_control_chars_stay_valid_json(spark):
    """A crawl title carrying a C0 control char must still produce a
    parseable JSON payload."""
    import json as _json
    from docling_serve_spark.sources.warc import wat_records

    html = b"<html><head><title>bad\x07title\x00here</title></head></html>"
    df = spark.createDataFrame(
        [("https://e.com/p", "2024-01-02 03:04:05", bytearray(html))],
        "url string, ts string, html binary",
    ).selectExpr("url", "CAST(ts AS TIMESTAMP) AS warc_ts", "html")
    rec = wat_records(df).collect()[0]["wat_record"]
    payload = rec.split("\r\n\r\n")[1]
    assert _json.loads(payload)["title"] == "badtitlehere"
