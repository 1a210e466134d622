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
