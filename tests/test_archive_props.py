"""Property tests for the archive-interop primitives (X54/X56/X68):
each example batches several hypothesis-generated inputs into ONE
Spark job and compares against an independent pure-Python reference,
so the properties cover the actual Column expressions, not a
re-derivation of them."""

import json
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# url-ish alphabet: no whitespace/control (not in the URL domain)
_URL_CHARS = st.sampled_from(
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJ0123456789.-_~%&=?#/:")
)
_URL_TAIL = st.text(alphabet=_URL_CHARS, min_size=0, max_size=40)


def _surt_py(u: str) -> str:
    """Independent reference of the SURT docstring contract."""
    u = u.lower()
    u = re.sub(r"^https?://", "", u)
    u = re.sub(r"#.*$", "", u)
    m = re.match(r"^([^/?]*)", u)
    host = m.group(1)
    host = re.sub(r"^www\.", "", host)
    pm = re.search(r":(\d+)$", host)
    port = ""
    if pm:
        port = ":" + pm.group(1)
        host = host[: pm.start()]
        if port in (":80", ":443"):
            port = ""
    rest = u[len(m.group(1)):]
    qpos = rest.find("?")
    path = rest if qpos == -1 else rest[:qpos]
    if path == "":
        path = "/"
    query = "" if qpos == -1 else rest[qpos + 1:]
    qs = "&".join(sorted(query.split("&"))) if query else ""
    rev = ",".join(reversed(host.split(".")))
    return rev + port + ")" + path + ("?" + qs if query else "")


@settings(max_examples=12, deadline=None)
@given(st.lists(_URL_TAIL, min_size=1, max_size=8))
def test_surt_key_matches_python_reference(spark, tails):
    from docling_serve_spark.operators.urltools import surt_key

    urls = ["https://WWW.Site.Example.com" + t for t in tails]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(surt_key(F.col("url"))).collect()]
    assert got == [_surt_py(u) for u in urls]


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=300), min_size=1, max_size=6
    )
)
def test_chunk_documents_exact_coverage(spark, sizes):
    """Chunks reassemble to the original token stream: chunk 0 plus
    each later chunk's post-overlap suffix == all tokens; every chunk
    is ≤ chunk_tokens; the final chunk always contributes new
    tokens."""
    from docling_serve_spark.operators.sampling import chunk_documents

    chunk, overlap = 16, 4
    stride = chunk - overlap
    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n)))
        for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    for i, n in enumerate(sizes):
        toks = [f"t{i}x{j}" for j in range(n)]
        chunks = by_doc.get(i, {})
        if n == 0:
            assert chunks == {}
            continue
        assert sorted(chunks) == list(range(len(chunks)))
        rebuilt = []
        for k in sorted(chunks):
            words = chunks[k]["chunk_text"].split()
            assert len(words) <= chunk
            assert words == toks[k * stride : k * stride + chunk]
            rebuilt.extend(words if k == 0 else words[overlap:] if k * stride + overlap <= len(rebuilt) else words[len(rebuilt) - k * stride:])
        assert rebuilt == toks
        # final window adds new tokens: its end is exactly n
        last = max(chunks)
        assert last * stride + len(chunks[last]["chunk_text"].split()) == n


@settings(max_examples=12, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=6))
def test_wet_records_length_based_parse(spark, texts):
    """A length-driven WET parse (what real consumers do) recovers
    every payload byte-exactly, for arbitrary unicode text including
    embedded newlines and 'WARC/1.0' look-alikes."""
    from docling_serve_spark.sources.warc import wet_records

    rows = [
        (f"https://e.com/p{i}", "2024-01-02 03:04:05", t)
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "url string, ts string, extracted_text string"
    ).selectExpr(
        "url", "CAST(ts AS TIMESTAMP) AS warc_ts", "extracted_text"
    )
    recs = {r["url"]: r["wet_record"] for r in wet_records(df).collect()}
    for url, _, t in rows:
        raw = recs[url].encode("utf-8")
        head, _, rest = raw.partition(b"\r\n\r\n")
        m = re.search(rb"Content-Length: (\d+)", head)
        n = int(m.group(1))
        assert rest[:n].decode("utf-8") == t
        assert rest[n:] == b"\r\n\r\n"


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"),
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_wat_payload_json_roundtrip(spark, titles):
    """For arbitrary (non-control) unicode titles — quotes,
    backslashes, CJK, emoji — the hand-built WAT payload parses under
    a strict JSON parser and round-trips the whitespace-folded
    title."""
    from docling_serve_spark.sources.warc import wat_records

    rows = [
        (f"https://e.com/p{i}", "2024-01-02 03:04:05",
         f"<html><head><title>{'' if t is None else t}</title></head>"
         f"</html>".encode("utf-8", "surrogatepass"))
        for i, t in enumerate(titles)
        if "<" not in t and ">" not in t
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        [(u, ts, bytearray(h)) for u, ts, h in rows],
        "url string, ts string, html binary",
    ).selectExpr("url", "CAST(ts AS TIMESTAMP) AS warc_ts", "html")
    got = {r["url"]: r["wat_record"] for r in wat_records(df).collect()}
    for i, ((url, _, _), t) in enumerate(
        zip(rows, [t for t in titles if "<" not in t and ">" not in t])
    ):
        payload = got[url].split("\r\n\r\n")[1]
        meta = json.loads(payload)
        # Java \s is ASCII-only (NBSP et al. are TEXT there, not
        # whitespace) and Spark trim strips only ' '
        folded = re.sub(r"[ \t\n\x0b\f\r]+", " ", t).strip(" ")
        assert meta["title"] == folded


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=0, max_value=120),
    st.integers(min_value=0, max_value=99999),
)
def test_crawl_delay_decimal_parse_exact(spark, secs, frac):
    """Decimal crawl-delays parse to exact milliseconds (truncated to
    ms precision, capped at 60 s) — checked against Python decimal
    arithmetic. One Spark job per example over a single row."""
    from docling_serve_spark.operators.urltools import robots_crawl_delays

    val = f"{secs}.{frac}" if frac else str(secs)
    body = f"User-agent: *\nCrawl-delay: {val}\n"
    df = spark.createDataFrame(
        [("h.com", body)], "host string, robots_txt string"
    )
    got = robots_crawl_delays(df).collect()[0]["delay_ms"]
    fs = str(frac) if frac else ""
    want_ms = secs * 1000 + int((fs + "000")[:3] if fs else 0)
    assert got == min(want_ms, 60000)
