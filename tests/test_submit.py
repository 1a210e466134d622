"""End-to-end proof of the cluster deployment path: build the
``--py-files`` zip, copy the job script OUTSIDE the repo, and run it
through real ``spark-submit`` — so the package must arrive on the
driver and executors via the archive, exactly as it would on a
multi-executor cluster (north rule: "run via spark-submit --py-files").
"""

import json
import os
import shutil
import subprocess
import sys

import duckdb
import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "jobs"))

from package import build_zip  # noqa: E402

SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_build_zip_is_deterministic_and_importable(tmp_path):
    z1 = build_zip(str(tmp_path / "a.zip"))
    z2 = build_zip(str(tmp_path / "b.zip"))
    with open(z1, "rb") as f1, open(z2, "rb") as f2:
        assert f1.read() == f2.read()
    # the archive root must be directly importable (probe the zip
    # itself — sys.modules may already hold the repo-backed package)
    import zipimport

    zi = zipimport.zipimporter(z1)
    assert zi.find_spec("docling_serve_spark") is not None
    assert (
        zi.get_data("docling_serve_spark/extract/core.py")
        == open(
            os.path.join(REPO, "docling_serve_spark", "extract", "core.py"), "rb"
        ).read()
    )


def test_spark_submit_py_files_end_to_end(tmp_path):
    """The full command from README run for real: job script isolated
    in a tmp dir (its repo-relative sys.path hack finds nothing there),
    package delivered only through --py-files, output read back with
    an independent engine (DuckDB)."""
    zip_path = build_zip(str(tmp_path / "docling_serve_spark.zip"))
    job = tmp_path / "extract_job.py"
    shutil.copy(os.path.join(REPO, "jobs", "extract.py"), job)
    out_dir = tmp_path / "warehouse"

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # nothing up our sleeve
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--driver-memory", "2g",
            "--py-files", zip_path,
            str(job),
            "--input", "synthetic:40",
            "--output", str(out_dir),
            "--chunks", "2",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])

    # single-node replay of the same deterministic corpus = the oracle
    # for what the cluster run must produce (failures — undecodable
    # degenerate rows — are part of the corpus design)
    from docling_serve_spark.extract.core import extract_document
    from docling_serve_spark.sources.pages import gen_page

    expected = {}
    for i in range(40):
        row = gen_page(i)
        res = extract_document(row["html"], name=row["url"], lang=row["lang"])
        expected[row["url"]] = (res.status, res.extracted_text)
    exp_ok = sum(1 for s, _ in expected.values() if s == "success")
    exp_fail = sum(1 for s, _ in expected.values() if s == "failure")

    assert summary["num_docs"] == 40
    assert summary["num_succeeded"] == exp_ok
    assert summary["num_failed"] == exp_fail
    assert summary["chunks_total"] == 2

    rows = duckdb.sql(
        f"SELECT url, status, extracted_text"
        f" FROM read_parquet('{out_dir}/data/**/*.parquet')"
    ).fetchall()
    assert len(rows) == 40
    for url, status, text in rows:
        assert (status, text) == expected[url], url


def test_webgraph_job_end_to_end(tmp_path, spark):
    """`jobs/webgraph.py` over a synthesized pages table: edges /
    ranks / farms / anchors parquet all land, the summary matches an
    independent DuckDB read of the outputs, and the mutually-linked
    pair flags as a farm."""
    # two hosts linking to each other (farm pair) + a one-way link to
    # a third; anchors vary
    def page(url, links):
        html = "".join(f'<a href="{u}">{t}</a>' for u, t in links)
        return (url, bytearray(html.encode()))

    rows = [
        page("http://a.com/1", [("https://b.com/x", "to b"),
                                ("https://c.com/y", "to c")]),
        page("http://b.com/1", [("https://a.com/z", "to a")]),
        page("http://c.com/1", []),
    ]
    inp = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(inp)
    out = str(tmp_path / "wg")

    env = dict(os.environ)
    env["SPARK_MASTER"] = "local[2]"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "webgraph.py"),
         "--input", inp, "--output", out],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_edges"] == 3          # a->b, a->c, b->a
    assert summary["n_hosts"] == 3
    assert summary["n_farm_hosts"] == 0     # out_degree: a=2, b=1 — gated
    assert summary["n_anchor_rows"] == 3
    farms = duckdb.sql(
        f"SELECT host, n_reciprocal FROM read_parquet('{out}/farms/*.parquet') "
        "ORDER BY host"
    ).fetchall()
    assert [(h, n) for h, n in farms] == [("a.com", 1), ("b.com", 1)]
    anchors = duckdb.sql(
        f"SELECT dst_host, anchor FROM read_parquet('{out}/anchors/*.parquet')"
    ).fetchall()
    assert ("b.com", "to b") in anchors and ("a.com", "to a") in anchors


def test_archive_job_end_to_end(tmp_path, spark):
    """`jobs/archive.py` over a tiny pages table: the CDX index is
    globally sorted by (urlkey, ts14) with digests matching an
    independent hash of the payload bytes, WET records parse back
    with byte-exact framing, and the summary counts agree."""
    import hashlib

    rows = [
        ("https://WWW.b.example/x?b=2&a=1", "2024-01-02 03:04:05",
         bytearray(b"<html><body><p>beta page body</p></body></html>"),
         "", "en"),
        ("https://a.example/y", "2024-02-03 04:05:06",
         bytearray(b"<html><body><p>alpha page body</p></body></html>"),
         "", "en"),
        ("https://a.example/broken", "2024-02-03 04:05:06",
         bytearray(b"\x00\x01\x02junk"), "", "en"),
    ]
    inp = str(tmp_path / "pages")
    spark.createDataFrame(
        rows,
        "url string, warc_ts string, html binary, text string, lang string",
    ).selectExpr(
        "url", "CAST(warc_ts AS TIMESTAMP) AS warc_ts", "html", "text", "lang"
    ).write.parquet(inp)
    out = str(tmp_path / "ar")

    env = dict(os.environ)
    env["SPARK_MASTER"] = "local[2]"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "archive.py"),
         "--input", inp, "--output", out, "--cdx-partitions", "1"],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_pages"] == 3 and summary["n_captures"] == 3
    assert summary["status_counts"]["success"] == 2
    assert summary["n_wet_records"] == 2
    assert summary["n_wat_records"] == 3   # metadata for every capture

    cdx = []
    cdx_dir = os.path.join(out, "cdx")
    for f in sorted(os.listdir(cdx_dir)):
        if f.startswith("part-"):
            cdx += open(os.path.join(cdx_dir, f)).read().splitlines()
    keys = [l.split(" ", 2)[0] for l in cdx]
    assert keys == sorted(keys) and len(keys) == 3
    assert keys[0].startswith("example,a)")            # SURT sorts a.example first
    assert "example,b)/x?a=1&b=2" in keys[-1]          # params sorted, www stripped
    rec = json.loads(cdx[-1].split(" ", 2)[2])
    assert rec["digest"] == hashlib.sha256(bytes(rows[0][2])).hexdigest()
    assert rec["length"] == len(rows[0][2])

    wet = ""
    wet_dir = os.path.join(out, "wet")
    for f in sorted(os.listdir(wet_dir)):
        if f.startswith("part-"):
            # newline="" — universal-newline mode would eat the
            # record framing's \r this assertion exists to pin
            wet += open(wet_dir + "/" + f, newline="").read()
    assert wet.count("WARC/1.0\r") == 2
    assert "WARC-Target-URI: https://a.example/y\r" in wet
    assert "alpha page body" in wet and "junk" not in wet


def test_archive_job_warc_input_real_capture_metadata(tmp_path, spark):
    """With raw WARC input the CDX index carries the REAL HTTP
    status/mime from the capture, not the pages-table literals."""
    from docling_serve_spark.sources.warc import write_warc

    warc = str(tmp_path / "in.warc.gz")
    write_warc(warc, [("https://a.example/x",
                       b"<html><body><p>warc page body</p></body></html>")])
    out = str(tmp_path / "arw")
    env = dict(os.environ)
    env["SPARK_MASTER"] = "local[2]"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "archive.py"),
         "--input", f"warc:{warc}", "--output", out,
         "--cdx-partitions", "1"],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_pages"] == 1 and summary["n_captures"] == 1
    cdx_dir = os.path.join(out, "cdx")
    line = "".join(
        open(os.path.join(cdx_dir, f)).read()
        for f in sorted(os.listdir(cdx_dir)) if f.startswith("part-")
    ).strip()
    rec = json.loads(line.split(" ", 2)[2])
    assert rec["status"] == 200 and rec["mime"] == "text/html"
    assert rec["length"] == len(
        b"<html><body><p>warc page body</p></body></html>"
    )


def test_hygiene_job_end_to_end(tmp_path, spark):
    """`jobs/hygiene.py`: dedup cascade + fuzzy decontam + drift
    reports all land; summary matches independent DuckDB reads."""
    base = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, base),
        (2, base),                                    # exact dup
        (3, base + " footer menu imprint subscribe"), # wrapper
        (4, " ".join(f"z{i}" for i in range(12))),    # unique
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .write.parquet(inp)
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(10, " ".join(f"w{i}" for i in range(5)))],
        "bench_id bigint, text string",
    ).write.parquet(bench)
    ref = str(tmp_path / "ref")
    spark.createDataFrame(
        [(1, "xx")], "doc_id bigint, text string"
    ).write.parquet(ref)
    out = str(tmp_path / "hyg")

    env = dict(os.environ)
    env["SPARK_MASTER"] = "local[2]"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "hygiene.py"),
         "--input", inp, "--output", out,
         "--benchmark", bench, "--reference", ref],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_docs"] == 4
    assert summary["n_exact_dups"] == 1
    assert summary["n_containment_dups"] == 1
    assert summary["n_kept"] == 2
    # docs 1-3 contain the 5-token bench prefix's 3-grams verbatim
    assert summary["n_contaminated"] == 3
    assert summary["tv_total_bp"] == 10000  # disjoint length bins
    stages = duckdb.sql(
        f"SELECT doc_id, stage FROM read_parquet('{out}/dedup/*.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    assert stages == [(1, "kept"), (2, "exact"),
                      (3, "containment"), (4, "kept")]


def test_crawl_job_end_to_end(tmp_path, spark):
    """`jobs/crawl.py`: diff -> robots -> pagerank -> frontier ->
    schedule over two tiny snapshots; blocked and unchanged-downweight
    behavior verified from the written schedule."""
    def page(url, html, text):
        return (url, bytearray(html.encode()), text)

    link = '<a href="https://b.com/x">b</a>'
    old_rows = [
        page("http://a.com/keep", link, "same body"),
        page("http://a.com/change", link, "old body"),
    ]
    new_rows = [
        page("http://a.com/keep", link, "same body"),       # unchanged
        page("http://a.com/change", link, "new body"),      # changed
        page("http://a.com/fresh", link, "fresh body"),     # added
        page("http://a.com/private/x", link, "secret"),     # robots-blocked
        page("http://b.com/x", "", "b page"),               # added
    ]
    prev = str(tmp_path / "prev")
    cur = str(tmp_path / "cur")
    spark.createDataFrame(old_rows, "url string, html binary, text string") \
        .write.parquet(prev)
    spark.createDataFrame(new_rows, "url string, html binary, text string") \
        .write.parquet(cur)
    robots = str(tmp_path / "robots")
    spark.createDataFrame(
        [("a.com", "disallow", "/private/*")],
        "host string, rule string, path_prefix string",
    ).write.parquet(robots)
    out = str(tmp_path / "plan")

    env = dict(os.environ)
    env["SPARK_MASTER"] = "local[2]"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "crawl.py"),
         "--prev", prev, "--pages", cur, "--output", out,
         "--robots", robots, "--n-fetchers", "4"],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_candidates"] == 5
    assert summary["n_allowed"] == 4
    assert summary["status_counts"] == {
        "unchanged": 1, "changed": 1, "added": 3}
    # blocked url never scheduled; all allowed ones are
    rows = duckdb.sql(
        f"SELECT url, host, fetcher, fetch_at_ms "
        f"FROM read_parquet('{out}/schedule/*.parquet') ORDER BY url"
    ).fetchall()
    urls = [r[0] for r in rows]
    assert "http://a.com/private/x" not in urls
    assert len(urls) == 4
    # same-host fetches are spaced, never simultaneous
    a_times = sorted(r[3] for r in rows if r[1] == "a.com")
    assert len(a_times) == len(set(a_times))


def test_bitext_job_end_to_end(tmp_path, spark):
    """`jobs/bitext.py`: URL-pattern candidates -> text join -> X63
    scoring; the numeral-twin pair survives, the numeral-mismatch
    pair is kept as a candidate but not plausible."""
    rows = [
        ("http://s.com/en/art-1", "Revenue grew 42 percent in 2023."),
        ("http://s.com/fr/art-1", "Le revenu a augmente de 42 pour cent en 2023."),
        ("http://s.com/en/art-2", "The 7 dwarfs met 9 times."),
        ("http://s.com/fr/art-2", "Les 3 mousquetaires en 1625."),
        ("http://s.com/en/lonely", "no twin here"),
        ("http://s.com/about", "no lang segment"),
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, text string").write.parquet(src)
    out = str(tmp_path / "bt")

    env = dict(os.environ)
    env["SPARK_MASTER"] = "local[2]"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "bitext.py"),
         "--input", src, "--output", out],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        open(os.path.join(out, "summary.json")).read()
    )
    assert summary["n_candidates"] == 2
    assert summary["n_plausible"] == 1
    assert summary["by_lang_pair"] == {"en-fr": 1}
    plaus = spark.read.parquet(os.path.join(out, "plausible")).collect()
    assert len(plaus) == 1 and plaus[0]["url_a"].endswith("/en/art-1")


def test_index_job_build_then_query_matches_inline(tmp_path, spark):
    """`jobs/index.py`: the prebuilt-index query answer must equal
    the inline bm25_topk over the same corpus (same arithmetic by
    delegation; this pins the parquet round-trip and CLI plumbing)."""
    from docling_serve_spark.operators.retrieval import bm25_topk

    rows = [(i, f"crawl quality {'crawl ' * (i % 4)}doc number {i}")
            for i in range(40)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .write.parquet(src)
    ix = str(tmp_path / "ix")

    env = dict(os.environ)
    env["SPARK_MASTER"] = "local[2]"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "index.py"), "build",
         "--input", src, "--output", ix, "--term-partitions", "4"],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats = json.loads(open(os.path.join(ix, "stats.json")).read())
    assert stats["n_docs"] == 40

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "index.py"), "query",
         "--index", ix, "--terms", "crawl", "quality", "-k", "5"],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    got = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("[")][-1]
    )
    expected = [
        {"rank": r["rank"], "doc_id": r["doc_id"],
         "score_micro": r["score_micro"],
         "n_terms_matched": r["n_terms_matched"]}
        for r in bm25_topk(
            spark.read.parquet(src), ["crawl", "quality"], k=5
        ).collect()
    ]
    assert got == expected

    # merge mode: re-extract docs 0-9 with a new token, delete 30-39;
    # a query on the MERGED index must equal inline bm25 over the
    # post-merge effective corpus
    delta = str(tmp_path / "delta")
    spark.createDataFrame(
        [(i, f"crawl quality fresh doc number {i}") for i in range(10)],
        "doc_id bigint, text string",
    ).write.parquet(delta)
    gone = str(tmp_path / "gone")
    spark.createDataFrame(
        [(i,) for i in range(30, 40)], "doc_id bigint"
    ).write.parquet(gone)
    ix2 = str(tmp_path / "ix2")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "index.py"), "merge",
         "--index", ix, "--delta", delta, "--deleted", gone,
         "--output", ix2, "--term-partitions", "4"],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats = json.loads(open(os.path.join(ix2, "stats.json")).read())
    assert stats["n_docs"] == 30

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "index.py"), "query",
         "--index", ix2, "--terms", "fresh", "crawl", "-k", "5"],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    got = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("[")][-1]
    )
    eff = spark.createDataFrame(
        [(i, f"crawl quality fresh doc number {i}") for i in range(10)]
        + [(i, f"crawl quality {'crawl ' * (i % 4)}doc number {i}")
           for i in range(10, 30)],
        "doc_id bigint, text string",
    )
    expected = [
        {"rank": r["rank"], "doc_id": r["doc_id"],
         "score_micro": r["score_micro"],
         "n_terms_matched": r["n_terms_matched"]}
        for r in bm25_topk(eff, ["fresh", "crawl"], k=5).collect()
    ]
    assert got == expected


def test_compliance_job_end_to_end(tmp_path, spark):
    """`jobs/compliance.py`: health + license + AI opt-out + token
    impact reports land; summary matches independent DuckDB reads.
    blocked.com carries 3 of 4 pages' tokens and blocks GPTBot."""
    def page(host, i, extra=""):
        return (
            f"https://{host}/p{i}",
            (f"<html><head><title>p{i}</title>{extra}</head>"
             f"<body><p>tok tok tok</p></body></html>").encode(),
            "tok tok tok",
        )

    rows = [
        page("blocked.com", 1), page("blocked.com", 2),
        page("blocked.com", 3),
        page("open.org", 1,
             '<link rel="license" '
             'href="https://creativecommons.org/licenses/by/4.0/">'),
    ]
    inp = str(tmp_path / "pages")
    spark.createDataFrame(
        rows, "url string, html binary, text string"
    ).write.parquet(inp)
    robots = str(tmp_path / "robots")
    spark.createDataFrame(
        [("blocked.com", "User-agent: GPTBot\nDisallow: /"),
         ("open.org", "User-agent: *\nAllow: /")],
        "host string, body string",
    ).write.parquet(robots)
    out = str(tmp_path / "comp")

    env = dict(os.environ)
    env["SPARK_MASTER"] = "local[2]"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "compliance.py"),
         "--pages", inp, "--robots", robots, "--output", out],
        capture_output=True, text=True, timeout=280, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_hosts"] == 2
    assert summary["n_hosts_open_license"] == 1
    assert summary["token_weighted"] is True
    # gptbot loses blocked.com: 9 of 12 tokens -> 7500 bp
    assert summary["max_optout_share_bp"] == 7500
    assert summary["agents_with_optouts"] == 1
    imp = duckdb.sql(
        f"SELECT agent, n_hosts_blocked, token_share_bp FROM "
        f"read_parquet('{out}/optout_impact/*.parquet') "
        "WHERE agent = 'gptbot'"
    ).fetchall()
    assert imp == [("gptbot", 1, 7500)]
