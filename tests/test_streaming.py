"""Streaming ingestion: the batch extraction plan under readStream
must produce byte-identical results, resume from its checkpoint, and
bound state with a watermark."""

import os

from pyspark.sql import functions as F

from docling_serve_spark.operators.extract_stage import run_extraction
from docling_serve_spark.sources.pages import build_pages_df
from docling_serve_spark.streaming import (
    extract_stream,
    stream_pages,
    windowed_status_counts,
)
from docling_serve_spark.streaming.ingest import run_to_parquet


def _await(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_extraction_matches_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = build_pages_df(spark, 120)
    pages.write.parquet(landing)

    q = run_to_parquet(extract_stream(stream_pages(spark, landing)), out, ckpt)
    _await(q)

    got = {
        r.url: (r.status, r.extracted_text)
        for r in spark.read.parquet(out)
        .select("url", "status", "extracted_text").collect()
    }
    want = {
        r.url: (r.status, r.extracted_text)
        for r in run_extraction(spark.read.parquet(landing))
        .select("url", "status", "extracted_text").collect()
    }
    assert got == want


def test_stream_checkpoint_no_reprocess_and_incremental(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    build_pages_df(spark, 60).write.parquet(landing)

    q = run_to_parquet(extract_stream(stream_pages(spark, landing)), out, ckpt)
    _await(q)
    n1 = spark.read.parquet(out).count()
    assert n1 == 60

    # restart with no new files: checkpoint means zero recomputation
    q = run_to_parquet(extract_stream(stream_pages(spark, landing)), out, ckpt)
    _await(q)
    assert spark.read.parquet(out).count() == 60

    # land a new batch of files; only the delta is processed
    build_pages_df(spark, 100).filter(F.col("url").isNotNull()).limit(40).write.mode(
        "append"
    ).parquet(landing)
    q = run_to_parquet(extract_stream(stream_pages(spark, landing)), out, ckpt)
    _await(q)
    assert spark.read.parquet(out).count() == 100


def test_windowed_status_counts_with_watermark(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # spread warc_ts across two hourly windows
    pages = build_pages_df(spark, 80).withColumn(
        "warc_ts",
        F.when(F.xxhash64("url") % 2 == 0,
               F.lit("2024-01-01 00:10:00")).otherwise(
               F.lit("2024-01-01 01:10:00")).cast("timestamp"),
    )
    pages.write.parquet(landing)

    def drain():
        res = extract_stream(stream_pages(spark, landing))
        q = run_to_parquet(windowed_status_counts(res), out, ckpt)
        _await(q)

    # phase 1: watermark (max event time - 2h) has not passed either
    # hourly window -> append mode emits nothing yet
    drain()
    assert not [
        f for f in os.listdir(out)
        if f.endswith(".parquet") and os.path.getsize(os.path.join(out, f))
    ] or spark.read.parquet(out).count() == 0

    # phase 2: a much later crawl file advances the watermark past both
    # old windows; the restarted (checkpointed) stream finalizes them
    late = build_pages_df(spark, 5).withColumn(
        "warc_ts", F.lit("2024-01-01 10:00:00").cast("timestamp")
    )
    late.write.mode("append").parquet(landing)
    drain()

    rows = spark.read.parquet(out).collect()
    assert {str(r.window_start) for r in rows} == {
        "2024-01-01 00:00:00", "2024-01-01 01:00:00",
    }
    assert sum(r.num_docs for r in rows) == 80
    assert all(r.bytes_processed > 0 for r in rows)


def test_streaming_plan_is_arrow_batched(spark, tmp_path):
    landing = str(tmp_path / "landing")
    build_pages_df(spark, 10).write.parquet(landing)
    df = extract_stream(stream_pages(spark, landing))
    assert df.isStreaming
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan


def test_dedup_stream_across_microbatches(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): a url seen
    in an earlier micro-batch is suppressed in later ones; within a
    batch the earliest warc_ts row wins."""
    from docling_serve_spark.streaming.ingest import dedup_stream

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # state-store instances bind to shuffle partitions at checkpoint
    # creation; 4 is plenty for 100 urls and keeps the per-batch
    # python-worker fan-out small
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        first = build_pages_df(spark, 50)
        first.write.parquet(landing)
        q = run_to_parquet(
            dedup_stream(stream_pages(spark, landing)), out, ckpt
        )
        _await(q)
        assert spark.read.parquet(out).count() == 50

        # second batch: recrawls of all 50 earlier urls (later ts) +
        # the 50 genuinely-new urls of the 100-page corpus
        hundred = build_pages_df(spark, 100)
        first_urls = first.select("url")
        recrawl = hundred.join(first_urls, "url").withColumn(
            "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 DAYS")
        ).select("url", "warc_ts", "html", "text", "lang")
        new = hundred.join(first_urls, "url", "left_anti")
        n_new = new.count()
        assert n_new == 50
        recrawl.unionByName(new).write.mode("append").parquet(landing)

        q = run_to_parquet(
            dedup_stream(stream_pages(spark, landing)), out, ckpt
        )
        _await(q)
        res = spark.read.parquet(out)
        assert res.count() == 100  # 50 + only the 50 new urls
        assert res.select("url").distinct().count() == 100

        # stream == batch-twin identity: the stateful first-wins op
        # must pick exactly the rows a batch min(struct(ts, ...))
        # over the full landing data picks (q_first_seen_dedup shape)
        batch = (
            spark.read.parquet(landing)
            .groupBy("url")
            .agg(F.min(F.struct("warc_ts", "text")).alias("f"))
            .select("url", F.col("f.warc_ts").alias("warc_ts"))
        )
        stream_map = {r["url"]: r["warc_ts"] for r in res.select("url", "warc_ts").collect()}
        batch_map = {r["url"]: r["warc_ts"] for r in batch.collect()}
        assert stream_map == batch_map
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_mixture_gates_stream_equals_batch(spark, tmp_path):
    """The per-document mixture gates (filter chain's inputs, PII
    scrub, domain-mix keep) are stateless pure functions of the row,
    so the same column expressions run unchanged under readStream and
    must agree with batch row for row. (The cross-doc gates — dedup
    winners, packing — are batch/periodic by design.)"""
    from docling_serve_spark.operators import pii, sampling, textstats

    landing = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        (i, f"dear user{i}@mail.test " + " ".join(f"w{i}x{j}" for j in range(i % 25)),
         f"host{i % 3}.example.com")
        for i in range(80)
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string, host string")
    batch.write.parquet(landing)
    rates = spark.createDataFrame(
        [("host0.example.com", 1000000), ("host1.example.com", 400000)],
        "host string, keep_ppm long",
    )

    def gates(df):
        n_email, n_phone, n_ip = pii.pii_counts(F.col("text"))
        return sampling.domain_mix_sample(df, rates).join(
            df.select(
                "doc_id",
                textstats.token_count(F.col("text")).alias("n_tokens"),
                n_email.alias("n_emails"),
            ),
            "doc_id",
        )

    stream_in = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = (
        gates(stream_in)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive

    got = sorted(
        map(tuple, spark.read.parquet(out).collect())
    )
    want = sorted(map(tuple, gates(batch).collect()))
    assert got == want and len(got) == 80


def test_stream_upsert_merges_recrawl(spark, tmp_path):
    """foreachBatch upsert sink: a recrawl micro-batch replaces its
    urls in the committed warehouse (one row per url afterwards), and
    a checkpoint replay is a no-op."""
    from docling_serve_spark.sources.warehouse import (
        read_results,
        run_checkpointed,
    )
    from docling_serve_spark.streaming.ingest import run_upsert_stream

    out = str(tmp_path / "wh")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    n = 40
    run_checkpointed(spark, build_pages_df(spark, n, partitions=4), out,
                     n_chunks=4)
    committed = read_results(spark, out)
    row_schema = committed.drop("chunk").schema

    changed = (
        committed.orderBy("url").limit(5).drop("chunk")
        .withColumn("extracted_text", F.lit("RECRAWLED"))
    )
    fresh = (
        committed.orderBy(F.col("url").desc()).limit(2).drop("chunk")
        .withColumn("url", F.concat(F.col("url"), F.lit("?v=2")))
    )
    changed.unionByName(fresh).localCheckpoint(eager=True).coalesce(
        1
    ).write.parquet(os.path.join(landing, "batch1"))

    stream = spark.readStream.schema(row_schema).option(
        "recursiveFileLookup", "true"
    ).parquet(landing)
    run_upsert_stream(stream, out, ckpt, n_chunks=4).awaitTermination()

    after = read_results(spark, out)
    assert after.count() == n + 2
    assert after.select("url").distinct().count() == n + 2
    assert (
        after.filter(F.col("extracted_text") == "RECRAWLED").count() == 5
    )

    # replay: same checkpoint, no new files -> warehouse unchanged
    stream2 = spark.readStream.schema(row_schema).option(
        "recursiveFileLookup", "true"
    ).parquet(landing)
    run_upsert_stream(stream2, out, ckpt, n_chunks=4).awaitTermination()
    assert read_results(spark, out).count() == n + 2


def test_bloom_novelty_stream_filters_history(spark, tmp_path):
    """Bloom-novelty sink (X88): urls seen in ANY earlier micro-batch
    or earlier drain are suppressed from the novel output; history
    lives in the committed filter snapshots (m bits total), not in
    per-url operator state. Restart picks up the latest snapshot."""
    from docling_serve_spark.streaming.ingest import (
        run_bloom_novelty_stream,
        stream_pages,
    )

    landing = str(tmp_path / "landing")
    novel = str(tmp_path / "novel")
    bloom = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ckpt")

    first = build_pages_df(spark, 40)
    first.write.parquet(landing)
    q = run_bloom_novelty_stream(
        stream_pages(spark, landing), novel, bloom, ckpt)
    _await(q)
    out1 = spark.read.parquet(novel)
    assert out1.count() == 40
    assert sorted(r["url"] for r in out1.select("url").collect()) == sorted(
        r["url"] for r in first.select("url").collect())

    # second drain: all 40 recrawls + 40 new urls -> only the new pass
    hundred = build_pages_df(spark, 80)
    recrawl = hundred.join(first.select("url"), "url").select(
        "url", "warc_ts", "html", "text", "lang")
    new = hundred.join(first.select("url"), "url", "left_anti")
    assert new.count() == 40
    recrawl.unionByName(new).write.mode("append").parquet(landing)
    q = run_bloom_novelty_stream(
        stream_pages(spark, landing), novel, bloom, ckpt)
    _await(q)
    out2 = spark.read.parquet(novel)
    assert out2.count() == 80
    assert out2.select("url").distinct().count() == 80

    # filter snapshots committed per batch, versions monotone
    import os
    versions = sorted(d for d in os.listdir(bloom) if d.startswith("v="))
    assert len(versions) >= 2

    # third drain with ONLY recrawls -> nothing new appended
    recrawl.write.mode("append").parquet(landing)
    q = run_bloom_novelty_stream(
        stream_pages(spark, landing), novel, bloom, ckpt)
    _await(q)
    assert spark.read.parquet(novel).count() == 80


def test_drift_stream_flags_profile_jump(spark, tmp_path):
    """Streaming drift monitor (X104 streaming form): the first drain
    commits the reference histogram silently; a second drain with the
    same length profile reports ~zero TV; a third drain of much longer
    documents reports large TV mass — all against the CUMULATIVE
    history, with one report row-set per batch id."""
    import os

    from docling_serve_spark.streaming.ingest import (
        run_drift_stream,
        stream_pages,
    )

    landing = str(tmp_path / "landing")
    drift = str(tmp_path / "drift")
    hist = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")

    first = build_pages_df(spark, 40)
    first.write.parquet(landing)
    q = run_drift_stream(stream_pages(spark, landing), drift, hist, ckpt)
    _await(q)
    # no reference yet: histogram committed, no report
    assert not os.path.exists(drift)
    assert any(d.startswith("v=") for d in os.listdir(hist))

    # same profile again -> low TV
    build_pages_df(spark, 40).write.mode("append").parquet(landing)
    q = run_drift_stream(stream_pages(spark, landing), drift, hist, ckpt)
    _await(q)
    r1 = spark.read.parquet(drift)
    tv_same = r1.select("tv_total_bp").first()["tv_total_bp"]
    assert tv_same <= 1500

    # radically longer docs -> large TV, new batch id
    long_docs = build_pages_df(spark, 40).withColumn(
        "text", F.expr("repeat(text, 40)")
    )
    long_docs.write.mode("append").parquet(landing)
    q = run_drift_stream(stream_pages(spark, landing), drift, hist, ckpt)
    _await(q)
    r2 = spark.read.parquet(drift)
    assert r2.select("batch_id").distinct().count() == 2
    tv_jump = (
        r2.groupBy("batch_id").agg(F.max("tv_total_bp").alias("tv"))
        .agg(F.max("tv")).first()[0]
    )
    assert tv_jump >= 8000


def test_delta_chain_stream_state_spans_microbatches(spark, tmp_path):
    """X149: the per-url last-simhash state must survive across
    micro-batches — batch 2's first capture classes against batch 1's
    LAST simhash, which a batch lag window gets for free and a stream
    only gets through state."""
    from docling_serve_spark.streaming.ingest import delta_chain_stream

    landing = str(tmp_path / "caps")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "url string, ts bigint, simhash bigint"

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        spark.createDataFrame(
            [("u1", 1, 100), ("u1", 2, 100), ("u1", 3, 101),
             ("u2", 1, 7)],
            schema,
        ).write.parquet(landing)
        q = spark.readStream.schema(schema).parquet(landing)
        run = delta_chain_stream(q).writeStream.format("parquet") \
            .option("path", out).option("checkpointLocation", ckpt) \
            .trigger(availableNow=True).start()
        run.awaitTermination(120)
        got = {(r["url"], r["ts"]): r["cls"]
               for r in spark.read.parquet(out).collect()}
        assert got == {("u1", 1): "novel", ("u1", 2): "identical",
                       ("u1", 3): "delta", ("u2", 1): "novel"}

        # batch 2: u1 continues from simhash 101 (state), u2 jumps far
        spark.createDataFrame(
            [("u1", 4, 101), ("u2", 2, 7 ^ 0xFF0)], schema
        ).write.mode("append").parquet(landing)
        q = spark.readStream.schema(schema).parquet(landing)
        run = delta_chain_stream(q).writeStream.format("parquet") \
            .option("path", out).option("checkpointLocation", ckpt) \
            .trigger(availableNow=True).start()
        run.awaitTermination(120)
        got = {(r["url"], r["ts"]): r["cls"]
               for r in spark.read.parquet(out).collect()}
        assert got[("u1", 4)] == "identical"   # vs batch-1 state 101
        assert got[("u2", 2)] == "novel"
        assert len(got) == 6
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_politeness_stream_state_and_batch_identity(spark, tmp_path):
    """X171: host state (last ADMITTED ts) survives micro-batches —
    h1's batch-2 candidate at ts=1500 defers against the ts=1000
    admission from batch 1; and the streamed verdicts equal the batch
    twin run over the full ts-ordered history."""
    from docling_serve_spark.operators.frontier import politeness_gate
    from docling_serve_spark.streaming.ingest import politeness_stream

    landing = str(tmp_path / "fetches")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "host string, url string, ts bigint"
    b1 = [("h1", "a", 0), ("h1", "b", 500), ("h1", "c", 1000),
          ("h2", "d", 0)]
    b2 = [("h1", "e", 1500), ("h1", "f", 2000), ("h2", "g", 900),
          ("h2", "h", 1100)]

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        spark.createDataFrame(b1, schema).write.parquet(landing)
        q = spark.readStream.schema(schema).parquet(landing)
        run = politeness_stream(q).writeStream.format("parquet") \
            .option("path", out).option("checkpointLocation", ckpt) \
            .trigger(availableNow=True).start()
        run.awaitTermination(120)
        spark.createDataFrame(b2, schema).write.mode("append") \
            .parquet(landing)
        q = spark.readStream.schema(schema).parquet(landing)
        run = politeness_stream(q).writeStream.format("parquet") \
            .option("path", out).option("checkpointLocation", ckpt) \
            .trigger(availableNow=True).start()
        run.awaitTermination(120)

        streamed = {(r["host"], r["url"]): r["allowed"]
                    for r in spark.read.parquet(out).collect()}
        # h1: 0 admit, 500 defer, 1000 admit | 1500 defer (state!),
        # 2000 admit; h2: 0 admit | 900 defer, 1100 admit
        assert streamed == {
            ("h1", "a"): True, ("h1", "b"): False, ("h1", "c"): True,
            ("h1", "e"): False, ("h1", "f"): True,
            ("h2", "d"): True, ("h2", "g"): False, ("h2", "h"): True,
        }
        batch = {(r["host"], r["url"]): r["allowed"]
                 for r in politeness_gate(
                     spark.createDataFrame(b1 + b2, schema)).collect()}
        assert batch == streamed
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_politeness_stream_multichunk_group(spark, tmp_path):
    """A host whose micro-batch rows span MULTIPLE Arrow chunks
    (arrow.maxRecordsPerBatch below group size) must still fold in
    global ts order: rows land on disk ts-descending, so any per-chunk
    processing with carried state admits out of order and diverges
    from the batch twin."""
    from docling_serve_spark.operators.frontier import politeness_gate
    from docling_serve_spark.streaming.ingest import politeness_stream

    landing = str(tmp_path / "fetches")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "host string, url string, ts bigint"
    # 12 rows for one host, written ts-DESCENDING in one file; expected
    # admissions at 0, 1000, 2000, ... (delay_ms=1000 over ts=0..5500
    # step 500).
    rows = [("h1", f"u{ts}", ts) for ts in range(5500, -1, -500)]

    prev_shuf = spark.conf.get("spark.sql.shuffle.partitions")
    prev_arrow = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(landing)
        q = spark.readStream.schema(schema).parquet(landing)
        run = politeness_stream(q).writeStream.format("parquet") \
            .option("path", out).option("checkpointLocation", ckpt) \
            .trigger(availableNow=True).start()
        run.awaitTermination(120)
        streamed = {r["url"]: r["allowed"]
                    for r in spark.read.parquet(out).collect()}
        assert streamed == {f"u{ts}": ts % 1000 == 0
                            for ts in range(0, 5501, 500)}
        batch = {r["url"]: r["allowed"]
                 for r in politeness_gate(
                     spark.createDataFrame(rows, schema)).collect()}
        assert batch == streamed
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuf)
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev_arrow)


def test_politeness_gate_equal_ts_deterministic(spark):
    """Two same-host fetches at the SAME instant: the fold order (and
    so which one is admitted) must not depend on partitioning or
    arrival order — (ts, url) sorting makes the url-lexicographic
    first the admitted one, in the batch op and the oracle alike."""
    from docling_serve_spark.operators.frontier import politeness_gate

    schema = "host string, url string, ts bigint"
    rows = [("h1", "zz", 100), ("h1", "aa", 100), ("h1", "mm", 100),
            ("h1", "later", 1100)]
    for perm in (rows, rows[::-1]):
        got = {r["url"]: r["allowed"]
               for r in politeness_gate(
                   spark.createDataFrame(perm, schema)).collect()}
        assert got == {"aa": True, "zz": False, "mm": False,
                       "later": True}


def test_delta_chain_stream_multichunk_group(spark, tmp_path):
    """Same multi-chunk guarantee for the capture delta-chain: with
    3-row Arrow chunks and a ts-descending landing file, the chain
    must still classify in global ts order (alternating simhashes one
    bit apart -> novel then all delta)."""
    from docling_serve_spark.streaming.ingest import delta_chain_stream

    landing = str(tmp_path / "caps")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "url string, ts bigint, simhash bigint"
    # simhash alternates between 0b0 and 0b1 (hamming distance 1 <= 3
    # -> delta); processed out of order the first-seen row would not
    # be ts=0 and 'novel' would land elsewhere.
    rows = [("u", ts, (ts // 100) % 2) for ts in range(900, -1, -100)]

    prev_shuf = spark.conf.get("spark.sql.shuffle.partitions")
    prev_arrow = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(landing)
        q = spark.readStream.schema(schema).parquet(landing)
        run = delta_chain_stream(q).writeStream.format("parquet") \
            .option("path", out).option("checkpointLocation", ckpt) \
            .trigger(availableNow=True).start()
        run.awaitTermination(120)
        got = {r["ts"]: r["cls"]
               for r in spark.read.parquet(out).collect()}
        assert got == {0: "novel",
                       **{ts: "delta" for ts in range(100, 901, 100)}}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuf)
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev_arrow)


def test_late_monitor_stream_batch_identity(spark, tmp_path):
    """X200: the per-shard high-water mark survives micro-batches —
    a batch-2 event older than batch 1's newest is late across the
    boundary — and aggregating the streamed per-event rows equals
    the batch twin's rollup on the same arrival-ordered history."""
    import datetime as dt

    from docling_serve_spark.operators.relational import late_data_audit
    from docling_serve_spark.streaming.ingest import late_monitor_stream

    landing = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "shard bigint, arr bigint, ms bigint"
    MIN = 60_000
    b1 = [(0, 1, 10 * MIN), (0, 2, 30 * MIN), (0, 3, 25 * MIN),
          (1, 4, 100 * MIN)]
    b2 = [(0, 5, 5 * MIN),        # 25 min behind the mark -> dropped
          (0, 6, 31 * MIN),
          (1, 7, 98 * MIN)]       # 2 min behind -> late, kept

    def run_batch(rows, mode):
        spark.createDataFrame(rows, schema).write.mode(mode) \
            .parquet(landing)
        q = spark.readStream.schema(schema).parquet(landing)
        run = late_monitor_stream(q, delay_ms=10 * MIN).writeStream \
            .format("parquet").option("path", out) \
            .option("checkpointLocation", ckpt) \
            .trigger(availableNow=True).start()
        run.awaitTermination(120)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        run_batch(b1, "overwrite")
        run_batch(b2, "append")
        got = {r["arr"]: r for r in spark.read.parquet(out).collect()}
        assert got[3]["lateness_ms"] == 5 * MIN and not got[3]["dropped"]
        assert got[5]["lateness_ms"] == 25 * MIN and got[5]["dropped"]
        assert got[7]["lateness_ms"] == 2 * MIN and not got[7]["dropped"]
        assert got[1]["lateness_ms"] == 0 and got[6]["lateness_ms"] == 0

        epoch = dt.datetime(1970, 1, 1)
        batch_rows = [
            (s, a, epoch + dt.timedelta(milliseconds=ms))
            for s, a, ms in b1 + b2
        ]
        bdf = spark.createDataFrame(
            batch_rows, "shard bigint, event_id bigint, ts timestamp_ntz")
        twin = {r["shard"]: r for r in late_data_audit(
            bdf, ts_col="ts", arrival_col="event_id",
            shard_col="shard", delay_ms=10 * MIN).collect()}
        agg = {}
        for r in got.values():
            a = agg.setdefault(r["shard"],
                               {"n": 0, "late": 0, "drop": 0, "mx": 0})
            a["n"] += 1
            a["late"] += r["lateness_ms"] > 0
            a["drop"] += r["dropped"]
            a["mx"] = max(a["mx"], r["lateness_ms"])
        for shard, t in twin.items():
            a = agg[shard]
            assert (t["n_events"], t["n_late"], t["n_dropped"],
                    t["max_lateness_ms"]) == \
                (a["n"], a["late"], a["drop"], a["mx"])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_session_window_stream_equals_batch(spark, tmp_path):
    """X235 — the native session_window aggregation under readStream
    (watermarked, append mode) finalizes exactly the sessions the
    batch form computes, once the watermark passes them."""
    from docling_serve_spark.streaming.ingest import session_window_stats

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows = []
    for u in range(6):
        # two sessions per user: a burst at :00-:04, another at :30
        for m in (0, 2, 4):
            rows.append((u, f"2024-01-01 00:{m:02d}:00"))
        rows.append((u, "2024-01-01 00:30:00"))
    ev = spark.createDataFrame(rows, ["user_id", "ts"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    ev.write.parquet(landing)
    batch = {(r.user_id, str(r.session_start), str(r.session_end),
              r.n_events, r.duration_sec)
             for r in session_window_stats(ev).collect()}

    def drain():
        src = (
            spark.readStream.schema("user_id bigint, ts timestamp")
            .parquet(landing)
        )
        q = run_to_parquet(
            session_window_stats(src, watermark="10 minutes"), out, ckpt
        )
        _await(q)

    drain()
    # a late event far in the future advances the watermark past all
    # sessions; the checkpointed restart finalizes them
    spark.createDataFrame([(99, "2024-01-01 06:00:00")],
                          ["user_id", "ts"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    ).write.mode("append").parquet(landing)
    drain()

    got = {(r.user_id, str(r.session_start), str(r.session_end),
            r.n_events, r.duration_sec)
           for r in spark.read.parquet(out).collect()}
    assert batch <= got            # every batch session finalized
    extra = got - batch
    assert all(u == 99 for (u, *_ ) in extra)  # only the closer event
    # spot-check semantics: burst session spans :00 to :04 + 5 min gap
    some = [g for g in got if g[0] == 0 and g[3] == 3][0]
    assert some[1] == "2024-01-01 00:00:00"
    assert some[2] == "2024-01-01 00:09:00"
    assert some[4] == 540


def test_native_watermark_dedup_drops_recrawls(spark, tmp_path):
    """X243 — dropDuplicatesWithinWatermark keeps one row per url
    across micro-batches within the horizon; a second drain from the
    same checkpoint does not re-emit already-seen urls."""
    from docling_serve_spark.streaming.ingest import dedup_stream_native

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def pages(n, ts, start=0):
        return spark.createDataFrame(
            [(f"https://h{i % 7}.com/p{start + i}", ts) for i in range(n)],
            ["url", "warc_ts"],
        ).select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts"))

    # batch 1: 20 urls, each duplicated twice at nearby times
    a = pages(20, "2024-01-01 00:00:00")
    b = pages(20, "2024-01-01 00:10:00")
    a.unionByName(b).write.parquet(landing)

    def drain():
        src = (spark.readStream.schema("url string, warc_ts timestamp")
               .parquet(landing))
        q = run_to_parquet(dedup_stream_native(src), out, ckpt)
        _await(q)

    drain()
    first = spark.read.parquet(out)
    assert first.count() == 20
    assert first.select("url").distinct().count() == 20

    # batch 2: 10 recrawls of seen urls + 5 genuinely new
    pages(10, "2024-01-01 00:20:00").write.mode("append").parquet(landing)
    pages(5, "2024-01-01 00:30:00", start=1000).write.mode("append").parquet(
        landing
    )
    drain()
    final = spark.read.parquet(out)
    assert final.count() == 25
    assert final.select("url").distinct().count() == 25
