"""Structured-streaming form of the extraction pipeline.

The reference has NO stream surface — its async API is task-based
request/response (SURVEY.md §2.9) — but the batch job generalizes to
a continuous crawl feed for free: the extraction stage is a stateless
``mapInPandas``, so the identical ``run_extraction`` plan runs under
``readStream`` with exactly-once file-sink semantics from the
streaming checkpoint (the streaming analog of the batch job's
per-chunk manifest, sources/warehouse.py).

Deployment shapes:
  - drain-the-backlog: ``trigger(availableNow=True)`` — process every
    file currently in the landing dir, checkpoint, exit (used by the
    tests; also the idempotent "catch-up" cron job at scale)
  - continuous: default micro-batches; new crawl files picked up by
    the file source, ``maxFilesPerTrigger`` bounding batch size

Late/landing metrics use event-time windows on ``warc_ts`` with a
watermark, so a replayed crawl partition does not grow state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from docling_serve_spark.extract.core import ExtractOptions
from docling_serve_spark.operators.extract_stage import run_extraction

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a landing directory of pages parquet."""
    reader = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


def extract_stream(pages: DataFrame, opts: ExtractOptions | None = None) -> DataFrame:
    """The batch extraction plan, unchanged, over a streaming source —
    stateless stages (filter/repartition/mapInPandas/union) are
    streaming-compatible as-is."""
    return run_extraction(pages, opts=opts)


def windowed_status_counts(
    results: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window conversion counters (the streaming form of
    TaskProcessingMeta, reference:datamodel/task_meta.py:4-8): docs and
    bytes per (event-time window, status). The watermark bounds state:
    crawl partitions older than it are finalized and evicted."""
    return (
        results.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("status"))
        .agg(
            F.count("*").alias("num_docs"),
            F.sum("n_bytes").alias("bytes_processed"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "status", "num_docs", "bytes_processed",
        )
    )


def run_to_parquet(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    output_mode: str = "append",
) -> StreamingQuery:
    """Start the sink with exactly-once checkpointing."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    pages: DataFrame,
    retention_days: int | None = None,
) -> DataFrame:
    """Cross-micro-batch URL dedup — the custom stateful operator
    (``applyInPandasWithState``) a continuous crawl feed needs: a
    recrawled url must not be re-extracted in a later micro-batch.

    State: one boolean per url group (first-seen flag), keyed by url —
    the shuffle key is the dedup key, so state is partition-local and
    scales linearly with executors.

    Eviction modes, chosen by deployment shape:
    - ``retention_days=None`` (default, drain mode): NoTimeout. An
      ``availableNow`` drain terminates after the backlog; state
      lives for the checkpoint's lifetime. Required for drain jobs —
      a registered processing-time timeout keeps an availableNow
      query alive waiting for the timer (measured).
    - ``retention_days=N`` (continuous mode): processing-time timeout
      refreshed on every sighting, so a url not re-seen within the
      wall-clock horizon is evicted — bounded state for the 10^12-url
      regime; a recrawl after retention re-extracts (the refresh
      semantics).

    Processing-time (not event-time) eviction is deliberate: an
    event-time timeout makes the operator watermark-gated, and crawl
    feeds replay historical partitions whose ``warc_ts`` lies far
    behind the frontier — a watermark would silently drop those rows
    as late instead of deduplicating them (measured:
    numRowsDroppedByWatermark swallowed entire replay batches).

    Within a batch the earliest (warc_ts, then stable frame order) row
    wins, deterministically.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    retention_ms = (retention_days or 0) * 86_400_000

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values("warc_ts", kind="stable").iloc[[0]]
            if first is None or (
                cand["warc_ts"].iloc[0] < first["warc_ts"].iloc[0]
            ):
                first = cand
        already = state.exists
        state.update((True,))
        if retention_ms:
            state.setTimeoutDuration(retention_ms)
        if not already and first is not None:
            yield first

    return pages.groupBy("url").applyInPandasWithState(
        fn,
        outputStructType=PAGES_DDL,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if retention_days
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_upsert_stream(
    results: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n_chunks: int = 16,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous-recrawl sink: each micro-batch of re-extracted rows
    is MERGED into the committed warehouse by url (``warehouse.upsert``
    via ``foreachBatch``) instead of appended — the streaming form of
    the X26→X34 recrawl loop, so the warehouse always holds exactly
    one (latest) row per url.

    Exactly-once composition: the streaming checkpoint makes batch
    replay idempotent BECAUSE the upsert itself is idempotent (same
    batch merged twice yields the same warehouse state) — the same
    argument Iceberg makes for foreachBatch MERGE sinks. Each batch
    touches only the hash-chunk partitions containing its urls."""
    from docling_serve_spark.sources import warehouse

    def merge(batch: DataFrame, _batch_id: int) -> None:
        if not batch.isEmpty():
            batch = batch.dropDuplicates(["url"]).localCheckpoint(eager=True)
            warehouse.upsert(batch.sparkSession, out_dir, batch, n_chunks)

    writer = (
        results.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_bloom_novelty_stream(
    pages: DataFrame,
    novel_dir: str,
    bloom_dir: str,
    checkpoint_dir: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous frontier-novelty sink: each micro-batch probes a
    PERSISTENT Bloom word table (X86) for its urls, appends only the
    never-seen rows to ``novel_dir``, and commits an updated filter —
    the streaming form of the crawler's "is this url new?" gate, with
    the filter (≤ m/63 bigint rows) carrying the whole history instead
    of an ever-growing seen-url table or per-url operator state
    (``dedup_stream`` holds state per URL; this holds m bits TOTAL, so
    a 10^12-url history fits in one broadcastable table).

    Exactly-once composition: the filter snapshot is written to
    ``bloom_dir/v={batch_id}`` — a REPLAYED batch rewrites the same
    version from the same inputs (bit_or is idempotent), and the probe
    reads the latest committed version, so duplicates are possible
    only for the single batch that crashed between its novel-append
    and its filter-commit (novel-first ordering: a crash can re-emit a
    batch's novels, never lose one — the right trade for a frontier;
    downstream X1 absorbs re-emits). Bloom false positives (rate
    (1−e^(−kn/m))^k) drop a novel url as seen — size ``m_bits`` to the
    crawl horizon; false negatives never happen."""
    from docling_serve_spark.operators.sketches import bloom_build, bloom_probe

    def step(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        batch = batch.localCheckpoint(eager=True)
        urls = batch.select("url").distinct()
        fs_versions = _bloom_versions(spark, bloom_dir)
        prior = [v for v in fs_versions if v < batch_id]
        if prior:
            words = spark.read.parquet(f"{bloom_dir}/v={max(prior)}")
        else:
            words = spark.createDataFrame(
                [], "word_idx bigint, word bigint"
            )
        novel = (
            bloom_probe(words, urls, m_bits=m_bits, k=k)
            .filter(~F.col("maybe_seen"))
            .select(F.col("item").alias("url"))
        )
        batch.join(novel, "url", "semi").write.mode("append").parquet(
            novel_dir
        )
        new_words = (
            words.union(bloom_build(urls, m_bits=m_bits, k=k))
            .groupBy("word_idx")
            .agg(F.expr("bit_or(word)").cast("bigint").alias("word"))
        )
        new_words.coalesce(1).write.mode("overwrite").parquet(
            f"{bloom_dir}/v={batch_id}"
        )

    writer = (
        pages.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _bloom_versions(spark: SparkSession, bloom_dir: str) -> list[int]:
    """Committed filter versions (v={batch_id} subdirs), via the
    JVM Hadoop FS so the sink works on any supported filesystem."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(bloom_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                pass
    return out


def run_drift_stream(
    pages: DataFrame,
    drift_dir: str,
    hist_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous ingest-drift monitor: each micro-batch's log2-length
    histogram (X104's mergeable summary) is compared against the
    CUMULATIVE histogram of every prior batch, one drift report
    (per-bin deltas + TV total, tagged with the batch id) is appended
    to ``drift_dir``, and the cumulative histogram is re-committed to
    ``hist_dir/v={batch_id}`` — the streaming form of the batch_drift
    gate, so a crawl feed whose length profile jumps is flagged the
    micro-batch it happens, not at the next offline audit.

    State is the ≤64-row histogram, NOT per-document operator state:
    histograms of disjoint batches add, so the reference carries a
    10^12-document history in 64 bigint rows (same bounded-state
    argument as the X86 Bloom sink). Versioned-snapshot idempotence as
    in ``run_bloom_novelty_stream``: a replayed batch recomputes the
    same v={batch_id} snapshot from the same inputs; only the drift
    append of the single crashed batch can duplicate, and its rows
    carry the batch id so readers dedup by (batch_id, bin). The first
    batch commits its histogram and emits no report (there is no
    reference yet)."""
    from docling_serve_spark.operators.corpus import (
        drift_from_histograms,
        length_histogram,
    )

    def step(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        hb = length_histogram(batch, text_col).localCheckpoint(eager=True)
        prior = [v for v in _bloom_versions(spark, hist_dir)
                 if v < batch_id]
        if prior:
            ref = spark.read.parquet(f"{hist_dir}/v={max(prior)}")
            report = drift_from_histograms(
                ref.withColumnRenamed("n", "n_a"),
                hb.withColumnRenamed("n", "n_b"),
            ).withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            report.coalesce(1).write.mode("append").parquet(drift_dir)
            cumulative = (
                ref.unionByName(hb).groupBy("bin")
                .agg(F.sum("n").cast("bigint").alias("n"))
            )
        else:
            cumulative = hb
        cumulative.coalesce(1).write.mode("overwrite").parquet(
            f"{hist_dir}/v={batch_id}"
        )

    writer = (
        pages.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def delta_chain_stream(captures: DataFrame,
                       max_hamming: int = 3) -> DataFrame:
    """(url, ts, simhash, cls) — the ONLINE form of X135's capture
    delta-chain classifier: per-url state holds the LAST simhash seen,
    each incoming capture classes against it (identical / delta /
    novel, same bit-count rule as the batch lag window) and becomes
    the new state — so a streaming archiver decides revisit-vs-delta-
    vs-full storage AT INGEST, instead of re-walking the chain in
    batch. State is one int64 per url, keyed by the shuffle key, so
    it scales partition-locally like ``dedup_stream``.

    Within a micro-batch captures are processed in ts order; ACROSS
    batches arrival order is assumed to follow capture time (an
    append-log feed — the same processing-time rationale as
    ``dedup_stream``: archive feeds replay old partitions, and
    watermark gating would drop them instead of classifying them).
    A replayed out-of-order capture re-classes against the newest
    state, exactly what a streaming dedup store would do."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        last = state.get[0] if state.exists else None
        frames = []
        # Accumulate all Arrow chunks and sort ONCE: a group larger
        # than arrow.maxRecordsPerBatch arrives as several chunks, and
        # classifying per-chunk with carried state would walk the
        # chain out of global ts order (diverging from the batch twin).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        for pdf in ([pd.concat(chunks).sort_values(["ts", "simhash"],
                                                   kind="stable")]
                    if chunks else []):
            cls = []
            for sim in pdf["simhash"]:
                sim = int(sim)
                if last is None:
                    cls.append("novel")
                else:
                    d = bin(sim ^ last).count("1")
                    cls.append(
                        "identical" if d == 0
                        else "delta" if d <= max_hamming
                        else "novel"
                    )
                last = sim
            out = pdf[["url", "ts", "simhash"]].copy()
            out["cls"] = cls
            frames.append(out)
        if last is not None:
            state.update((int(last),))
        if frames:
            yield pd.concat(frames)

    return captures.groupBy("url").applyInPandasWithState(
        fn,
        outputStructType="url string, ts bigint, simhash bigint, cls string",
        stateStructType="last bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def politeness_stream(fetches: DataFrame, delay_ms: int = 1000) -> DataFrame:
    """(host, url, ts, allowed) — the ONLINE form of X53's politeness
    schedule: per-host state holds the timestamp of the LAST ALLOWED
    fetch, each incoming candidate is admitted iff at least
    ``delay_ms`` has passed since it (RFC 9309 §2.4 crawl-delay
    semantics at enforcement time, not planning time), and admitted
    fetches advance the state. Deferred rows are emitted flagged, not
    dropped — the frontier requeues them.

    This is a sequential fold per host (the admit decision depends on
    the previous ADMITTED row, not the previous row, so no window
    expresses it); state is one int64 per host, keyed by the shuffle
    key, partition-local like `dedup_stream`. Within a micro-batch
    candidates process in ts order; across batches arrival order is
    assumed to follow candidate time (same append-log rationale as
    `delta_chain_stream`). `politeness_gate` in
    `operators/frontier.py` is the batch twin — the identity test
    pins stream == batch on any ts-ordered batch split."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        last = state.get[0] if state.exists else None
        # A micro-batch group may arrive as multiple Arrow chunks
        # (> arrow.maxRecordsPerBatch rows); the admit fold must see
        # the whole group in global ts order, so accumulate first,
        # concat, and sort ONCE — per-chunk sorting with carried state
        # would admit out of order and diverge from the batch twin.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # (ts, url): same deterministic tie order as the batch twin
            pdf = pd.concat(chunks).sort_values(["ts", "url"],
                                                kind="stable")
            allowed = []
            for ts in pdf["ts"]:
                ts = int(ts)
                ok = last is None or ts - last >= delay_ms
                if ok:
                    last = ts
                allowed.append(ok)
            out = pdf[["host", "url", "ts"]].copy()
            out["allowed"] = allowed
            if last is not None:
                state.update((int(last),))
            yield out
        elif last is not None:
            state.update((int(last),))

    return fetches.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType="host string, url string, ts bigint, allowed boolean",
        stateStructType="last bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def late_monitor_stream(events: DataFrame,
                        delay_ms: int = 600_000) -> DataFrame:
    """(shard, arr, ms, lateness_ms, dropped) — the ONLINE form of
    X200's watermark audit (`operators.relational.late_data_audit`):
    per-shard state carries the event-time high-water mark; each
    arriving event reports how far it trails it (0 when on time) and
    whether a Structured Streaming watermark of ``delay_ms`` would
    have discarded it, then advances the mark. Production monitors
    run THIS next to the real watermarked job: the stream tells you
    live what the knob is costing.

    Sequential fold per shard (the mark depends on every prior
    arrival); state is one int64 per shard. Within a micro-batch
    events fold in ``arr`` (arrival-sequence) order across Arrow
    chunks — accumulate, concat, sort once (the politeness_stream
    chunk rule); across batches arrival order follows the append log.
    The batch twin's per-shard rollup equals the aggregation of this
    stream's per-event rows on any arrival-ordered batch split."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        hwm = state.get[0] if state.exists else None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values("arr", kind="stable")
            late, dropped = [], []
            for ms in pdf["ms"]:
                ms = int(ms)
                lm = hwm - ms if hwm is not None and ms < hwm else 0
                late.append(lm)
                dropped.append(lm > delay_ms)
                hwm = ms if hwm is None else max(hwm, ms)
            out = pdf[["shard", "arr", "ms"]].copy()
            out["lateness_ms"] = late
            out["dropped"] = dropped
            if hwm is not None:
                state.update((int(hwm),))
            yield out
        elif hwm is not None:
            state.update((int(hwm),))

    return events.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=(
            "shard bigint, arr bigint, ms bigint, "
            "lateness_ms bigint, dropped boolean"
        ),
        stateStructType="hwm bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """X235 — NATIVE session windows (F.session_window, the dynamic-
    gap window Spark added for exactly this): per-key sessions closed
    by ``gap`` of inactivity, each window ending at last-event + gap.
    The built-in replaces X12's lag-and-cumsum sessionization wherever
    the engine can own the state: in STREAMING mode (pass
    ``watermark``) Spark merges windows incrementally and evicts
    closed sessions past the watermark — the gaps-and-islands SQL
    form cannot run on an unbounded stream at all, because a session
    is only closed by the NEXT event or the watermark.

    Same expression works in batch (watermark=None) — the batch form
    is the catalog query's oracle-checked surface, the streaming form
    is pinned stream==batch in tests/test_streaming.py.

    Shape at scale: one shuffle on the session key with map-side
    partial merge of overlapping windows; state per OPEN session
    only."""
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap), F.col(key_col)
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            (F.unix_timestamp("session_window.end")
             - F.unix_timestamp("session_window.start"))
            .cast("bigint").alias("duration_sec"),
        )
    )


def dedup_stream_native(pages: DataFrame, watermark: str = "1 hour",
                        key_col: str = "url",
                        ts_col: str = "warc_ts") -> DataFrame:
    """X243 — the NATIVE bounded-state streaming dedup:
    ``dropDuplicatesWithinWatermark`` keeps first-seen rows per key
    and lets the ENGINE evict state once the watermark passes a key's
    last sighting — the built-in alternative to X9's
    applyInPandasWithState dedup (which this repo keeps for its
    richer semantics: recrawl counters, explicit retention modes).
    Use the native form when the dedup horizon IS an event-time
    window (a crawl feed where the same url re-appears within hours,
    not weeks): no Python state function, no Arrow boundary, state
    eviction proven by the engine. Duplicates WITHIN the horizon are
    dropped even when their event times differ (unlike
    ``dropDuplicates``, which needs exact-equality on every column
    it keys)."""
    return pages.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark([key_col])
