"""Relational/orchestration operators (SURVEY.md §2.8-2.9): ordered
page assembly, language-map broadcast join, retention cutoff, resume
anti-join, status counters, JSON scalar access.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from docling_serve_spark.extract.langmap import mapping_rows

# A4 page-break marker (reference:ai_vision_settings.py:32)
PAGE_BREAK_MARKER = "\n\n---\n\n"


def ordered_concat(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "joined",
    marker: str = PAGE_BREAK_MARKER,
) -> DataFrame:
    """A4 — ordered within-group concatenation: collect (order, value)
    structs, array_sort (order key first => struct sort is by order),
    project values, join with the page-break marker. One shuffle on
    the group key; partial aggregation applies."""
    return (
        df.groupBy(group_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(order_col), F.col(value_col)))
                    ),
                    lambda s: s[value_col],
                ),
                marker,
            ).alias(out_col)
        )
    )


def page_sample(
    df: DataFrame,
    group_col: str,
    order_col: str,
    head: int = 5,
    stride: int = 10,
) -> DataFrame:
    """F2 — the PDF-analysis page-sampling policy as a relational op
    (reference:docling_serve/pdf_analysis.py:52-72: sample the first 5
    pages plus every ~10th). Pages are numbered within each document
    by a window (one shuffle on the group key), then filtered; at
    scale the input is already clustered by document so the window is
    a cheap within-partition sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    return (
        df.withColumn("page_no", F.row_number().over(w))
        .filter((F.col("page_no") <= head) | (F.col("page_no") % stride == 0))
    )


def lang_mapping_df(spark: SparkSession) -> DataFrame:
    """P4 — the OCR language mapping as a (src_code, tesseract_code)
    table; tiny, always broadcast. Built as a SQL VALUES LocalRelation
    (stays entirely JVM-side; ``createDataFrame`` would round-trip the
    rows through a Python RDD and pay Python-worker spawn on first
    use)."""
    values = ", ".join(f"('{s}', '{t}')" for s, t in mapping_rows())
    return spark.sql(
        f"SELECT * FROM (VALUES {values}) AS m(src_code, tesseract_code)"
    )


def join_lang_mapping(df: DataFrame, lang_col: str = "lang") -> DataFrame:
    """Broadcast left join request languages -> tesseract codes
    (unknown codes yield null; reference drops them,
    ocr_language_utils.py:171-172)."""
    mapping = lang_mapping_df(df.sparkSession)
    return df.join(
        F.broadcast(mapping),
        F.lower(F.trim(F.col(lang_col))) == F.col("src_code"),
        "left",
    )


def retention_filter(df: DataFrame, ts_col: str, cutoff: str) -> DataFrame:
    """S8 — the clear_results(older_than) cutoff as a timestamp
    predicate (reference:engines/async_orchestrator.py:86-97);
    partition-prunes when the table is partitioned on ts_col."""
    return df.filter(F.col(ts_col) < F.lit(cutoff).cast("timestamp"))


def resume_anti_join(
    inputs: DataFrame, manifest: DataFrame, key: str = "url"
) -> DataFrame:
    """O15 — checkpoint resume: keep only input rows whose key is NOT
    in the completed manifest (left anti join; manifest is small per
    partition => broadcast)."""
    return inputs.join(F.broadcast(manifest.select(key)), on=key, how="left_anti")


def status_counts(results: DataFrame) -> DataFrame:
    """O6/O9 — TaskProcessingMeta counters: per-status doc counts and
    bytes (reference:datamodel/task_meta.py:4-8)."""
    return (
        results.groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("num_docs"),
            F.sum("n_bytes").cast("bigint").alias("bytes_processed"),
            F.sum(F.col("ocr_invoked").cast("int")).cast("bigint").alias("ocr_invocations"),
        )
    )


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_col: str = "url",
                  fp_col: str = "fingerprint") -> DataFrame:
    """(key, status, old_fp, new_fp) — incremental-crawl delta between
    two snapshot tables keyed on url: ``added`` (new only), ``removed``
    (old only), ``changed`` (both sides, fingerprint differs),
    ``unchanged``. The CDX-style diff every recrawl pipeline runs
    before deciding what to re-extract.

    One full-outer equi-join on the key — the minimum possible data
    movement for a two-sided diff. At 100 TB both snapshots live
    bucketed by url in the warehouse, so the sort-merge join needs no
    exchange at all; fingerprints (16-byte md5), never document bytes,
    are what shuffles when they aren't."""
    o = old.select(F.col(key_col).alias("__k"), F.col(fp_col).alias("old_fp"))
    n = new.select(F.col(key_col).alias("__k"), F.col(fp_col).alias("new_fp"))
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, "__k", "full_outer").select(
        F.col("__k").alias(key_col),
        status.alias("status"),
        "old_fp",
        "new_fp",
    )


def crawl_growth_report(old: DataFrame, new: DataFrame,
                        key_col: str = "url",
                        fp_col: str = "fingerprint") -> DataFrame:
    """(host, n_old, n_new, n_added, n_removed, n_changed, n_unchanged,
    churn_bp) — the host-grain crawl-over-crawl growth report: the
    snapshot_diff verdicts rolled up per host plus a churn rate
    ((added+removed+changed)/max(old,new) in bp). This is the
    between-crawls dashboard a crawl operator reads (Ntoulas/Cho/
    Olston WWW 2004 measured exactly these host-level birth/death/
    change rates): a host with high added-share is growing (X43
    should lean in), one that is mostly removed is dying or newly
    blocking us, and near-total change with stable counts is a
    template rotation (X135's delta tier, not new content).

    Pure composition over the X26 diff: its one full-outer equi-join
    remains the only wide operation; the rollup is ONE host partial
    agg over (host, status) verdict rows — document bytes never
    move."""
    diff = snapshot_diff(old, new, key_col=key_col, fp_col=fp_col)
    from docling_serve_spark.operators.urltools import url_host

    per = (
        diff.select(
            url_host(F.col(key_col)).alias("host"), F.col("status")
        )
        .groupBy("host")
        .agg(
            F.sum(F.when(F.col("status") != "added", 1).otherwise(0))
            .cast("bigint").alias("n_old"),
            F.sum(F.when(F.col("status") != "removed", 1).otherwise(0))
            .cast("bigint").alias("n_new"),
            F.sum(F.when(F.col("status") == "added", 1).otherwise(0))
            .cast("bigint").alias("n_added"),
            F.sum(F.when(F.col("status") == "removed", 1).otherwise(0))
            .cast("bigint").alias("n_removed"),
            F.sum(F.when(F.col("status") == "changed", 1).otherwise(0))
            .cast("bigint").alias("n_changed"),
            F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0))
            .cast("bigint").alias("n_unchanged"),
        )
    )
    return per.select(
        "host", "n_old", "n_new", "n_added", "n_removed", "n_changed",
        "n_unchanged",
        F.expr("(10000 * (n_added + n_removed + n_changed)) "
               "div greatest(greatest(n_old, n_new), 1)")
        .cast("bigint").alias("churn_bp"),
    ).orderBy("host")


def extract_diff(old: DataFrame, new: DataFrame,
                 key_col: str = "url",
                 type_col: str = "doc_type",
                 status_col: str = "status",
                 text_col: str = "extracted_text") -> DataFrame:
    """(doc_type, n_old, n_new, n_common, n_status_flips,
    n_text_changed, text_change_bp, sum_len_delta) — extractor A/B
    regression report: before re-extracting 10^12 documents with a new
    extractor build, run both versions over a sample and read, per
    format, how many documents flip status, how many change text, and
    the signed length drift. A format whose text_change_bp is high
    needs a golden-diff review before the fleet-wide re-extraction is
    approved (the X48 mojibake and X123 entity-residue audits are the
    per-page follow-ups); coverage changes surface as n_old ≠ n_new.

    Text comparison is by md5 fingerprint computed IN THE SCAN —
    the full-outer url join carries (url, type, status, fp, length),
    never text; one doc_type-keyed partial agg finishes it.
    `sum_len_delta` is the exact signed char delta over common urls
    (bigint; per-doc means are the reader's division to make)."""
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(key_col).alias("url"),
            F.col(type_col).alias(f"{tag}_type"),
            F.col(status_col).alias(f"{tag}_status"),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias(f"{tag}_fp"),
            F.length(F.coalesce(F.col(text_col), F.lit("")))
            .cast("bigint").alias(f"{tag}_len"),
        )
    j = side(old, "o").join(side(new, "n"), "url", "full_outer")
    common = F.col("o_fp").isNotNull() & F.col("n_fp").isNotNull()
    return (
        j.groupBy(
            F.coalesce(F.col("n_type"), F.col("o_type")).alias("doc_type")
        )
        .agg(
            F.sum(F.col("o_fp").isNotNull().cast("bigint")).cast("bigint")
            .alias("n_old"),
            F.sum(F.col("n_fp").isNotNull().cast("bigint")).cast("bigint")
            .alias("n_new"),
            F.sum(common.cast("bigint")).cast("bigint").alias("n_common"),
            F.sum((common & (F.col("o_status") != F.col("n_status")))
                  .cast("bigint")).cast("bigint").alias("n_status_flips"),
            F.sum((common & (F.col("o_fp") != F.col("n_fp")))
                  .cast("bigint")).cast("bigint").alias("n_text_changed"),
            F.sum(F.when(common, F.col("n_len") - F.col("o_len"))
                  .otherwise(0)).cast("bigint").alias("sum_len_delta"),
        )
        .select(
            "doc_type", "n_old", "n_new", "n_common", "n_status_flips",
            "n_text_changed",
            F.expr("(10000 * n_text_changed) div greatest(n_common, 1)")
            .cast("bigint").alias("text_change_bp"),
            "sum_len_delta",
        )
    )


def late_data_audit(events: DataFrame, ts_col: str = "ts",
                    arrival_col: str = "event_id",
                    shard_col: str = "shard",
                    delay_ms: int = 600_000) -> DataFrame:
    """(shard, n_events, n_late, n_dropped, max_lateness_ms) — the
    watermark design audit: replay each ingest shard in ARRIVAL order
    tracking the running event-time high-water mark; an event is LATE
    when its event time trails the mark (out-of-order but coverable by
    state), and DROPPED when it trails by more than ``delay_ms`` — the
    rows a Structured Streaming watermark of that delay would silently
    discard (the allowed-lateness trade-off of the Dataflow model,
    Akidau et al., VLDB 2015 §2.3). Pipelines pick the watermark FROM
    this table: delay_ms is a knob, max_lateness_ms is the measured
    tail, and n_dropped is the price of the knob — guessing instead
    of measuring either leaks state forever or silently loses the
    slowest crawler's data. The streaming twin
    (``streaming.ingest.late_monitor_stream``) applies the same fold
    incrementally; stream == batch by construction.

    Scale shape: one window PARTITIONED BY SHARD in arrival order
    (the per-shard sequential fold is the semantics — each ingest
    shard owns its clock) + one shard-grain rollup; timestamps fold
    as epoch-millis bigints, no floats anywhere."""
    from pyspark.sql import Window

    # events carry TIMESTAMP_NTZ; the session runs UTC, so the cast
    # to TIMESTAMP is offset-free and epoch-millis match DuckDB
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy("shard").orderBy(F.asc("__arr"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = events.select(
        F.col(shard_col).alias("shard"),
        F.col(arrival_col).alias("__arr"),
        ms.alias("__ms"),
    ).select(
        "shard", "__ms",
        F.max("__ms").over(w).alias("__hwm"),
    )
    lateness = F.when(
        F.col("__hwm").isNotNull() & (F.col("__ms") < F.col("__hwm")),
        F.col("__hwm") - F.col("__ms"),
    ).otherwise(F.lit(0))
    return (
        marked.select("shard", lateness.alias("__late_ms"))
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum((F.col("__late_ms") > 0).cast("int")).cast("bigint")
            .alias("n_late"),
            F.sum((F.col("__late_ms") > delay_ms).cast("int"))
            .cast("bigint").alias("n_dropped"),
            F.max("__late_ms").cast("bigint").alias("max_lateness_ms"),
        )
    )


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """X206-wave — weekly cohort-retention matrix over the events
    stream: users are grouped by the ISO week of their FIRST event
    (the cohort), and each cell counts distinct cohort members active
    ``week_offset`` weeks later — the §2.9 witness for the
    self-referential fact-table shape (derive a per-entity anchor
    aggregate, join it back, re-aggregate on the derived key) that
    every engagement/freshness dashboard runs.

    Emits (cohort_week date, week_offset int, n_users bigint).
    Week alignment is date_trunc('week') — ISO Monday in both
    engines — and the offset is exact integer arithmetic on the two
    Monday-aligned dates, so no float discipline is needed.

    Shape at scale: one hash aggregation for the per-user anchor
    (map-side combine on user_id), one shuffle join back on user_id
    (AQE broadcasts the anchor side only when genuinely small), one
    final aggregation on the (cohort, offset) grid — whose
    cardinality is weeks², driver-tiny regardless of corpus size."""
    first = events.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    return (
        events.select(
            F.col(user_col).alias("u"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("wk"),
        )
        .join(first, "u")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("u").cast("bigint").alias("n_users"))
    )


def key_skew_audit(df: DataFrame, key_col: str = "key") -> DataFrame:
    """X212 — pre-flight shuffle-skew diagnostics for a planned
    join/aggregation key: one row of key-distribution shape — row and
    key counts, the hottest key's row share, order-statistic bucket
    sizes (p50/p90/p99), and the Gini coefficient of rows-per-key.
    At 100 TB this is the query you run BEFORE keying a shuffle: a
    top_share_ppm near 1e6 or a p99/p50 ratio in the thousands says
    the join needs salting/AQE-skew handling, and measuring it costs
    one aggregation instead of one blown stage.

    Exactness: everything is integer until the final ppm ratios. The
    Gini rank-sum B = Σ rank_i·c_i is computed WITHOUT sorting
    individual keys: keys are first collapsed to (bucket_size c,
    n_keys m) — distinct bucket sizes ≪ keys — and each group
    contributes its arithmetic-series rank sum m·prev + m(m+1)/2
    exactly. Percentiles are ceil-rank order statistics (conditional
    min over the cumulative key count), not interpolated. The final
    ratios divide exact int64 sums in double (exact below 2^53; at
    cluster scale lift the three sums to DECIMAL(38,0) — same plan).

    Shape at scale: rows → one hash agg (key grain, map-side combine)
    → second agg to (c, m) grain (thousands of rows at most) → one
    tiny window over bucket-size values → 1-row aggregate. The only
    corpus-scale exchange is the first groupBy — the very shuffle
    being audited, but counting is skew-tolerant (a hot key is one
    combiner cell, not one reducer's row set)."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    byval = counts.groupBy("c").agg(F.count("*").cast("bigint").alias("m"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = byval.withColumn("cum_keys", F.sum("m").over(w)).withColumn(
        "prev_keys", F.col("cum_keys") - F.col("m")
    )
    # m(m+1) is always even, so `div 2` is exact integer arithmetic
    grp_rank_sum = F.col("c") * (
        F.col("m") * F.col("prev_keys")
        + F.expr("(m * (m + 1)) div 2").cast("bigint")
    )
    tot = cum.agg(
        F.sum(F.col("c") * F.col("m")).cast("bigint").alias("n_rows"),
        F.sum("m").cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_c"),
        F.sum(grp_rank_sum).cast("bigint").alias("b_rank_sum"),
    )
    pctl = cum.crossJoin(F.broadcast(tot)).agg(
        *[
            F.min(
                F.when(F.col("cum_keys") * 100 >= q * F.col("n_keys"),
                       F.col("c"))
            ).cast("bigint").alias(f"p{q}_bucket")
            for q in (50, 90, 99)
        ]
    )
    gini = (
        F.lit(1_000_000.0)
        * (2.0 * F.col("b_rank_sum")
           - (F.col("n_keys") + 1).cast("double") * F.col("n_rows"))
        / (F.col("n_keys").cast("double") * F.col("n_rows"))
    )
    return (
        tot.crossJoin(F.broadcast(pctl))
        .select(
            "n_rows",
            "n_keys",
            F.expr("(1000000 * max_c) div n_rows").cast("bigint")
            .alias("top_share_ppm"),
            "p50_bucket",
            "p90_bucket",
            "p99_bucket",
            F.floor(gini).cast("bigint").alias("gini_ppm"),
        )
    )


def event_funnel(events: DataFrame,
                 steps: tuple[str, str, str] = ("view", "click", "purchase"),
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """X214 — ordered three-step funnel over the events stream: users
    whose first step-1 event is STRICTLY followed in time by a step-2
    event, strictly followed by a step-3 event (the classic ordered
    conversion, not mere co-occurrence). Emits one row: per-stage
    user counts and exact ppm conversion ratios.

    Semantics pinned for determinism: each stage anchors on the MIN
    timestamp of the qualifying events (first-touch), and "after"
    is strict ts inequality — simultaneous events do not chain.

    Shape at scale: three filtered aggregations at user grain
    (map-side combine) + two user-keyed equi-joins (AQE broadcasts
    the shrinking funnel side — stage tables only lose users as the
    funnel narrows); the final counts are 1-row aggregates. No
    windows over the raw stream, no per-user event sorting."""
    u, t = F.col(user_col), F.col(ts_col)
    s1 = events.filter(F.col(type_col) == steps[0]).groupBy(
        u.alias("u")).agg(F.min(t).alias("t1"))
    s2 = (
        events.filter(F.col(type_col) == steps[1])
        .join(s1, events[user_col] == s1.u)
        .filter(t > F.col("t1"))
        .groupBy("u").agg(F.min(t).alias("t2"))
    )
    s3 = (
        events.filter(F.col(type_col) == steps[2])
        .join(s2, events[user_col] == s2.u)
        .filter(t > F.col("t2"))
        .groupBy("u").agg(F.min(t).alias("t3"))
    )
    n1 = s1.agg(F.count("*").cast("bigint").alias("n_step1"))
    n2 = s2.agg(F.count("*").cast("bigint").alias("n_step2"))
    n3 = s3.agg(F.count("*").cast("bigint").alias("n_step3"))
    return (
        n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(n3))
        .select(
            "n_step1", "n_step2", "n_step3",
            F.expr("(1000000 * n_step2) div greatest(n_step1, 1)")
            .cast("bigint").alias("conv12_ppm"),
            F.expr("(1000000 * n_step3) div greatest(n_step2, 1)")
            .cast("bigint").alias("conv23_ppm"),
        )
    )


def salted_counts(df: DataFrame, key_col: str, salt_col,
                  n_salts: int = 8) -> DataFrame:
    """X215 — skew-immune per-key counting via explicit two-phase
    salting: rows first aggregate on (key, salt) — splitting a hot
    key across ``n_salts`` reducers — then the salted partials
    collapse to the true per-key counts. The RESULT is identical to
    a plain groupBy (the oracle is literally ``GROUP BY key``); what
    changes is the physical shape: no single reducer ever owns a hot
    key's full row set, the property that keeps a 3/4-of-the-corpus
    hub key from stalling the stage at 10^12 rows. ``salt_col`` must
    be a deterministic column expression (never rand() — results
    must be partition-invariant and re-runnable).

    Emits (key, n_rows). For count-like (commutative, re-aggregable)
    metrics the pattern generalizes to sums/mins/HLL-style sketches;
    non-decomposable aggregates need the X23 two-phase quota shape
    instead."""
    partial = df.groupBy(
        F.col(key_col).alias("key"),
        (salt_col % n_salts).alias("__salt"),
    ).agg(F.count("*").cast("bigint").alias("__partial"))
    return partial.groupBy("key").agg(
        F.sum("__partial").cast("bigint").alias("n_rows")
    )


def table_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """X236 — ANALYZE-style per-column statistics in ONE pass: row
    count, null count, distinct count, min/max (as strings, for a
    uniform schema across types) for each requested column — the
    stats a cost-based optimizer (and every human debugging a join
    plan) needs, and the lakehouse ANALYZE TABLE surface. At 100 TB
    you run this once per snapshot and store it next to the table;
    join planning, skew triage (pair with X212) and partition-count
    choices all read it instead of re-scanning.

    Exactness: counts are exact bigints (one aggregation with
    map-side combine — count_distinct is the expensive leg; swap in
    the X218 HLL registers per column for the sketch form at scale);
    min/max stringified AFTER the aggregate. One row per column via
    an explicit unpivot of the single aggregate row — no per-column
    scans."""
    cols = columns if columns is not None else df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).cast("bigint").alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(F.count("*").cast("bigint").alias("__n"), *aggs)
    structs = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).cast("bigint")
            .alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in cols
    ])
    return one.select(F.explode(structs).alias("s")).select("s.*")


def exact_kth_bisect(df: DataFrame, value_col, k: int | None = None,
                     fanout: int = 64) -> tuple[int, int]:
    """X238 — EXACT k-th smallest (1-based) of an integer column by
    m-way bisection on the VALUE DOMAIN: each round ONE pass computes
    count(<= p) for ``fanout`` evenly-spaced pivots as conditional
    sums, shrinking the bracket by ~fanout× — ceil(log_fanout(range))
    ≈ 4-6 rounds total for any int64 domain, versus the global sort
    (the single most expensive shape in Spark) or ~40 rounds of
    binary search paying per-job scheduling each time. This is how an
    exact median of 10^12 rows is actually taken.

    Selection invariant: the answer is the smallest v with
    count(<= v) >= k; the bracket [lo, hi] always contains it, and
    once the span is <= fanout the round enumerates every integer in
    the bracket so the loop terminates exactly. Python // floors, so
    negative domains work.

    Returns (kth_value, n_rows) as driver ints — the LOOP is
    O(log range) driver iterations by design, each a full distributed
    pass over the persisted single column (ALWAYS unpersisted — the
    round-4 cache-leak lesson)."""
    vals = df.select(value_col.cast("bigint").alias("v")).where(
        F.col("v").isNotNull()
    ).persist()
    try:
        row = vals.agg(
            F.count("*").alias("n"), F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        ).collect()[0]
        n, lo, hi = row.n, row.lo, row.hi
        if n == 0:
            raise ValueError("exact_kth_bisect on an empty column")
        if k is None:
            k = (n + 1) // 2  # lower median, no separate count pass
        if not 1 <= k <= n:
            raise ValueError(f"k={k} outside 1..{n}")
        while lo < hi:
            span = hi - lo
            if span <= fanout:
                pivots = list(range(lo, hi))
            else:
                pivots = sorted({lo + (span * i) // fanout
                                 for i in range(1, fanout)})
            counts = vals.agg(*[
                F.sum((F.col("v") <= p).cast("bigint")).alias(f"c{i}")
                for i, p in enumerate(pivots)
            ]).collect()[0]
            new_lo, new_hi = lo, hi
            for i, p in enumerate(pivots):
                if counts[i] >= k:
                    new_hi = p
                    if i > 0:
                        new_lo = pivots[i - 1] + 1
                    break
            else:
                new_lo = pivots[-1] + 1
            lo, hi = new_lo, new_hi
        return int(lo), int(n)
    finally:
        vals.unpersist()

