"""Crawl-frontier selection: which URLs to (re)crawl next.

A crawler's scheduler ranks candidate URLs by expected value and
politeness (Cho, Garcia-Molina & Page, WWW 1998 "Efficient crawling
through URL ordering"): page importance comes from the host graph
(PageRank, X39), recency pressure from the snapshot diff (X26 —
`added` pages have never been fetched, `changed` pages go stale,
`unchanged` pages can wait), and robots.txt compliance (X38) is a hard
gate. This operator is the decision step that consumes those three
signals and emits the next crawl batch.

Integer-exactness: priority = status_weight × host rank_nano, both
bigints (weights 4/3/1 for added/changed/unchanged; `removed` and
robots-disallowed candidates are excluded before any ranking), so the
selection is bit-reproducible across engines and partitionings; all
ties break on ascending url.

Scale shape: candidates filter first (the hard gates kill rows before
anything moves), then ONE equi-join on host against the rank table
(hosts ≪ pages — AQE broadcasts it when it fits); the politeness cap
is a per-host window over already-filtered candidates (per-host
candidate counts are crawl-bounded, and a mega-host is exactly what
the cap truncates); the global batch cut is orderBy+limit —
TakeOrderedAndProject, never a full sort. URL strings are the widest
thing that ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: status → priority weight; `removed` is absent on purpose (a removed
#: url is not a crawl candidate).
STATUS_WEIGHTS = {"added": 4, "changed": 3, "unchanged": 1}


def frontier_select(candidates: DataFrame, host_ranks: DataFrame,
                    batch_size: int = 100, per_host_cap: int = 3) -> DataFrame:
    """(url, host, status, priority_nano, host_pos, rank) — the next
    crawl batch: the ``batch_size`` highest-priority candidate urls,
    at most ``per_host_cap`` per host (politeness).

    ``candidates`` is (url, host, status, crawl_allowed) — the output
    shape of snapshot_diff (X26) joined with robots_filter (X38);
    ``host_ranks`` is (host, rank_nano) — host_pagerank (X39) output.
    A candidate whose host has no rank row gets rank_nano = 0 (a
    never-seen host: still eligible, lowest importance tier, ordered
    among its peers by status then url)."""
    weight = F.lit(None).cast("bigint")
    for status, w in STATUS_WEIGHTS.items():
        weight = F.when(F.col("status") == status, F.lit(w)).otherwise(weight)
    eligible = (
        candidates.filter(
            F.col("crawl_allowed") & F.col("status").isin(*STATUS_WEIGHTS)
        )
        .join(host_ranks.select("host", "rank_nano"), "host", "left")
        .select(
            "url", "host", "status",
            (weight * F.coalesce(F.col("rank_nano"), F.lit(0)) + weight)
            .cast("bigint").alias("priority_nano"),
        )
    )
    w_host = Window.partitionBy("host").orderBy(
        F.col("priority_nano").desc(), F.col("url").asc()
    )
    capped = (
        eligible.withColumn("host_pos", F.row_number().over(w_host).cast("int"))
        .filter(F.col("host_pos") <= per_host_cap)
    )
    top = capped.orderBy(
        F.col("priority_nano").desc(), F.col("url").asc()
    ).limit(batch_size)
    w_all = Window.orderBy(F.col("priority_nano").desc(), F.col("url").asc())
    return top.withColumn("rank", F.row_number().over(w_all).cast("int"))


def schedule_fetches(batch: DataFrame, n_fetchers: int = 64,
                     default_delay_ms: int = 1000,
                     delays: DataFrame | None = None) -> DataFrame:
    """(url, host, fetcher, fetch_seq, fetch_at_ms) — turn a selected
    crawl batch (X43's output shape: url, host, and a priority order)
    into an executable fetch schedule. Two politeness invariants every
    crawler enforces (RFC 9309 crawl-delay; Heritrix's 'one queue per
    host' design):

    - ALL of a host's urls go to ONE fetcher — `fetcher` is the
      48-bit md5 of the host mod ``n_fetchers`` (the deterministic
      cross-engine string hash used for split_assign), so per-host
      spacing can be enforced fetcher-locally with no coordination;
    - within a host, urls are spaced ``delay_ms`` apart:
      ``fetch_at_ms = fetch_seq * delay_ms`` with ``fetch_seq`` the
      0-based per-host position in (priority desc, url) order —
      pure integer arithmetic, bit-reproducible.

    ``delays`` optionally overrides the per-host delay (host,
    delay_ms) — what a robots.txt crawl-delay fetch pass emits; hosts
    without a row use ``default_delay_ms``.

    Scale shape: one left equi-join on host (delays ≪ batch,
    AQE-broadcast), one per-host window over the already-selected
    batch (bounded by X43's per-host cap), zero global sorts."""
    from docling_serve_spark.operators.sampling import md5_hash48

    w = Window.partitionBy("host").orderBy(
        F.col("priority_nano").desc(), F.col("url").asc()
    )
    b = batch.select("url", "host", "priority_nano")
    if delays is not None:
        b = b.join(delays.select("host", "delay_ms"), "host", "left")
        delay = F.coalesce(F.col("delay_ms"), F.lit(default_delay_ms))
    else:
        delay = F.lit(default_delay_ms)
    return b.select(
        "url", "host",
        F.pmod(md5_hash48(F.col("host")), F.lit(n_fetchers))
        .cast("int").alias("fetcher"),
        (F.row_number().over(w) - 1).cast("int").alias("fetch_seq"),
        ((F.row_number().over(w) - 1) * delay).cast("bigint")
        .alias("fetch_at_ms"),
    )


def politeness_audit(fetches: DataFrame, delays: DataFrame,
                     host_col: str = "host", ts_col: str = "ts_ms",
                     delay_col: str = "delay_ms",
                     default_delay_ms: int = 1000) -> DataFrame:
    """(host, n_fetches, min_gap_ms, delay_ms, n_violations,
    violation_bp) — post-hoc compliance audit of a fetch log against
    per-host crawl-delay policy (RFC 9309 + the de-facto Crawl-delay
    directive X70 extracts): a violation is a consecutive same-host
    fetch gap shorter than the host's declared delay. Crawl operators
    run exactly this before/after fetcher changes — a polite-by-
    construction scheduler (X53) still violates in practice through
    retries, redirects and multi-fetcher races, and sustained
    violations get a crawler blocked at the CDN tier.

    Hosts absent from the delay table audit against
    ``default_delay_ms``. Gaps order by (ts, ts-tiebreak on nothing
    else needed — equal timestamps produce a 0 gap, which is counted
    as a violation for any positive delay, deterministically).

    Scale shape: one per-host window (partition-local sort of that
    host's fetch times) + one partial-agg groupBy + one host
    equi-join against the tiny delay table (AQE-broadcast); only
    (host, ts) pairs shuffle. Integer ms and bigint-div bp."""
    w = Window.partitionBy("host").orderBy("ts")
    d = delays.select(
        F.col(host_col).alias("host"),
        F.col(delay_col).cast("bigint").alias("delay_ms"),
    )
    gaps = (
        fetches.select(
            F.col(host_col).alias("host"), F.col(ts_col).alias("ts")
        )
        .join(d, "host", "left")
        .withColumn(
            "delay_ms",
            F.coalesce(F.col("delay_ms"), F.lit(default_delay_ms))
            .cast("bigint"),
        )
        .withColumn("gap_ms", F.col("ts") - F.lag("ts").over(w))
    )
    return gaps.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_fetches"),
        F.min("gap_ms").cast("bigint").alias("min_gap_ms"),
        F.min("delay_ms").alias("delay_ms"),  # constant per host
        F.sum(
            F.when(
                F.col("gap_ms").isNotNull()
                & (F.col("gap_ms") < F.col("delay_ms")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_violations"),
    ).select(
        "host", "n_fetches", "min_gap_ms", "delay_ms", "n_violations",
        F.expr("(10000 * n_violations) div greatest(n_fetches - 1, 1)")
        .cast("bigint").alias("violation_bp"),
    )


def schedule_audit(schedule: DataFrame) -> DataFrame:
    """(fetcher, n_urls, n_hosts, makespan_ms, load_bp, imbalance_bp)
    — capacity audit of an X53 fetch schedule: per-fetcher URL count,
    host count, and makespan (the last fetch_at_ms — how long that
    fetcher's queue runs), plus each fetcher's share of total work and
    the spread between the busiest and idlest fetcher. This is the
    other half of the politeness design: X53 guarantees a host never
    exceeds its delay budget and X95 audits that guarantee, but host-
    affinity hashing can still land several crawl-delay-heavy hosts on
    ONE fetcher whose makespan then dominates the whole wave —
    imbalance_bp is the number that says "add fetchers" (or "re-salt
    the affinity hash") BEFORE the wave runs, not after it straggles.

    Pure bigint: load_bp = (10000·n_urls) div total_urls;
    imbalance_bp = (10000·(max_makespan − min_makespan)) div
    max(makespan). Scale shape: one partial-agg groupBy on the fetcher
    key (≤ n_fetchers groups), then single-partition windows over the
    ≤ n_fetchers rows — nothing downstream of the rollup is
    proportional to batch size."""
    per = schedule.groupBy("fetcher").agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.countDistinct("host").cast("bigint").alias("n_hosts"),
        F.max("fetch_at_ms").cast("bigint").alias("makespan_ms"),
    )
    w = Window.partitionBy()
    return (
        per.withColumn("__total", F.sum("n_urls").over(w))
        .withColumn("__max_ms", F.max("makespan_ms").over(w))
        .withColumn("__min_ms", F.min("makespan_ms").over(w))
        .select(
            F.col("fetcher").cast("int").alias("fetcher"),
            "n_urls", "n_hosts", "makespan_ms",
            F.expr("(10000 * n_urls) div greatest(__total, 1)")
            .cast("bigint").alias("load_bp"),
            F.expr("(10000 * (__max_ms - __min_ms)) "
                   "div greatest(__max_ms, 1)")
            .cast("bigint").alias("imbalance_bp"),
        )
    )


def apportion_budget(weights: DataFrame, budget: int,
                     key_col: str = "host",
                     weight_col: str = "weight") -> DataFrame:
    """(host, weight, base_quota, extra, quota) — Hamilton largest-
    remainder apportionment of an integer fetch budget over weighted
    hosts: ``base = (B·w) div W`` and the ``B − Σbase`` leftover slots
    go to the largest remainders (ties on key). The apportionment
    every crawl scheduler needs between X53's politeness pacing and
    X23's hard caps: quotas are integers, sum EXACTLY to the budget,
    and are bit-reproducible — proportional-share floats never sum
    right and round differently per engine. Same machinery serves
    stratified eval-set allocation (quota sampling with exact seat
    counts).

    Scale shape: weights aggregate to TWO driver scalars (total, base
    sum — bounded collects); the leftover winners come from ONE
    TakeOrderedAndProject over (remainder desc, key) — leftover <
    n_hosts by construction, never a global sort; winners join back
    as a broadcast semi-side. Headroom: B·w must stay under 2^63 —
    callers keep weights in bp/milli scales (documented bound:
    B ≤ 10^9 with w ≤ 10^9)."""
    b = int(budget)
    w = F.col(weight_col).cast("bigint")
    tot = weights.agg(F.sum(w).alias("t")).collect()[0]["t"] or 1
    scored = weights.select(
        F.col(key_col).alias("host"),
        w.alias("weight"),
        F.expr(f"({b} * CAST({weight_col} AS BIGINT)) div {tot}")
        .cast("bigint").alias("base_quota"),
        F.expr(f"({b} * CAST({weight_col} AS BIGINT)) % {tot}")
        .cast("bigint").alias("rem"),
    )
    leftover = b - (scored.agg(F.sum("base_quota").alias("s"))
                    .collect()[0]["s"] or 0)
    winners = (
        scored.orderBy(F.col("rem").desc(), F.col("host").asc())
        .limit(int(leftover))
        .select("host", F.lit(1).cast("bigint").alias("extra"))
    )
    return (
        scored.join(F.broadcast(winners), "host", "left")
        .select(
            "host", "weight", "base_quota",
            F.coalesce(F.col("extra"), F.lit(0)).cast("bigint")
            .alias("extra"),
            (F.col("base_quota")
             + F.coalesce(F.col("extra"), F.lit(0))).cast("bigint")
            .alias("quota"),
        )
        .orderBy("host")
    )


def politeness_gate(fetches: DataFrame, delay_ms: int = 1000) -> DataFrame:
    """(host, url, ts, allowed) — batch twin of the streaming
    politeness gate (`streaming/ingest.py:politeness_stream`): admit a
    fetch iff ≥ ``delay_ms`` since the host's last ADMITTED fetch.
    The decision depends on the previous admitted row — a sequential
    fold no window expresses — so this is the sanctioned Arrow path:
    one `applyInPandas` per host over (host, url, ts) rows only (the
    group payload is three narrow columns; per-host row counts are
    bounded by the frontier batch, the same grain X43 caps).
    Stream == batch on any ts-ordered batch split (pinned by test)."""
    def fn(pdf):
        # (ts, url) order: url breaks timestamp ties, so the fold —
        # and therefore WHICH of two same-instant fetches is admitted
        # — is deterministic under any partitioning / arrival order
        # (the stream twin and the DuckDB oracle sort the same way)
        pdf = pdf.sort_values(["ts", "url"], kind="stable")
        last = None
        allowed = []
        for ts in pdf["ts"]:
            ts = int(ts)
            ok = last is None or ts - last >= delay_ms
            if ok:
                last = ts
            allowed.append(ok)
        out = pdf[["host", "url", "ts"]].copy()
        out["allowed"] = allowed
        return out

    return fetches.select("host", "url", F.col("ts").cast("bigint")) \
        .groupBy("host").applyInPandas(
            fn, schema="host string, url string, ts bigint, allowed boolean"
        )


def allocation_fairness(alloc: DataFrame, key_col: str = "host",
                        value_col: str = "n_fetches") -> DataFrame:
    """(n_keys, total, gini_bp, top_decile_share_bp, max_share_bp) —
    Gini concentration of a crawl allocation (fetch slots per host,
    budget per source). A scheduler can satisfy every per-host
    politeness constraint and still starve the long tail; the Gini
    coefficient is the standard single-number inequality audit
    (G = (2Σ i·x_(i) − (n+1)Σx) / (nΣx) over ascending-sorted
    allocations — the rank-covariance form), with the top decile's
    share as the interpretable companion. Read it next to X141's
    apportionment and X95's politeness audit: fairness is the third
    axis (capacity, compliance, concentration).

    Scale shape: input is KEY-grain (hosts/sources ≪ pages — the same
    cardinality argument as the webgraph tier), so the one global
    ascending sort the rank form needs is a deliberately accepted
    single-partition window over a host-cardinality table; every
    page-grain reduction happens BEFORE this operator. Integer-exact:
    all sums bigint, gini_bp = (10000·(2A − (n+1)T)) div (nT),
    ties broken by key so ranks are deterministic."""
    ranked = (
        alloc.select(
            F.col(key_col).alias("k"),
            F.col(value_col).cast("bigint").alias("x"),
        )
        .withColumn(
            "i",
            F.row_number().over(Window.orderBy(F.asc("x"), F.asc("k")))
            .cast("bigint"),
        )
        .localCheckpoint(eager=True)  # ranked twice below; rank once
    )
    stats = ranked.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("x").cast("bigint").alias("total"),
        F.sum(F.col("i") * F.col("x")).cast("bigint").alias("__a"),
        F.max("x").cast("bigint").alias("__mx"),
    )
    top = (
        ranked.crossJoin(F.broadcast(stats.select("n_keys")))
        .filter(F.col("i") > F.col("n_keys")
                - F.expr("(n_keys + 9) div 10"))
        .agg(F.coalesce(F.sum("x"), F.lit(0)).cast("bigint")
             .alias("__top"))
    )
    return (
        stats.crossJoin(F.broadcast(top))
        .select(
            "n_keys", "total",
            F.expr(
                "(10000 * (2 * __a - (n_keys + 1) * total)) div "
                "(n_keys * total)"
            ).cast("bigint").alias("gini_bp"),
            F.expr("(10000 * __top) div total").cast("bigint")
            .alias("top_decile_share_bp"),
            F.expr("(10000 * __mx) div total").cast("bigint")
            .alias("max_share_bp"),
        )
    )
