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
