"""Mirror-site detection: host pairs serving largely identical
content.

Web corpora are full of mirrors — software archives, documentation
replicas, CDNs fronting the same origin, wholesale site clones — and
doc-level dedup alone leaves the navigation/listing pages and near-
boilerplate of each replica behind. Detecting the HOST pair lets the
pipeline drop (or downweight) entire replicas and lets the crawler
stop fetching them. The classic formulation is Bharat & Broder (WWW
1999, "A comparison of techniques to find mirrored hosts on the
WWW"): represent each host by the set of its pages' content
fingerprints and score host pairs by fingerprint overlap.

Shape: (fingerprint → host) distinct postings, self-join WITHIN a
fingerprint group to emit host pairs (src < dst so each unordered
pair appears once), partial-agg count of shared fingerprints, join
per-host distinct-fingerprint counts, and an integer-exact overlap
rule `shared * 100 ≥ pct * min(n_a, n_b)` — containment, so a small
full replica of a large site still flags.

Skew/scale: the one dangerous key is a fingerprint shared by MANY
hosts (the empty page, a boilerplate 404 — the web's stopwords): a
fingerprint on h hosts emits O(h²) pairs. Standard fix, same as the
Jaccard df-cap: drop fingerprints appearing on more than
``max_hosts_per_fp`` hosts before pairing — they carry no mirror
signal (Bharat & Broder likewise weight down ubiquitous shingles).
With the cap, pair fan-out per fingerprint is bounded by a constant²,
the self-join is an equi-join on the fingerprint key, and everything
downstream is partial-agg groupBys on (src, dst) host pairs —
hosts² never materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def detect_mirrors(pages: DataFrame, host_col: str = "host",
                   fp_col: str = "fingerprint",
                   min_shared: int = 2, overlap_pct: int = 80,
                   max_hosts_per_fp: int = 16) -> DataFrame:
    """(src, dst, n_shared, n_src, n_dst, is_mirror) — candidate
    mirror pairs (src < dst): hosts sharing ≥ ``min_shared`` distinct
    content fingerprints, flagged when the shared count covers ≥
    ``overlap_pct``% of the SMALLER host's distinct fingerprints
    (containment — a partial mirror of a large site still flags).
    Fingerprints on more than ``max_hosts_per_fp`` hosts are dropped
    before pairing (no mirror signal, quadratic fan-out)."""
    post = pages.select(host_col, fp_col).distinct()
    per_host = post.groupBy(host_col).agg(
        F.count("*").cast("bigint").alias("n_fp")
    )
    hosts_per_fp = post.groupBy(fp_col).agg(
        F.count("*").cast("bigint").alias("n_hosts")
    )
    kept = post.join(
        hosts_per_fp.filter(F.col("n_hosts") <= max_hosts_per_fp), fp_col
    ).select(host_col, fp_col)
    a = kept.select(F.col(fp_col).alias("fp"), F.col(host_col).alias("src"))
    b = kept.select(F.col(fp_col).alias("fp"), F.col(host_col).alias("dst"))
    shared = (
        a.join(b, "fp")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    na = per_host.select(F.col(host_col).alias("src"),
                         F.col("n_fp").alias("n_src"))
    nb = per_host.select(F.col(host_col).alias("dst"),
                         F.col("n_fp").alias("n_dst"))
    return (
        shared.join(na, "src").join(nb, "dst")
        .select(
            "src", "dst", "n_shared", "n_src", "n_dst",
            (
                F.col("n_shared") * 100
                >= F.lit(overlap_pct) * F.least("n_src", "n_dst")
            ).alias("is_mirror"),
        )
    )
