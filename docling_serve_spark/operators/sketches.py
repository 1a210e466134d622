"""Bounded-size cardinality sketches for corpus statistics.

A 100 TB corpus team constantly asks "how many distinct X per Y" —
distinct tokens per host (vocabulary growth), distinct urls per
domain, distinct shingles per source — where the exact answer is a
giant shuffle of the distinct values themselves. A K-Minimum-Values
synopsis (Bar-Yossef et al., RANDOM 2002; Beyer, Haas, Reinwald,
Sismanis & Gemulla, "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD 2007) keeps only the k smallest hash
values per group and estimates n ≈ (k-1)/h_(k) for uniform hashes on
[0,1); unlike HyperLogLog it is exact below k, mergeable by taking
the k smallest of a union, and — built on a DETERMINISTIC hash —
bit-reproducible across engines and partitionings (the property every
oracle in this repo rides; probabilistic-register sketches are not).

Reference anchor: the reference counts corpus-level distincts
driver-side (docling_serve/datamodel/results.py aggregates per-batch
counters); at crawl scale the synopsis replaces the exact pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from docling_serve_spark.operators.sampling import md5_hash48

#: hash domain: md5_hash48 is uniform on [0, 2^48)
_KMV_DOMAIN = 1 << 48


def kmv_distinct(items: DataFrame, group_col: str, item_col: str,
                 k: int = 32) -> DataFrame:
    """(group, n_kept, kth_hash, est_distinct) — KMV distinct-count
    synopsis per group over STRING items.

    est = ((k-1) << 48) div h_(k) when the group carries ≥ k distinct
    items (the Beyer et al. unbiased estimator in pure int64 —
    (k-1)·2^48 ≤ 2^54 for k ≤ 64, six decades of headroom), else the
    kept count is already exact and ``kth_hash`` is NULL. 48-bit
    collisions merge two distinct items into one hash slot
    (n·2^-48 relative bias — invisible below 10^12 distincts).

    Scale shape: one distinct on (group, item) — the same shuffle any
    exact count pays ONCE — then a per-group rank over hash values and
    a k-row-per-group aggregate; the synopsis (k bigints per group) is
    what ships to the driver/warehouse, and two crawls' synopses merge
    by re-ranking their union, never re-reading pages."""
    hashed = (
        items.select(F.col(group_col).alias("grp"),
                     F.col(item_col).alias("it"))
        .where(F.col("it").isNotNull())
        .distinct()
        .select("grp", md5_hash48(F.col("it")).alias("h"))
    )
    w = Window.partitionBy("grp").orderBy("h")
    kept = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    agg = kept.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.max("h").cast("bigint").alias("max_h"),
    )
    full = F.col("n_kept") >= k
    return agg.select(
        F.col("grp").alias(group_col),
        "n_kept",
        F.when(full, F.col("max_h")).cast("bigint").alias("kth_hash"),
        F.when(
            full,
            F.expr(f"CAST({(k - 1) * _KMV_DOMAIN} AS BIGINT) "
                   "div greatest(max_h, 1)"),
        ).otherwise(F.col("n_kept")).cast("bigint").alias("est_distinct"),
    )


def host_vocab_sketch(docs: DataFrame, text_col: str = "text",
                      host_col: str = "host", k: int = 32) -> DataFrame:
    """Per-host distinct-token estimate: tokenize, explode, KMV. The
    vocabulary-growth signal source teams track per host (template
    farms have tiny vocabularies at huge page counts)."""
    toks = docs.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    return kmv_distinct(toks, "host", "tok", k=k)


# ----------------------------------------------------------------- #
# Bloom filter — the crawler's seen-URL membership structure
# ----------------------------------------------------------------- #

def _bloom_positions(col, m_bits: int, k: int) -> list:
    """k bit positions from disjoint 40-bit md5 hex slices (mod m).
    md5's 32 hex chars give three independent 10-char slices — k ≤ 3.
    Same engine-portable hash family as md5_hash48."""
    if not 1 <= k <= 3:
        raise ValueError("k must be 1..3 (three disjoint md5 slices)")
    return [
        (F.conv(F.substring(F.md5(col), 1 + 10 * j, 10), 16, 10)
         .cast("bigint") % m_bits)
        for j in range(k)
    ]


def bloom_build(items: DataFrame, item_col: str = "url",
                m_bits: int = 1 << 16, k: int = 3) -> DataFrame:
    """(word_idx, word) — the set words of an m-bit Bloom filter over
    the items (Bloom, CACM 1970): the frontier's seen-URL test, the
    structure that answers "have we ever fetched this?" in O(k) bit
    probes without shipping the url strings anywhere. False positives
    at rate ≈ (1 − e^(−k·n/m))^k, NEVER false negatives — a crawl may
    skip a few never-seen urls, it will never refetch a seen one.

    Words are 63-bit (word_idx = bit div 63, mask = 1 << (bit mod 63))
    so no mask ever touches the int64 sign bit — DuckDB raises on
    1::BIGINT << 63 where Spark would wrap, and the positive-only
    domain sidesteps the divergence. Build is one narrow explode +
    ONE bit_or groupBy on word_idx — the filter materializes as at
    most m/63 bigint rows (a 2^30-bit filter ≈ 17 M rows ≈ 136 MB,
    broadcastable), and two crawls' filters merge by bit_or-ing their
    word tables. Deterministic md5 slices ⇒ bit-reproducible."""
    pos = _bloom_positions(F.col(item_col), m_bits, k)
    bits = items.select(
        F.explode(F.array(*pos)).alias("bit")
    )
    return (
        bits.select(
            F.expr("bit div 63").cast("bigint").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 63 AS INT))")
            .alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").cast("bigint").alias("word"))
    )


def bloom_probe(words: DataFrame, candidates: DataFrame,
                item_col: str = "url", m_bits: int = 1 << 16,
                k: int = 3) -> DataFrame:
    """(item, maybe_seen) — membership probes against a built filter:
    ``maybe_seen`` is true iff ALL k bits are set (false ⇒ definitely
    never inserted; true ⇒ seen, up to the filter's false-positive
    rate). One narrow explode of the candidates' (word_idx, mask)
    pairs, one equi-join against the (tiny, broadcastable) word
    table, one bool_and groupBy per item."""
    pos = _bloom_positions(F.col(item_col), m_bits, k)
    cand = candidates.select(
        F.col(item_col).alias("item"),
        F.explode(F.array(*pos)).alias("bit"),
    ).select(
        "item",
        F.expr("bit div 63").cast("bigint").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 63 AS INT))")
        .alias("mask"),
    )
    probed = cand.join(F.broadcast(words), "word_idx", "left").select(
        "item",
        (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask"))
         == F.col("mask")).alias("bit_set"),
    )
    return probed.groupBy("item").agg(
        F.bool_and("bit_set").alias("maybe_seen")
    )


# ----------------------------------------------------------------- #
# Count-min sketch — bounded-memory frequency estimation
# ----------------------------------------------------------------- #

def cms_build(items: DataFrame, item_col: str, d: int = 3,
              w: int = 1 << 12) -> DataFrame:
    """(row, idx, cnt) — a d×w count-min sketch (Cormode &
    Muthukrishnan, J. Algorithms 2005) over the items: the frequency
    twin of the KMV cardinality synopsis. Token/url/host frequency
    questions ("how often does this phrase template appear?") answer
    from d·w counters instead of a full-vocabulary groupBy whose tail
    is billions of hapax rows; the estimate ``min_r cnt[r][h_r(x)]``
    NEVER underestimates (every true occurrence landed in every row),
    overestimates only by collision mass ≤ 2·N/w with prob ≥ 1−2^−d.

    Row hashes are the engine-portable md5 slices: row r uses hex
    chars [1+10r, 10+10r) of ``md5(item || '#r')`` — salting the
    INPUT keeps rows independent even though md5 is one function.
    Build is one explode to (row, idx) + ONE partial-agg groupBy
    (≤ d·w result rows — broadcastable); two sketches merge by
    summing counters. Deterministic ⇒ bit-reproducible."""
    if not 1 <= d <= 3:
        raise ValueError("d must be 1..3 (three disjoint md5 slices)")
    cells = items.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.col(item_col),
                                               F.lit(f"#{r}"))),
                                1 + 10 * r, 10,
                            ),
                            16, 10,
                        ).cast("bigint") % w
                    ).alias("idx"),
                )
                for r in range(d)
            ])
        ).alias("cell")
    )
    return (
        cells.select("cell.row", "cell.idx")
        .groupBy("row", "idx")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame,
                 item_col: str, d: int = 3, w: int = 1 << 12) -> DataFrame:
    """(item, est_count) — point queries against a built sketch:
    the min over the d row counters (0 if any cell is empty — an item
    with a zero cell was never inserted). One explode of the probes'
    (row, idx) cells, one broadcast join, one min groupBy."""
    cells = probes.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.col(item_col),
                                               F.lit(f"#{r}"))),
                                1 + 10 * r, 10,
                            ),
                            16, 10,
                        ).cast("bigint") % w
                    ).alias("idx"),
                )
                for r in range(d)
            ])
        ).alias("cell"),
    ).select("item", "cell.row", "cell.idx")
    return (
        cells.join(F.broadcast(sketch), ["row", "idx"], "left")
        .groupBy("item")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint")
            .alias("est_count")
        )
    )


# ----------------------------------------------------------------- #
# HyperLogLog — the register-max mergeable distinct sketch
# ----------------------------------------------------------------- #

_HLL_B = 6                    # 2^6 = 64 registers
_HLL_M = 1 << _HLL_B
_HLL_WBITS = 32 - _HLL_B      # 26-bit rank word
# alpha_64 = 0.7213 / (1 + 1.079/64) (Flajolet et al. 2007, fig. 3)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 64.0)


def hll_reg_rho(h, wbits: int):
    """(reg, rho) columns from a 32-bit md5-derived hash column:
    the top ``32 - wbits`` bits select the register, rho is the
    1-based position of the rank word's leading 1 bit — computed as
    ``(wbits+1) - bitlength(w)`` via base-2 string length, the
    engine-portable EXACT integer log2 (never floor(ln/ln2), whose
    1-ulp error flips at powers of two); w = 0 → wbits+1. Shared by
    the X218 sketch and the X225/X231 HyperANF machinery so the two
    register encodings can never drift apart."""
    w = h % (1 << wbits)
    # h < 2^32 and the divisor is a power of two: the double quotient
    # is exact, so the cast truncation IS floor division
    reg = (h / F.lit(1 << wbits)).cast("bigint")
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.conv(w.cast("string"), 10, 2))
    ).cast("bigint")
    return reg, rho


def hll_distinct(items: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """X218 — HyperLogLog distinct-count estimate per group
    (Flajolet/Fusy/Gandouet/Meunier, AofA 2007), the register-max
    complement of the KMV synopsis (X78): where KMV keeps k order
    statistics, HLL keeps m=64 register maxima — and register maxima
    merge by element-wise MAX, so two crawls' sketches union without
    re-reading pages and partial aggregation is exact by construction
    (max is what shuffles; the estimate is computed once at the end).

    Determinism discipline: the 32-bit hash is the md5-derived word
    the whole repo uses; register = top 6 bits, rank word w = low 26
    bits, rho = 27 - bitlength(w) via base-2 string length (engine-
    portable EXACT integer log2 — never floor(ln/ln2), whose 1-ulp
    error flips at powers of two), w = 0 → 27. The harmonic sum is a
    sum of ≤ 64 exact powers of two spanning 2^0..2^-27 — every
    partial sum fits one 53-bit mantissa window, so double summation
    is EXACT under any partitioning. Small-range correction: E ≤ 2.5m
    with V empty registers → linear counting m·ln(m/V).

    Emits (group, n_regs, v_zero_regs, hll_est, exact_distinct,
    err_bp) — exact rides along because this is the AUDIT form; at
    100 TB drop the exact branch and ship 64 bigints per group."""
    hashed = (
        items.select(F.col(group_col).alias("grp"),
                     F.col(item_col).alias("it"))
        .where(F.col("it").isNotNull())
        .select(
            "grp",
            "it",
            F.conv(F.substring(F.md5(F.col("it")), 1, 8), 16, 10)
            .cast("bigint").alias("h"),
        )
    )
    reg, rho = hll_reg_rho(F.col("h"), _HLL_WBITS)
    regs = hashed.select("grp", reg.alias("reg"), rho.alias("rho")).groupBy(
        "grp", "reg"
    ).agg(F.max("rho").alias("max_rho"))
    per_group = regs.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__s_present"),
    )
    exact = hashed.select("grp", "it").distinct().groupBy("grp").agg(
        F.count("*").cast("bigint").alias("exact_distinct")
    )
    v = (F.lit(_HLL_M) - F.col("n_regs")).cast("bigint")
    s = F.col("__s_present") + v.cast("double")
    raw_e = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / s
    est = F.when(
        (raw_e <= 2.5 * _HLL_M) & (v > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v.cast("double")),
    ).otherwise(raw_e)
    out = per_group.join(exact, "grp").select(
        F.col("grp").alias(group_col),
        "n_regs",
        v.alias("v_zero_regs"),
        F.round(est, 4).alias("hll_est"),
        "exact_distinct",
    )
    return out.withColumn(
        "err_bp",
        F.round(
            F.abs(F.col("hll_est") - F.col("exact_distinct"))
            * 10000.0 / F.col("exact_distinct")
        ).cast("bigint"),
    )
