"""Deduplication operators for the training-data pipeline tier.

All four families over the ``documents`` table, expressed Spark-first
(built-in functions only — array/higher-order functions stay in the
JVM; no Python UDFs anywhere in this module):

  - exact dedup:      normalize -> md5 -> hash-groupBy
  - MinHash + LSH:    word-shingles -> k md5-derived min-hashes ->
                      banded signature -> bucket join for candidates
  - SimHash:          per-token md5 bit votes -> 64-bit signature
                      (two 32-bit words)
  - n-gram Jaccard:   token-set self-join, doc-frequency-capped +
                      length-ratio pruned

Hash functions are md5-derived (first 8 hex chars as uint) so the
DuckDB oracles can reproduce values bit-exactly; at cluster scale
swap in xxhash64 for speed (same plan shape).

Algorithms are the published ones: MinHash resemblance sketches
(Broder, "On the resemblance and containment of documents", 1997),
LSH banding (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets
ch. 3), SimHash (Charikar, "Similarity estimation techniques from
rounding algorithms", STOC 2002).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def norm_text(col: Column) -> Column:
    """Canonical text normalization shared by all dedup ops."""
    return F.trim(F.lower(F.regexp_replace(col, r"\s+", " ")))


NORM_SQL = "trim(lower(regexp_replace({t}, '\\s+', ' ', 'g')))"


def hof_let(bound: Column, body) -> Column:
    """Evaluate ``bound`` ONCE per row and hand it to ``body`` as a
    lambda variable — a let-binding built from a single-element
    ``transform``. An expression referenced inside a higher-order-
    function lambda is re-evaluated once per ELEMENT (Catalyst
    neither caches nor subexpression-eliminates into lambda bodies),
    so a shingle builder that tokenizes inside its per-index lambda
    pays O(n_tokens) tokenizations per row. Binding first makes the
    lambda body read a variable: measured 4.5 s -> 0.5 s on the
    sf0.1 shingle explode, identical output."""
    return F.transform(F.array(bound), body)[0]


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: md5 of normalized text, groups with >1
    member. Map-side partial agg comes free from hash aggregation."""
    return (
        docs.select(
            F.md5(norm_text(F.col(text_col))).alias("content_hash"),
            F.col("doc_id"),
        )
        .groupBy("content_hash")
        .agg(
            F.count("*").cast("bigint").alias("n_dups"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def tokens(col: Column) -> Column:
    return F.split(norm_text(col), " ")


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-grams, sorted (deterministic)."""
    return hof_let(
        tokens(col),
        lambda toks: F.array_sort(F.array_distinct(F.transform(
            F.sequence(F.lit(1),
                       F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ))),
    )


def _md5_hash(col: Column, salt: int, pos: int = 1) -> Column:
    """Deterministic 32-bit hash from md5 (hex chars [pos, pos+8)) —
    portable to DuckDB as ('0x' || substr(md5(...),pos,8))::UBIGINT.
    ``pos=1`` and ``pos=9`` give two independent 32-bit words of the
    same digest (one md5 per token, reused)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), pos, 8), 16, 10
    ).cast("bigint")


def raw_shingles(col: Column, k: int = 3) -> Column:
    """Word k-grams WITHOUT distinct/sort — duplicates cannot change a
    min-hash, so the cheaper form feeds the minhash path."""
    return hof_let(
        tokens(col),
        lambda toks: F.transform(
            F.sequence(F.lit(1),
                       F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       n_hashes: int = 8, k: int = 3) -> DataFrame:
    """(doc_id, h0..h{n-1}) minhash signature, explode-once.

    The hash family is Kirsch–Mitzenmacher double hashing: ONE md5
    per shingle yields two independent 32-bit words (a, b); the i-th
    hash is (a + i*b) mod 2^32. That replaces n_hashes md5 inversions
    per shingle with one — md5 is the dominant per-shingle cost — at
    no loss for min-wise LSH (Kirsch & Mitzenmacher, "Less hashing,
    same performance", ESA 2006). All arithmetic is whole-stage
    codegen; min-reduction by hash aggregation — map-side partial agg
    means the shuffle carries n_hashes longs per doc, not the shingle
    set. (The one-column ``array_min(transform(...))`` form re-derives
    the whole shingle array once per salt inside interpreted
    higher-order functions — measured ~9x slower at sf0.1.)"""
    sh = docs.select("doc_id", F.explode(raw_shingles(F.col(text_col), k)).alias("shingle"))
    a = _md5_hash(F.col("shingle"), 0, pos=1)
    b = _md5_hash(F.col("shingle"), 0, pos=9)
    hashed = sh.select("doc_id", a.alias("ha"), b.alias("hb"))
    return hashed.groupBy("doc_id").agg(
        *[
            F.min(
                (F.col("ha") + F.lit(i) * F.col("hb")) % F.lit(1 << 32)
            ).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )


def minhash_bands(docs: DataFrame, text_col: str = "text",
                  n_hashes: int = 8, band_size: int = 2) -> DataFrame:
    """(doc_id, band_no, band_key): LSH banding — docs sharing a band
    key are near-dup candidates. Candidate join is a shuffle on
    band_key (small keys; skew impossible because keys are hashes)."""
    sig = minhash_signatures(docs, text_col, n_hashes)
    n_bands = n_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_no"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"h{b * band_size + j}").cast("string")
                        for j in range(band_size)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(
        "doc_id", F.explode(bands).alias("band")
    ).select("doc_id", F.col("band.band_no").alias("band_no"),
             F.col("band.band_key").alias("band_key"))


def minhash_candidate_pairs(docs: DataFrame, text_col: str = "text",
                            n_hashes: int = 8, band_size: int = 2) -> DataFrame:
    """Near-dup candidate pairs from LSH buckets (doc_a < doc_b)."""
    b = minhash_bands(docs, text_col, n_hashes, band_size)
    a = b.alias("a")
    c = b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").cast("bigint").alias("doc_a"),
            F.col("b.doc_id").cast("bigint").alias("doc_b"),
        )
        .distinct()
    )


def incremental_dup_flags(new_docs: DataFrame, history_docs: DataFrame,
                          text_col: str = "text", n_hashes: int = 8,
                          band_size: int = 2) -> DataFrame:
    """Incremental near-dedup: flag each NEW document that LSH-collides
    with the HISTORICAL corpus. This is the production crawl shape
    (each monthly Common-Crawl-style batch is deduplicated against
    everything already ingested, per CCNet / RefinedWeb): the history
    side reduces to its distinct ``(band_no, band_key)`` index —
    n_bands short hash keys per doc, no text — and the new batch
    probes it with one equi semi-join. No new x new and no history x
    history pair ever forms, so cost is O(|new| * n_bands) probe rows
    regardless of history size. At 10^12-doc history the index is a
    table WRITTEN bucketed by band_key, so the probe co-locates
    without reshuffling the index; appending this batch's own band
    rows to it is the only write. Returns (doc_id, dup_of_history)
    for every new doc."""
    new_bands = minhash_bands(new_docs, text_col, n_hashes, band_size)
    hist_index = (
        minhash_bands(history_docs, text_col, n_hashes, band_size)
        .select("band_no", "band_key")
        .distinct()
    )
    matched = (
        new_bands.join(hist_index, ["band_no", "band_key"], "leftsemi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        new_docs.select(F.col("doc_id").cast("bigint").alias("doc_id"))
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("hit"), F.lit(False)).alias("dup_of_history"),
        )
    )


def passage_windows(col: Column, w: int = 8) -> Column:
    """Non-overlapping w-token passages of normalized text (the last
    passage may be shorter). Passage-level exact dedup is the C4/
    RefinedWeb-style sub-document pass (C4 removed repeated
    three-sentence spans; RefinedWeb exact substrings) re-expressed
    on fixed token windows so the unit is deterministic and
    engine-portable."""
    return hof_let(
        tokens(col),
        lambda toks: F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.floor((F.size(toks) - F.lit(1)) / F.lit(w))
                    .cast("int"),
                    F.lit(0),
                ),
            ),
            lambda i: F.concat_ws(" ", F.slice(toks, i * w + 1, w)),
        ),
    )


def passage_dup_groups(docs: DataFrame, text_col: str = "text",
                       w: int = 8) -> DataFrame:
    """Passages appearing in more than one document: explode windows,
    md5 each, hash-groupBy on the digest. The shuffle carries one
    16-byte digest per passage; counts partial-aggregate map-side.
    At corpus scale this is the sub-document twin of exact_dup_groups
    (same plan shape, finer unit); downstream removal is a semi-join
    of (doc_id, passage_no) against this table."""
    p = (
        docs.select(
            "doc_id", F.explode(passage_windows(F.col(text_col), w)).alias("passage")
        )
        .filter(F.col("passage") != "")
        .select(F.md5("passage").alias("passage_hash"), "doc_id")
    )
    return (
        p.groupBy("passage_hash")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def passage_scrub(docs: DataFrame, text_col: str = "text",
                  w: int = 8) -> DataFrame:
    """Duplicate-passage REMOVAL (the action half of `passage_dup_groups`,
    after Lee et al., "Deduplicating Training Data Makes Language
    Models Better", ACL 2022, and C4's repeated-span drop): every
    w-token passage whose content occurs in more than one document is
    excised from every document, and the surviving passages re-join in
    order. One output row per doc that has at least one non-empty
    passage: (doc_id, scrubbed_text, n_kept, n_dropped).

    Plan shape: explode windows (linear), map-side-partial hash-agg of
    the 16-byte digests for the cross-doc dup set, left join on the
    digest, one groupBy(doc_id) rebuild over (passage_no, passage)
    structs. Text bytes cross the wire once for the rebuild — inherent
    to a reconstruction op; everything else ships digests only."""
    win = (
        docs.select(
            "doc_id",
            F.posexplode(passage_windows(F.col(text_col), w))
            .alias("passage_no", "passage"),
        )
        .filter(F.col("passage") != "")
        .select("doc_id", "passage_no", "passage",
                F.md5("passage").alias("passage_hash"))
    )
    dup = (
        win.groupBy("passage_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("passage_hash", F.lit(True).alias("is_dup"))
    )
    marked = win.join(dup, "passage_hash", "left").select(
        "doc_id", "passage_no", "passage",
        F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"),
    )
    kept_struct = F.array_sort(
        F.collect_list(F.struct("passage_no", "is_dup", "passage"))
    )
    return marked.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.filter(kept_struct, lambda s: ~s.is_dup),
                lambda s: s.passage,
            ),
        ).alias("scrubbed_text"),
        F.sum(F.when(~F.col("is_dup"), 1).otherwise(0))
        .cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("bigint").alias("n_dropped"),
    )


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash_hi, simhash_lo): 64-bit SimHash — per-bit
    majority vote of distinct-token hashes, carried as two 32-bit
    words so no bit ever touches a BIGINT sign position (a single
    64-bit signature column would put bit 63 in the sign bit, where
    cross-engine overflow semantics diverge). 32 bits was a round-1
    weakness: at 10^12 docs the birthday bound makes identical-32-bit
    grouping pure collision noise; 64 bits puts the expected collision
    count back below 1 for corpora up to ~5*10^9 distinct signatures
    and is the width the published SimHash dedup systems use
    (Manku/Jain/Sarma, WWW 2007).

    Explode-once: each token md5-hashed ONCE, both 32-bit words sliced
    from the same digest, then 64 codegen'd SUM aggregates (one per
    bit) in a single hash aggregation; the shuffle carries 65 longs
    per doc."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tk")
    )
    h = toks.select(
        "doc_id",
        _md5_hash(F.col("tk"), 0, pos=1).alias("hv_hi"),
        _md5_hash(F.col("tk"), 0, pos=9).alias("hv_lo"),
    )
    agg = h.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        *[
            F.sum(
                F.shiftright(F.col("hv_hi"), b).bitwiseAND(F.lit(1))
            ).alias(f"hi{b}")
            for b in range(32)
        ],
        *[
            F.sum(
                F.shiftright(F.col("hv_lo"), b).bitwiseAND(F.lit(1))
            ).alias(f"lo{b}")
            for b in range(32)
        ],
    )

    def word(prefix: str) -> Column:
        sig = None
        for b in range(32):
            bit = F.when(
                F.col(f"{prefix}{b}") * 2 >= F.col("n_tok"),
                F.lit(1).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
            term = F.shiftleft(bit, b)
            sig = term if sig is None else sig + term
        return sig

    return agg.select(
        "doc_id", word("hi").alias("simhash_hi"), word("lo").alias("simhash_lo")
    )


def simhash_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Docs grouped by identical 64-bit SimHash (strong near-dup
    signal); the group key is the (hi, lo) word pair."""
    return (
        simhash_signatures(docs, text_col)
        .groupBy("simhash_hi", "simhash_lo")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.min("doc_id").cast("bigint").alias("keep_doc_id"))
        .select(
            F.col("simhash_hi").cast("bigint"),
            F.col("simhash_lo").cast("bigint"),
            "n_docs", "keep_doc_id",
        )
    )


# 64-bit signature carved into 6 blocks: 3 per 32-bit word, widths
# (11, 11, 10).  Hamming distance <= 3 flips at most 3 blocks, so by
# pigeonhole at least one C(6,3) block-triple is intact — the
# "probe tables" of Manku/Jain/Sarma, WWW 2007 §3.
_SIMHASH_BLOCKS = [(w, off, 11 if i < 2 else 10)
                   for w in ("hi", "lo")
                   for i, off in enumerate((0, 11, 22))]


def _block_combos(k: int):
    from itertools import combinations

    intact = len(_SIMHASH_BLOCKS) - k
    return list(combinations(range(len(_SIMHASH_BLOCKS)), intact))


def simhash_neardup_pairs(docs: DataFrame, text_col: str = "text",
                          k: int = 3) -> DataFrame:
    """Near-duplicate pairs within SimHash Hamming distance ``k``
    (Manku/Jain/Sarma, "Detecting near-duplicates for web crawling",
    WWW 2007): candidates are generated by equi-joining on block-combo
    probe keys (any pair within distance k agrees exactly on at least
    one combination of ``6-k`` of the 6 signature blocks), then
    verified with ``bit_count(xor)`` on the full 64-bit signature.

    Scale shape (the WWW 2007 paper's own): the probe join runs over
    the DISTINCT fingerprint table, not the doc table — duplicate
    contents collapse before the quadratic step, so a dup family of m
    docs costs one probe row set instead of m (and m^2 candidate rows).
    Each distinct signature explodes into C(6, 6-k) = 20 (for k=3)
    probe rows keyed by (table_no, ~33-bit packed key); buckets hold
    u/2^33 signatures per table at corpus scale, so the join is
    banded, never all-pairs.  Doc pairs are then recovered by two
    equi-joins on the signature key plus a within-signature self-join
    (the hamming-0 pairs); each output pair is produced exactly once,
    so no wide final distinct is needed.  The identical-signature
    grouping (`simhash_groups`) remains the cheap k=0 path.
    """
    return hamming_neardup_pairs(simhash_signatures(docs, text_col), k)


def hamming_neardup_pairs(sigs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) — the Manku probe-table machinery over
    ANY (doc_id, simhash_hi, simhash_lo) 64-bit code table: SimHash
    text fingerprints (X3) and perceptual media hashes (X115) share
    the identical banded-Hamming join, so the construction lives once.
    Same contract as documented on ``simhash_neardup_pairs``."""
    usig = sigs.select("simhash_hi", "simhash_lo").distinct()
    combos = _block_combos(k)

    def block_val(bi: int) -> Column:
        word, off, width = _SIMHASH_BLOCKS[bi]
        return F.shiftright(F.col(f"simhash_{word}"), off).bitwiseAND(
            F.lit((1 << width) - 1)
        )

    def combo_key(combo) -> Column:
        key = None
        for bi in combo:
            v = block_val(bi)
            key = v if key is None else F.shiftleft(key, 11) + v
        return key

    probes = usig.select(
        "simhash_hi", "simhash_lo",
        F.explode(F.array(*[
            F.struct(
                F.lit(t).alias("table_no"),
                combo_key(c).cast("bigint").alias("probe_key"),
            )
            for t, c in enumerate(combos)
        ])).alias("p"),
    ).select("simhash_hi", "simhash_lo",
             F.col("p.table_no").alias("table_no"),
             F.col("p.probe_key").alias("probe_key"))

    a, b = probes.alias("a"), probes.alias("b")
    hamming = (
        F.bit_count(F.col("a.simhash_hi").bitwiseXOR(F.col("b.simhash_hi")))
        + F.bit_count(F.col("a.simhash_lo").bitwiseXOR(F.col("b.simhash_lo")))
    ).cast("bigint")
    sig_pairs = (
        a.join(
            b,
            (F.col("a.table_no") == F.col("b.table_no"))
            & (F.col("a.probe_key") == F.col("b.probe_key"))
            & (
                (F.col("a.simhash_hi") < F.col("b.simhash_hi"))
                | (
                    (F.col("a.simhash_hi") == F.col("b.simhash_hi"))
                    & (F.col("a.simhash_lo") < F.col("b.simhash_lo"))
                )
            ),
        )
        .select(
            F.col("a.simhash_hi").alias("a_hi"),
            F.col("a.simhash_lo").alias("a_lo"),
            F.col("b.simhash_hi").alias("b_hi"),
            F.col("b.simhash_lo").alias("b_lo"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= k)
        .distinct()
    )

    cross = (
        sig_pairs.join(
            sigs.alias("da"),
            (F.col("a_hi") == F.col("da.simhash_hi"))
            & (F.col("a_lo") == F.col("da.simhash_lo")),
        )
        .join(
            sigs.alias("db"),
            (F.col("b_hi") == F.col("db.simhash_hi"))
            & (F.col("b_lo") == F.col("db.simhash_lo")),
        )
        .select(
            F.least(F.col("da.doc_id"), F.col("db.doc_id"))
            .cast("bigint").alias("doc_a"),
            F.greatest(F.col("da.doc_id"), F.col("db.doc_id"))
            .cast("bigint").alias("doc_b"),
            F.col("hamming"),
        )
    )
    x, y = sigs.alias("x"), sigs.alias("y")
    same = (
        x.join(
            y,
            (F.col("x.simhash_hi") == F.col("y.simhash_hi"))
            & (F.col("x.simhash_lo") == F.col("y.simhash_lo"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").cast("bigint").alias("doc_a"),
            F.col("y.doc_id").cast("bigint").alias("doc_b"),
            F.lit(0).cast("bigint").alias("hamming"),
        )
    )
    return cross.unionByName(same)


def dup_components(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over near-dup candidate pairs
    (doc_a < doc_b) by iterative min-label propagation — the standard
    cluster-then-keep-one dedup used by large-scale corpus pipelines.

    Each round joins every node's current label with its neighbors'
    and takes the min; terminates at fixpoint (checked with a cheap
    count) or max_iters. Rounds are O(E) shuffles on the node id; at
    10^12 scale the pair graph is tiny relative to the corpus (only
    near-dup candidates appear), and label frames are checkpointed
    per-round via localCheckpoint to cut lineage growth.

    Returns (doc_id, component) with component = min doc_id reachable.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    edges = edges.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("doc_id", "dst").withColumnRenamed(
                    "component", "dst_component"
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_component").alias("nbr_component"))
            .withColumnRenamed("src", "doc_id")
        )
        updated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc_id")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels.select(
        F.col("doc_id").cast("bigint"), F.col("component").cast("bigint")
    )


def jaccard_pairs(docs: DataFrame, text_col: str = "text",
                  threshold: float = 0.5,
                  max_df_frac: float = 0.5) -> DataFrame:
    """n-gram (word-token) Jaccard similarity pairs >= threshold,
    computed relationally: explode distinct tokens, self-join on
    token, |A∩B| / (|A| + |B| - |A∩B|). Fully portable to the DuckDB
    oracle.

    Two blockings keep the self-join off the O(df²)-per-hot-token
    cliff that an unblocked token join hits at corpus scale:

    1. **Document-frequency cap**: tokens appearing in more than
       ``max_df_frac`` of all docs (stopwords — exactly the tokens
       whose per-token pair blowup is quadratic in corpus size) are
       dropped BEFORE sizes and intersections are computed, on both
       engines identically. This changes the similarity measure to
       Jaccard-over-informative-tokens — the standard stopword-pruned
       form; a stopword shared by most docs carries no dedup signal.
    2. **Length-ratio pruning**: J(A,B) >= t implies
       min(|A|,|B|)/max(|A|,|B|) >= t, so the pair join carries the
       predicate ``n_tok_a BETWEEN n_tok_b*t AND n_tok_b/t``. This is
       a pure pruning (provably cannot remove a qualifying pair) that
       skips intersection work for size-incompatible pairs.

    Still the teaching baseline vs MinHash (minhash_candidate_pairs
    is the 10^12-doc path — its shuffle carries 8 longs/doc), but no
    longer one with a quadratic stopword trap."""
    n_docs = docs.select("doc_id").distinct().count()
    # floor 2: a token shared by only one pair of docs is signal, not
    # a stopword, regardless of corpus size. math.floor (not int())
    # so the threshold matches the oracle's floor() for any sign/parity
    max_df = max(2, math.floor(max_df_frac * n_docs))
    toks = docs.select(
        F.col("doc_id"), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    ).filter(F.col("tok") != "")
    # df-cap: one extra agg on the token key (map-side combinable).
    # The surviving vocabulary is joined with a plain SHUFFLE join on
    # `tok` — at corpus scale (10^12 docs) the post-cap vocabulary is
    # still billions of rows, far beyond broadcast limits; the df-cap
    # has already removed the skewed (stopword) keys, so the shuffle
    # join is well-balanced.
    keep_toks = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("tok")
    )
    toks = toks.join(keep_toks, "tok")
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    sized = toks.join(sizes, "doc_id")
    a = sized.alias("a")
    b = sized.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length-ratio pruning (valid for J >= threshold)
            & (F.col("a.n_tok") >= F.col("b.n_tok") * threshold)
            & (F.col("a.n_tok") * threshold <= F.col("b.n_tok")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count("*").alias("n_inter"),
            F.first(F.col("a.n_tok")).alias("n_tok_a"),
            F.first(F.col("b.n_tok")).alias("n_tok_b"),
        )
    )
    return (
        inter.select(
            F.col("doc_a").cast("bigint"),
            F.col("doc_b").cast("bigint"),
            (
                F.col("n_inter")
                / (F.col("n_tok_a") + F.col("n_tok_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def substring_dup_spans(docs: DataFrame, text_col: str = "text",
                        w: int = 8) -> DataFrame:
    """Exact duplicated-substring spans — Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better")
    re-expressed on stride-1 rolling token windows instead of a
    suffix array: every w-token window that occurs in ≥ 2 documents
    marks its token range, and overlapping/adjacent marked ranges
    merge into maximal spans. Emits one row per span:
    (doc_id, span_no, tok_start, tok_end, n_windows), 1-based
    inclusive token positions over normalized text.

    Scale shape: rolling windows explode to ~n_tokens rows but shuffle
    only (md5, doc_id, pos) triples; the cross-doc test is one hash
    aggregation on the window key (map-side partial) and the verdict
    join moves 32-hex keys. Span merging is the classic islands
    computation — two per-doc window functions over (doc_id, wpos),
    partition-local after a single exchange on doc_id, no global
    sort. The suffix-array original needs a global order; this form
    needs only per-doc state and is exact for spans ≥ w tokens."""
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    base = docs.select(F.col("doc_id"), toks.alias("__toks")).filter(
        F.size("__toks") >= w
    )
    wins = (
        base.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - w + 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, w)),
                )
            ).alias("__p0", "__wtext"),
        )
        .select(
            "doc_id",
            (F.col("__p0") + 1).alias("wpos"),
            F.md5(F.col("__wtext")).alias("__wk"),
        )
    )
    dup = (
        wins.groupBy("__wk")
        .agg(F.countDistinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__wk")
    )
    flagged = wins.join(dup, "__wk").select("doc_id", "wpos")
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("wpos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cur = (
        Window.partitionBy("doc_id")
        .orderBy("wpos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max(F.col("wpos") + F.lit(w - 1)).over(prev)
    new_island = (
        prev_end.isNull() | (F.col("wpos") > prev_end + 1)
    ).cast("int")
    spans = flagged.withColumn(
        "span_no", F.sum(new_island).over(cur).cast("bigint")
    )
    return spans.groupBy("doc_id", "span_no").agg(
        F.min("wpos").cast("bigint").alias("tok_start"),
        (F.max("wpos") + F.lit(w - 1)).cast("bigint").alias("tok_end"),
        F.count("*").cast("bigint").alias("n_windows"),
    )


def canonical_select(components: DataFrame, docs: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """Canonical-document selection over dup clusters — the decision
    step after clustering (X10): each component keeps its longest
    member (ties → smallest doc_id), everything else is marked for
    drop. RefinedWeb/C4-style pipelines keep one representative per
    near-dup cluster; longest-text is the common deterministic policy.
    Emits (doc_id, component, n_chars, is_canonical).

    One equi-join component⋈doc on doc_id and one partition-local
    window rank per component — component skew is bounded by real dup
    clusters (size ~ duplication factor, not corpus size)."""
    from pyspark.sql import Window

    d = docs.select(
        "doc_id", F.length(text_col).cast("bigint").alias("n_chars")
    )
    j = components.join(d, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return j.select(
        "doc_id",
        "component",
        "n_chars",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )


def dup_cluster_stats(components: DataFrame) -> DataFrame:
    """(cluster_size, n_clusters, n_docs, n_removable) — the dedup
    REPORT over ``dup_components`` output: the cluster-size histogram
    every dedup run publishes (how much of the corpus is duplicated,
    at what multiplicity, and how many docs canonical-selection will
    remove — ``(size-1)`` per cluster). The histogram shape is also
    the skew early-warning: a single giant component means a
    boilerplate/template artifact leaked through shingling, not real
    duplication.

    Two stacked partial-agg groupBys (component → size, size →
    histogram); only (component, count) pairs cross the first
    shuffle and the second input is already tiny."""
    sz = components.groupBy("component").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return (
        sz.groupBy("cluster_size")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint").alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint").alias("n_removable"),
        )
    )


#: winnowing key packing: key = h32 * 2^31 + (2^31 - 1 - pos). A plain
#: integer MIN then implements (hash asc, position DESC) — the
#: rightmost-minimum tie rule — in one window aggregate on any engine.
#: 32 + 31 = 63 bits: exact int64, no wraparound for pos < 2^31.
_WIN_POS_SPAN = 1 << 31


def winnow_fingerprints(docs: DataFrame, k: int = 3, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, fp) — winnowing document fingerprints (Schleimer,
    Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
    Fingerprinting", SIGMOD 2003 — the MOSS scheme): hash every word
    k-gram, slide a window of ``w`` consecutive hashes, select each
    window's minimum with the RIGHTMOST-minimum tie rule, and collapse
    repeated selections across overlapping windows. The guarantee the
    sampling schemes it replaced lack: any shared run of ≥ w+k-1
    tokens between two documents yields at least one IDENTICAL
    fingerprint in both — so a fingerprint equi-join finds partial
    (passage-level) overlap that whole-document MinHash dilutes away.

    The tie rule rides one integer MIN: key = h32·2^31 + (2^31-1-pos)
    minimizes by (hash asc, pos desc) — bit-identical across engines,
    no struct comparators. Documents with fewer than ``w`` k-grams get
    one window over all of them (their single rightmost-min), so every
    non-trivial document carries ≥ 1 fingerprint.

    Scale shape: explode to (doc, pos, hash) — the same row count the
    shingle pass of MinHash pays — then ONE partition-local window
    (partitionBy doc, orderBy pos: rows of one document, never a
    global sort) and a distinct on the selected triples; output is
    ~2/(w+1) of the gram count (the paper's expected density)."""
    from pyspark.sql import Window

    grams = hof_let(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda toks: F.when(
            F.size(toks) >= k,
            F.transform(
                F.sequence(F.lit(1), (F.size(toks) - k + 1).cast("int")),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    rows = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(grams).alias("__pos", "__gram"),
    ).select(
        "__id",
        "__pos",
        (
            F.conv(F.substring(F.md5(F.col("__gram")), 1, 8), 16, 10)
            .cast("bigint") * F.lit(_WIN_POS_SPAN)
            + (F.lit(_WIN_POS_SPAN - 1) - F.col("__pos"))
        ).cast("bigint").alias("__key"),
    )
    win = (
        Window.partitionBy("__id").orderBy("__pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    m = Window.partitionBy("__id")
    sel = (
        rows.withColumn("__wmin", F.min("__key").over(win))
        .withColumn("__m", F.count("*").over(m))
        .filter(F.col("__pos") <= F.greatest(F.col("__m") - w, F.lit(0)))
    )
    return (
        sel.select(
            F.col("__id").cast("bigint").alias(id_col),
            (F.lit(_WIN_POS_SPAN - 1) - F.col("__wmin") % _WIN_POS_SPAN)
            .cast("bigint").alias("pos"),
            F.expr(f"__wmin div {_WIN_POS_SPAN}").cast("bigint").alias("fp"),
        )
        .distinct()
    )


def verify_candidates(docs: DataFrame, text_col: str = "text",
                      k: int = 3) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_a, n_b, jaccard_bp) — exact
    shingle-Jaccard verification of ``minhash_candidate_pairs``
    output: the verify stage of the standard LSH dedup pipeline
    (Leskovec/Rajaraman/Ullman, MMDS §3.4 — bucket sharing is a HINT;
    the verdict comes from re-checking the candidate against the true
    similarity). X76 measures what the construction MISSES (recall);
    this measures what it FALSELY proposes (precision) — the two
    numbers an operator needs before trusting an LSH pass's verdicts
    at a target similarity. A band-collision pair with zero shingle
    overlap is kept (jaccard 0), not dropped: false positives are the
    subject.

    Scale shape: exact Jaccard is computed ONLY for candidate pairs —
    the candidate set is LSH-bounded (never all-pairs), and the
    intersection join expands each pair by at most |A| distinct
    shingles before the (doc_b, shingle) equi-join cuts it to the
    overlap; sizes are one partial-agg groupBy. Integer bp output,
    bit-reproducible."""
    # the candidate table is referenced twice below (intersection join
    # + final assembly) — left lazy on purpose: an eager
    # localCheckpoint here measured SLOWER (9.3 -> 12.7 s at sf0.1)
    # because it blocks the pipeline to materialize what AQE
    # otherwise overlaps with the verify joins
    cands = minhash_candidate_pairs(docs, text_col)
    sh = docs.select(
        "doc_id",
        F.explode(word_shingles(F.col(text_col), k)).alias("sh"),
    )
    sizes = sh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_sh")
    )
    inter = (
        cands
        .join(sh.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "sh"),
              ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    return (
        cands
        .join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_sh").alias("n_b")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.coalesce(F.col("n_inter"), F.lit(0)).cast("bigint")
            .alias("n_inter"),
            "n_a", "n_b",
            F.expr(
                "(10000 * coalesce(n_inter, 0)) div "
                "(n_a + n_b - coalesce(n_inter, 0))"
            ).cast("bigint").alias("jaccard_bp"),
        )
    )


def contrastive_pairs(docs: DataFrame, text_col: str = "text",
                      pos_bp: int = 5000,
                      max_neg_per_anchor: int = 3) -> DataFrame:
    """(doc_a, doc_b, jaccard_bp, pair_type) — contrastive
    training-pair mining for embedding/retriever models, built on the
    LSH verify stage: POSITIVES are candidate pairs whose exact
    shingle Jaccard clears ``pos_bp`` (verified near-duplicates — the
    two sides are interchangeable views of one document, the classic
    self-supervised positive), HARD NEGATIVES are band-collision pairs
    that FAILED verification — lexically confusable enough to share a
    MinHash bucket yet textually distinct, exactly the
    retrieved-but-not-relevant negatives DPR-style contrastive losses
    need (Karpukhin et al., "Dense Passage Retrieval", EMNLP 2020 §3.2
    mines hard negatives from a lexical retriever's false positives the
    same way). Negatives are capped at the ``max_neg_per_anchor``
    HARDEST per anchor (highest failing Jaccard first, doc_b tiebreak —
    deterministic), since a few near-threshold negatives carry more
    gradient signal than many easy ones.

    Scale shape: the pair universe is the LSH candidate set (banded,
    never all-pairs) and exact Jaccard is computed once per pair by
    ``verify_candidates``; the per-anchor cap is one row_number window
    PARTITIONED by (doc_a, pair_type) — no global window, and the
    window input carries 4 scalar columns per pair, never text."""
    from pyspark.sql import Window

    v = verify_candidates(docs, text_col)
    typed = v.select(
        "doc_a", "doc_b", "jaccard_bp",
        F.when(F.col("jaccard_bp") >= pos_bp, F.lit("positive"))
        .otherwise(F.lit("hard_negative")).alias("pair_type"),
    )
    w = (
        Window.partitionBy("doc_a", "pair_type")
        .orderBy(F.desc("jaccard_bp"), F.asc("doc_b"))
    )
    return (
        typed.withColumn("__rk", F.row_number().over(w))
        .filter(
            (F.col("pair_type") == "positive")
            | (F.col("__rk") <= max_neg_per_anchor)
        )
        .drop("__rk")
    )


def containment_pairs(docs: DataFrame, text_col: str = "text",
                      threshold_bp: int = 8000,
                      max_df_frac: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_tok_a, n_tok_b, containment_bp) —
    token-set CONTAINMENT pairs: c(A,B) = |A∩B| / min(|A|,|B|)
    (Broder, "On the resemblance and containment of documents",
    SEQUENCES 1997 §2). Jaccard misses the syndication shape a crawl
    is full of — a wire story republished inside a much longer page
    scores J ≈ |A|/|B| → 0 as the host page grows, while its
    containment stays ≈ 1. This is the operator that catches quoted /
    wrapped / excerpt-expanded duplication that symmetric measures
    structurally cannot.

    Same document-frequency cap as ``jaccard_pairs`` (stopwords — the
    quadratic-blowup keys — dropped before sizes and intersections,
    identically on both engines). NO length-ratio pruning: containment
    is deliberately ratio-free (a 50-token excerpt inside a 5,000-token
    page is the signal, not a prunable mismatch), so the pair join is
    bounded only by the df-cap — which is exactly the bound that
    matters, since post-cap df is what multiplies pairs.

    Integer-exact: containment_bp = (10000*|A∩B|) div min(|A|,|B|)
    in pure bigint arithmetic (n_inter ≤ min ≤ n_docs·max_tok, so the
    numerator stays ≤ 10^4·2^40 « 2^63 at any realistic doc size).

    Reference anchor: the reference dedups nothing (docling_serve/
    datamodel/requests.py processes each upload independently); this
    is corpus-level machinery the Spark engine adds.

    The projected input is localCheckpointed once up front: the plan
    references it four times (corpus-size count, df table, sizes, and
    both sides of the pair join), and a lazy DAG re-executes the
    upstream subtree per reference — measured 45 s -> 13 s at 16
    cores on the 60k-doc scaled corpus (the hits_scores /
    dup_components discipline; the materialized copy is the
    operator's own working set, strictly cheaper than 4x subtree
    recomputes)."""
    base = docs.select("doc_id", text_col).localCheckpoint(eager=True)
    n_docs = base.select("doc_id").distinct().count()
    max_df = max(2, math.floor(max_df_frac * n_docs))
    toks = base.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).filter(F.col("tok") != "")
    keep_toks = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("tok")
    )
    toks = toks.join(keep_toks, "tok")
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    sized = toks.join(sizes, "doc_id")
    a = sized.alias("a")
    b = sized.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count("*").cast("bigint").alias("n_inter"),
            F.first(F.col("a.n_tok")).cast("bigint").alias("n_tok_a"),
            F.first(F.col("b.n_tok")).cast("bigint").alias("n_tok_b"),
        )
    )
    return (
        inter.withColumn(
            "containment_bp",
            F.expr("(10000 * n_inter) div least(n_tok_a, n_tok_b)")
            .cast("bigint"),
        )
        .filter(F.col("containment_bp") >= threshold_bp)
        .select("doc_a", "doc_b", "n_inter", "n_tok_a", "n_tok_b",
                "containment_bp")
    )


def dedup_cascade(docs: DataFrame, text_col: str = "text",
                  containment_bp: int = 8000) -> DataFrame:
    """(doc_id, stage) — per-document verdict from a two-stage dedup
    funnel: 'exact' (a byte-identical normalized twin with a smaller
    doc_id exists), then 'containment' (among exact-survivors, a
    qualifying ``containment_pairs`` partner with a smaller doc_id
    exists), else 'kept'. The cascade order every production pipeline
    runs (cheap → expensive; e.g. Penedo et al., "The RefinedWeb
    Dataset", NeurIPS 2023 §3 runs exact-substring after fuzzy — the
    marginal-yield-per-stage accounting this operator emits is how
    those cuts get justified): each stage sees ONLY the previous
    stage's survivors, so the expensive pair join runs on the reduced
    set, and the stage attribution tells the corpus team what each
    layer buys.

    Scale shape: stage 1 is one md5 groupBy (map-side combinable)
    re-joined on the hash key; stage 2 is the df-capped containment
    join over survivors only; the final assembly is two hash
    anti/semi joins on doc_id. Nothing is ever all-pairs."""
    hashed = docs.select(
        "doc_id", F.md5(norm_text(F.col(text_col))).alias("content_hash")
    )
    keepers = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("keep_id")
    )
    # checkpointed: referenced by the survivor anti-join AND the final
    # verdict assembly — doc_id-only rows, tiny to materialize, and it
    # pins stage 1 to ONE execution (lazy re-reference would re-run
    # the md5 groupBy per consumer)
    exact_dups = (
        hashed.join(keepers, "content_hash")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    survivors = docs.join(exact_dups, "doc_id", "left_anti")
    cont_dups = (
        containment_pairs(survivors, text_col, threshold_bp=containment_bp)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return docs.select("doc_id").join(
        exact_dups.withColumn("s1", F.lit(True)), "doc_id", "left"
    ).join(
        cont_dups.withColumn("s2", F.lit(True)), "doc_id", "left"
    ).select(
        F.col("doc_id").cast("bigint"),
        F.when(F.col("s1"), F.lit("exact"))
        .when(F.col("s2"), F.lit("containment"))
        .otherwise(F.lit("kept")).alias("stage"),
    )


def copy_direction_stats(pairs: DataFrame, meta: DataFrame,
                         id_col: str = "doc_id",
                         host_col: str = "host",
                         ts_col: str = "ts") -> DataFrame:
    """(host, n_as_source, n_as_copier, copier_bp) — syndication
    DIRECTION over containment pairs: in each pair the earlier
    capture is the source and the later the copier (tie on timestamp
    → smaller doc_id is source — deterministic), rolled up per host.
    X100 finds the excerpt-in-page pairs; this assigns who copied
    whom, the provenance question a licensing/canonicalization pass
    needs answered (Broder's containment gives the edge, capture time
    orients it — the heuristic wire-service tracing uses: the wire
    story precedes its republications). A host that is mostly copier
    is an aggregator — X20's mixture should weight its ORIGINALS'
    hosts instead.

    Two doc-keyed equi-joins attach (host, ts) to each pair side
    (meta is id-keyed narrow rows), one union of the two directed
    emissions, ONE host partial agg."""
    m = meta.select(
        F.col(id_col).alias("id"),
        F.col(host_col).alias("h"),
        F.col(ts_col).alias("t"),
    )
    j = (
        pairs.select("doc_a", "doc_b")
        .join(m.select(F.col("id").alias("doc_a"),
                       F.col("h").alias("host_a"),
                       F.col("t").alias("ts_a")), "doc_a")
        .join(m.select(F.col("id").alias("doc_b"),
                       F.col("h").alias("host_b"),
                       F.col("t").alias("ts_b")), "doc_b")
    )
    a_is_source = (
        (F.col("ts_a") < F.col("ts_b"))
        | ((F.col("ts_a") == F.col("ts_b"))
           & (F.col("doc_a") < F.col("doc_b")))
    )
    src = F.when(a_is_source, F.col("host_a")).otherwise(F.col("host_b"))
    cop = F.when(a_is_source, F.col("host_b")).otherwise(F.col("host_a"))
    directed = (
        j.select(src.alias("host"), F.lit(1).alias("as_source"),
                 F.lit(0).alias("as_copier"))
        .unionByName(
            j.select(cop.alias("host"), F.lit(0).alias("as_source"),
                     F.lit(1).alias("as_copier"))
        )
    )
    return (
        directed.groupBy("host")
        .agg(
            F.sum("as_source").cast("bigint").alias("n_as_source"),
            F.sum("as_copier").cast("bigint").alias("n_as_copier"),
        )
        .select(
            "host", "n_as_source", "n_as_copier",
            F.expr("(10000 * n_as_copier) div "
                   "greatest(n_as_source + n_as_copier, 1)")
            .cast("bigint").alias("copier_bp"),
        )
        .orderBy("host")
    )


def dedup_scope_stats(docs: DataFrame, snapshot_col: str = "snapshot",
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(snapshot, n_docs, n_dup_intra, n_dup_cross, dup_intra_bp,
    dup_cross_bp) — the dedup-scope ablation behind FineWeb's central
    finding (Penedo et al., NeurIPS 2024: deduplicating each crawl
    snapshot independently trains BETTER than global cross-snapshot
    dedup, which preferentially deletes the high-quality pages that
    recur across crawls): per snapshot, how much duplicate mass is
    intra-snapshot (removed under either policy) vs cross-snapshot
    (removed ONLY by global dedup)? A corpus whose duplicate mass is
    mostly cross-snapshot loses little to per-snapshot scoping and
    avoids the quality regression.

    A duplicate is any non-canonical member of an exact-fingerprint
    group (md5 over `norm_text`); the canonical is the (snapshot,
    doc_id)-first member, and a duplicate is *intra* when it shares
    the canonical's snapshot. Rates in basis points of the snapshot's
    documents, bigint div.

    Scale shape: fingerprints compute in the scan (text never
    shuffles); the one exchange carries (fp, snapshot, id); the
    per-group window is bounded by duplicate-cluster size, and the
    final agg is one snapshot-keyed partial agg."""
    from pyspark.sql import Window

    fp = F.md5(norm_text(F.col(text_col)))
    base = docs.select(
        F.col(id_col).cast("bigint").alias("__id"),
        F.col(snapshot_col).alias("snapshot"),
        fp.alias("__fp"),
    )
    w = Window.partitionBy("__fp").orderBy("snapshot", "__id")
    marked = base.select(
        "snapshot",
        (F.row_number().over(w) > 1).alias("__is_dup"),
        F.first("snapshot").over(w).alias("__canon_snap"),
    )
    return (
        marked.groupBy("snapshot")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("__is_dup")
                   & (F.col("snapshot") == F.col("__canon_snap")))
                  .cast("bigint")).cast("bigint").alias("n_dup_intra"),
            F.sum((F.col("__is_dup")
                   & (F.col("snapshot") != F.col("__canon_snap")))
                  .cast("bigint")).cast("bigint").alias("n_dup_cross"),
        )
        .select(
            "snapshot", "n_docs", "n_dup_intra", "n_dup_cross",
            F.expr("(10000 * n_dup_intra) div n_docs").cast("bigint")
            .alias("dup_intra_bp"),
            F.expr("(10000 * n_dup_cross) div n_docs").cast("bigint")
            .alias("dup_cross_bp"),
        )
    )


def dedup_threshold_sweep(docs: DataFrame, text_col: str = "text",
                          lo_bp: int = 3000, hi_bp: int = 10000,
                          step_bp: int = 500) -> DataFrame:
    """(threshold_bp, n_pairs, n_docs) — the near-dup THRESHOLD TUNING
    curve: for every candidate threshold on the grid, how many
    verified candidate pairs survive and how many distinct documents
    they touch (the upper bound on removals). Corpus builders pick the
    MinHash/Jaccard cut by exactly this curve (too low deletes
    boilerplate-sharing legitimate pages, too high leaves paraphrase
    spam) — X150 sweeps the quality gates, this sweeps the dedup gate,
    and X76/X121 (recall/precision) say how trustworthy the candidate
    set is at each point.

    Exactness: pair scores come from `verify_candidates` (exact
    shingle Jaccard in basis points); a pair score is bucketed to
    floor(score/step)·step, and since grid thresholds are multiples
    of ``step_bp``, score ≥ t ⟺ bucket ≥ t — the cumulative histogram
    IS the exact answer, no per-threshold rescan. Documents count via
    each doc's MAX pair score (a doc appears at every t ≤ its max),
    the same histogram trick at doc grain.

    Scale shape: ONE verified-pair table feeds two bounded
    aggregations (≤ grid-size histogram rows each); the grid explodes
    from a literal sequence; cumulative windows run over ≤ (hi−lo)/
    step rows. No per-threshold work anywhere."""
    from pyspark.sql import Window

    pairs = verify_candidates(docs, text_col=text_col).select(
        "doc_a", "doc_b",
        (F.floor(F.col("jaccard_bp") / step_bp) * step_bp)
        .cast("bigint").alias("__bucket"),
    )
    pair_hist = pairs.groupBy("__bucket").agg(
        F.count("*").cast("bigint").alias("n")
    )
    doc_max = (
        pairs.select(F.col("doc_a").alias("doc"), "__bucket")
        .unionByName(pairs.select(F.col("doc_b").alias("doc"), "__bucket"))
        .groupBy("doc").agg(F.max("__bucket").alias("__bucket"))
        .groupBy("__bucket").agg(F.count("*").cast("bigint").alias("n"))
    )
    grid = docs.sparkSession.range(1).select(
        F.explode(
            F.sequence(F.lit(lo_bp), F.lit(hi_bp), F.lit(step_bp))
        ).alias("__t")
    ).select(F.col("__t").cast("bigint").alias("threshold_bp"))
    w_ge = Window.orderBy(F.col("__bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pair_cum = pair_hist.select(
        "__bucket", F.sum("n").over(w_ge).cast("bigint").alias("n_pairs")
    )
    doc_cum = doc_max.select(
        "__bucket", F.sum("n").over(w_ge).cast("bigint").alias("n_docs")
    )

    def _ge_lookup(cum: DataFrame, out: str) -> DataFrame:
        # value at threshold t = cumulative count of the smallest
        # bucket ≥ t (buckets and grid share the step lattice)
        return (
            grid.join(
                F.broadcast(cum),
                cum["__bucket"] >= F.col("threshold_bp"), "left"
            )
            .groupBy("threshold_bp")
            .agg(F.coalesce(F.max(out), F.lit(0)).cast("bigint").alias(out))
        )

    return (
        _ge_lookup(pair_cum, "n_pairs")
        .join(_ge_lookup(doc_cum, "n_docs"), "threshold_bp")
        .orderBy("threshold_bp")
    )


def ngram_novelty(new: DataFrame, history: DataFrame, k: int = 3,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty_bp) — per-document k-gram
    NOVELTY against a history corpus: the share of a new document's
    distinct word k-grams never seen in history. The sub-document
    freshness gate incremental ingestion needs between X2's doc-grain
    verdict and X32's span extraction: a "new" page whose novelty is
    near zero is recombined old content (syndication remix, template
    re-render) even when no single historical document matches it —
    and a crawl batch whose aggregate novelty collapses has stopped
    discovering content, whatever its URL count says.

    Grams hash to 48-bit md5 prefixes (`md5_hash48` — collision odds
    ~n²/2^49: at 10^9 distinct grams a ~0.2% rate that BIASES novelty
    down uniformly; documented, acceptable for a rate gate; widen to
    the full digest if an exact ledger is needed). History collapses
    to DISTINCT gram hashes once
    (the reusable index — X158's discipline applies for maintaining
    it incrementally); the probe is one hash equi-join carrying
    (gram48, doc_id) — text never shuffles — and one doc-keyed
    partial agg."""
    from docling_serve_spark.operators.sampling import md5_hash48

    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.array_distinct(raw_shingles(F.col(text_col), k=k))
            ).alias("__g"),
        ).select("__id", md5_hash48(F.col("__g")).alias("__h"))

    hist = grams(history).select("__h").distinct() \
        .withColumn("__seen", F.lit(True))
    probe = grams(new).join(hist, "__h", "left")
    return (
        probe.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.col("__seen").isNull().cast("bigint")).cast("bigint")
            .alias("n_novel"),
        )
        .select(
            id_col, "n_grams", "n_novel",
            F.expr("(10000 * n_novel) div greatest(n_grams, 1)")
            .cast("bigint").alias("novelty_bp"),
        )
    )


def jaccard_prefix_join(docs: DataFrame, t_num: int = 3, t_den: int = 5,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """X226 — LOSSLESS exact set-similarity self-join via prefix
    filtering (Chaudhuri/Ganti/Kaushik ICDE 2006; Xiao et al. WWW
    2008 ppjoin's base filter): two token SETS with Jaccard ≥ t MUST
    share a token inside each one's (n − ⌈t·n⌉ + 1)-token prefix
    under any single global token order — so candidate generation
    explodes only prefixes (ordered rarest-first by corpus df, which
    makes prefixes maximally selective) instead of whole sets, and
    NOTHING above the threshold can be missed. The recall-certified
    alternative to the df-capped candidate join (X4), which trades
    recall on pairs that share only ultra-common tokens; here the
    common tokens sit at the ORDER's end and rarely enter prefixes,
    shrinking candidates without dropping a single qualifying pair.

    Threshold is the exact rational t_num/t_den; the verify step is
    integer cross-multiplication (t_den·inter ≥ t_num·(n_a+n_b−inter))
    — no float Jaccard anywhere. Emits (doc_id_a, doc_id_b, inter,
    n_a, n_b, jaccard_bp), a < b, jaccard_bp = (10000·inter) div
    union.

    Shape at scale: token df is one corpus aggregation; per-doc
    ordering is a partitioned window at (doc, token) grain; the
    candidate join shuffles PREFIX tokens only (each prefix token
    carries (id, n) — never text); verification joins the candidate
    pair set back to full token lists with two hash joins. ⌈t·n⌉ is
    exact integer arithmetic ((t_num·n + t_den − 1) div t_den)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.filter(tokens(F.col(text_col)),
                                      lambda x: x != ""))
        ).alias("tok"),
    )
    df_tbl = toks.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("df")
    )
    from pyspark.sql import Window

    ordered = toks.join(df_tbl, "tok")
    sizes = toks.groupBy("id").agg(F.count("*").cast("bigint").alias("n"))
    w = Window.partitionBy("id").orderBy(
        F.col("df").asc(), F.col("tok").asc()
    )
    ranked = (
        ordered.withColumn("pos", F.row_number().over(w))
        .join(sizes, "id")
        .withColumn(
            "prefix_len",
            (F.col("n")
             - F.expr(f"({t_num} * n + {t_den - 1}) div {t_den}")
             + 1).cast("bigint"),
        )
    )
    prefix = ranked.filter(F.col("pos") <= F.col("prefix_len")).select(
        "tok", "id", "n"
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .filter(F.col("a.id") < F.col("b.id"))
        # length filter: |A∩B| <= min(n) and J >= t needs
        # t_den*min >= t_num*max … prune size-incompatible pairs early
        .filter(
            F.lit(t_den) * F.least(F.col("a.n"), F.col("b.n"))
            >= F.lit(t_num) * F.greatest(F.col("a.n"), F.col("b.n"))
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b"),
        )
        .distinct()
    )
    ta = toks.select(F.col("id").alias("id_a"), "tok")
    tb = toks.select(F.col("id").alias("id_b"), "tok")
    inter = (
        cand.join(ta, "id_a").join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    return (
        inter.filter(
            F.lit(t_den) * F.col("inter")
            >= F.lit(t_num) * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
        .select(
            F.col("id_a").alias("doc_id_a"),
            F.col("id_b").alias("doc_id_b"),
            "inter", "n_a", "n_b",
            F.expr("(10000 * inter) div (n_a + n_b - inter)")
            .cast("bigint").alias("jaccard_bp"),
        )
    )
