"""The composed training-mixture pipeline: filter chain → exact-dedup
winners → benchmark decontamination → domain-mix sampling → sequence
packing, as one declarative plan.

This is the end-to-end shape a corpus team actually runs (C4 and
RefinedWeb both publish exactly this gate order): every gate is an
already-oracle-proven operator, evaluated independently over the full
corpus, and a document survives iff it passes all of them. Evaluating
gates independently (rather than feeding each gate the previous gate's
survivors) keeps every stage a full-table scan with no ordering
dependency — the gates run concurrently and their doc_id-keyed results
meet in equi-joins that reuse one hash partitioning (Catalyst's
ENSURE_REQUIREMENTS sees identical keys and inserts no extra
exchange). Semantics are identical because all gates are pure
per-document predicates except exact-dedup, whose min-doc_id winner
rule is deliberately defined over the *full* corpus so resumes and
re-runs pick the same winner regardless of which subset is present.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from docling_serve_spark.operators.decontam import contamination_flags
from docling_serve_spark.operators.dedup import norm_text
from docling_serve_spark.operators.sampling import (
    domain_mix_sample,
    pack_sequences,
)
from docling_serve_spark.operators.textstats import corpus_filter_chain


def gate_flags(docs: DataFrame, benchmark: DataFrame, hosts: DataFrame,
               rates: DataFrame, text_col: str = "text",
               k: int = 6) -> DataFrame:
    """(doc_id, keep_filter, is_winner, clean, mix_kept) — every gate's
    verdict for every document. ``hosts`` is (doc_id, host);
    ``rates`` is (host, keep_ppm)."""
    fc = corpus_filter_chain(docs, text_col).select("doc_id", "keep")
    winners = (
        docs.select(
            F.md5(norm_text(F.col(text_col))).alias("fp"), F.col("doc_id")
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(True).alias("is_winner"))
    )
    dc = contamination_flags(docs, benchmark, text_col, k=k).select(
        "doc_id", (~F.col("contaminated")).alias("clean")
    )
    mx = domain_mix_sample(hosts, rates).select(
        "doc_id", F.col("kept").alias("mix_kept")
    )
    return (
        docs.select(F.col("doc_id").cast("bigint"))
        .join(fc, "doc_id")
        .join(winners, "doc_id", "left")
        .join(dc, "doc_id")
        .join(mx, "doc_id")
        .select(
            "doc_id",
            F.col("keep").alias("keep_filter"),
            F.coalesce(F.col("is_winner"), F.lit(False)).alias("is_winner"),
            "clean",
            "mix_kept",
        )
    )


def mixture_funnel(docs: DataFrame, benchmark: DataFrame, hosts: DataFrame,
                   rates: DataFrame, text_col: str = "text",
                   k: int = 6) -> DataFrame:
    """One-row attrition audit: documents surviving each cumulative
    gate, in pipeline order. A single aggregation over the gate
    flags — no per-stage actions, no recomputation."""
    f = gate_flags(docs, benchmark, hosts, rates, text_col, k)
    s1 = F.col("keep_filter")
    s2 = s1 & F.col("is_winner")
    s3 = s2 & F.col("clean")
    s4 = s3 & F.col("mix_kept")

    def cnt(c, name):
        return F.sum(c.cast("bigint")).cast("bigint").alias(name)

    return f.agg(
        F.count("*").cast("bigint").alias("n_input"),
        cnt(s1, "n_after_filter"),
        cnt(s2, "n_after_dedup"),
        cnt(s3, "n_after_decontam"),
        cnt(s4, "n_after_mix"),
    )


def build_training_mixture(docs: DataFrame, benchmark: DataFrame,
                           hosts: DataFrame, rates: DataFrame,
                           text_col: str = "text", k: int = 6,
                           seq_len: int = 512,
                           n_shards: int = 16) -> DataFrame:
    """Packed training sequences over the surviving documents:
    (doc_id, shard, n_tokens, bin_id, offset_in_bin)."""
    f = gate_flags(docs, benchmark, hosts, rates, text_col, k)
    surviving = f.filter(
        F.col("keep_filter") & F.col("is_winner") & F.col("clean")
        & F.col("mix_kept")
    ).select("doc_id")
    return pack_sequences(
        docs.join(surviving, "doc_id"), seq_len, n_shards, text_col
    )


def boilerplate_scrub(pages: DataFrame, host_col: str = "host",
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      frac_bp: int = 5000,
                      min_pages: int = 2) -> DataFrame:
    """Per-host boilerplate line removal — CCNet's line-level dedup
    (Wenzek et al., LREC 2020 §3.1) scoped to the host: a line that
    appears on ≥ ``min_pages`` distinct pages of a host AND on
    ≥ ``frac_bp``/10000 of that host's pages is nav/footer chrome,
    not content, and is excised from every page; document-unique
    lines always survive. Emits (doc_id, clean_text, n_lines_kept,
    n_lines_dropped).

    Decision rule is integer-exact (``n_docs·10000 ≥ frac_bp·pages``)
    so both engines agree at the boundary. Shuffle budget: lines are
    keyed by md5 so the count aggregation and the verdict join move
    32-hex keys, never line text twice; reassembly is one groupBy
    doc_id with ``sort_array`` over (pos, line) pairs — per-document
    state only, no global sort, host skew bounded by lines-per-host
    partial aggregation."""
    lines = pages.select(
        F.col(id_col).alias("__id"),
        F.col(host_col).alias("__host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    ).withColumn("__lk", F.md5(F.col("__line")))
    host_pages = pages.groupBy(F.col(host_col).alias("__host")).agg(
        F.countDistinct(id_col).cast("bigint").alias("__pages")
    )
    line_freq = lines.groupBy("__host", "__lk").agg(
        F.countDistinct("__id").cast("bigint").alias("__n_docs")
    )
    boiler = (
        line_freq.join(host_pages, "__host")
        .filter(
            (F.col("__n_docs") >= F.lit(min_pages))
            & (F.col("__n_docs") * F.lit(10000) >= F.lit(frac_bp) * F.col("__pages"))
        )
        .select("__host", "__lk", F.lit(True).alias("__boiler"))
    )
    verdict = lines.join(boiler, ["__host", "__lk"], "left")
    kept = F.when(F.col("__boiler").isNull(), F.struct("__pos", "__line"))
    return (
        verdict.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(kept).cast("bigint").alias("n_lines_kept"),
            (F.count("*") - F.count(kept)).cast("bigint").alias("n_lines_dropped"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s["__line"]
                ),
            ).alias("clean_text"),
        )
        .select(id_col, "clean_text", "n_lines_kept", "n_lines_dropped")
    )


#: C4's line-drop phrases (Raffel et al., JMLR 2020 §2.2: the
#: boilerplate-policy line filter) — matched case-insensitively.
C4_POLICY_RE = "cookie policy|privacy policy|terms of use|uses cookies"


def c4_clean(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id",
             bad_words: tuple[str, ...] = ()) -> DataFrame:
    """The C4 cleaning pass (Raffel et al., "Exploring the Limits of
    Transfer Learning with a Unified Text-to-Text Transformer", JMLR
    2020 §2.2) — the OTHER canonical line-level cleanup beside CCNet's
    per-host dedup (``boilerplate_scrub``). Line rules: keep only
    lines that end in terminal punctuation ``.!?"``, carry ≥ 5 words,
    and mention neither ``javascript`` nor a cookie/privacy/terms
    policy phrase. Page rules: flag (for dropping) pages containing
    ``lorem ipsum``, a ``{`` (code), or any caller-supplied bad-word
    list entry, and pages whose CLEANED text has < 3 sentences.

    Emits (doc_id, clean_text, n_lines_kept, n_lines_dropped,
    has_lorem_ipsum, has_brace, has_bad_word, n_sentences, keep_page).

    Shuffle budget: one posexplode → one groupBy(doc_id) reassembly
    (``sort_array`` over (pos, line) pairs — per-document state, no
    global sort) joined with a narrow page-flag projection; every
    predicate is codegen'd, no Python anywhere."""
    lines = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    line = F.col("__line")
    keep_line = (
        F.rtrim(line).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(line), r"\s+")) >= 5)
        & ~F.lower(line).contains("javascript")
        & ~F.lower(line).rlike(C4_POLICY_RE)
    )
    kept = F.when(keep_line, F.struct("__pos", "__line"))
    agg = lines.groupBy(F.col("__id").alias(id_col)).agg(
        F.count(kept).cast("bigint").alias("n_lines_kept"),
        (F.count("*") - F.count(kept)).cast("bigint").alias("n_lines_dropped"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda s: s["__line"]
            ),
        ).alias("clean_text"),
    )
    low = F.lower(F.col(text_col))
    # Blocklist entries are LITERALS, not patterns — real bad-word
    # lists carry ".", "(", "?" etc., which would silently change the
    # match (or fail to compile) if interpolated raw into rlike.
    # re.escape emits backslash-punctuation escapes, which Java regex
    # (Spark) and RE2/DuckDB read identically.
    bad = (
        low.rlike("|".join(re.escape(w) for w in bad_words))
        if bad_words else F.lit(False)
    )
    flags = docs.select(
        F.col(id_col),
        low.contains("lorem ipsum").alias("has_lorem_ipsum"),
        F.col(text_col).contains("{").alias("has_brace"),
        bad.alias("has_bad_word"),
    )
    n_sent = F.regexp_count(F.col("clean_text"), F.lit("[.!?]")).cast("bigint")
    return (
        agg.join(flags, id_col)
        .withColumn("n_sentences", n_sent)
        .select(
            F.col(id_col).cast("bigint"),
            "clean_text",
            "n_lines_kept",
            "n_lines_dropped",
            "has_lorem_ipsum",
            "has_brace",
            "has_bad_word",
            "n_sentences",
            (
                (F.col("n_sentences") >= 3)
                & ~F.col("has_lorem_ipsum")
                & ~F.col("has_brace")
                & ~F.col("has_bad_word")
            ).alias("keep_page"),
        )
    )


def source_scorecard(docs: DataFrame, verdicts: DataFrame,
                     source_col: str = "source",
                     text_col: str = "text") -> DataFrame:
    """(source, n_docs, n_tokens, n_dup_docs, dup_rate_bp, n_keep,
    keep_rate_bp) — the per-source acquisition scorecard: when a
    corpus mixes feeds (crawl segments, data vendors, dumps), the
    keep/duplication profile PER SOURCE is what decides renewals and
    mixture weights (the per-source quality tables the C4/RefinedWeb/
    Dolma papers publish). Composes two already-oracle-proven
    operators rather than re-deriving: within-source exact-dup
    counting on the shared ``norm_text`` md5 key and the
    ``corpus_filter_chain`` keep verdict (passed in as ``verdicts``:
    (doc_id, keep)).

    A doc is a duplicate when its normalized fingerprint occurs more
    than once WITHIN its source (vendor accountability — cross-source
    overlap is X1/X10's job). All rates bigint-div basis points.
    Shape: one (source, fp) partial-agg groupBy, one doc_id equi-join
    with the verdicts, one final partial-agg on source — fingerprints
    and flags shuffle, never text."""
    from docling_serve_spark.operators.dedup import norm_text
    from docling_serve_spark.operators.textstats import token_count

    per_doc = docs.select(
        F.col("doc_id"),
        F.col(source_col).alias("source"),
        F.md5(norm_text(F.col(text_col))).alias("fp"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    fp_counts = per_doc.groupBy("source", "fp").agg(
        F.count("*").cast("bigint").alias("fp_cnt")
    )
    j = (
        per_doc.join(fp_counts, ["source", "fp"])
        .join(verdicts.select("doc_id", "keep"), "doc_id")
    )
    agg = j.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("fp_cnt") > 1, 1).otherwise(0))
        .cast("bigint").alias("n_dup_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("bigint").alias("n_keep"),
    )
    return agg.select(
        "source", "n_docs", "n_tokens", "n_dup_docs",
        F.expr("(10000 * n_dup_docs) div n_docs").cast("bigint")
        .alias("dup_rate_bp"),
        "n_keep",
        F.expr("(10000 * n_keep) div n_docs").cast("bigint")
        .alias("keep_rate_bp"),
    )


def group_overlap(docs: DataFrame, label_col: str,
                  text_col: str = "text") -> DataFrame:
    """(label_a, label_b, n_shared, n_a, n_b, overlap_bp) — exact
    duplicate-content overlap between every pair of document groups,
    by normalized-text fingerprint ("What's In My Big Data?", Elazar
    et al., ICLR 2024 measures exactly this cross-corpus duplication;
    Dolma/RedPajama publish the per-source variant). Two first-class
    uses in one operator: ``label = source`` gives the cross-feed
    contamination matrix X72's within-source scorecard deliberately
    excludes; ``label = split`` audits train/eval LEAKAGE — any
    fingerprint straddling train and test is an eval answer sitting
    in the training set.

    ``overlap_bp = 10000 · n_shared div min(n_a, n_b)`` — containment
    of the smaller group, the form that flags a small eval split
    drowning in train-set copies even when the train side is huge.

    Scale shape: one (label, fp) distinct partial-agg, then per-fp
    sorted label SETS explode to label pairs — bounded by
    C(#labels, 2) per fingerprint, and #labels (sources/splits) is
    tiny, so a boilerplate fp shared by every group emits a constant
    number of pairs, never a quadratic doc join; one final pair
    groupBy. Only 16-byte fingerprints and short labels shuffle."""
    fps = docs.select(
        F.col(label_col).alias("label"),
        F.md5(norm_text(F.col(text_col))).alias("fp"),
    ).distinct()
    sizes = fps.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_fps")
    )
    per_fp = fps.groupBy("fp").agg(
        F.array_sort(F.collect_set("label")).alias("labels")
    ).where(F.size("labels") >= 2)
    pairs = per_fp.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("labels"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("labels"), i + 2,
                            F.size("labels") - i - 1
                        ),
                        lambda b: F.struct(a.alias("label_a"),
                                           b.alias("label_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.label_a", "p.label_b")
    shared = pairs.groupBy("label_a", "label_b").agg(
        F.count("*").cast("bigint").alias("n_shared")
    )
    return (
        shared
        .join(sizes.select(F.col("label").alias("label_a"),
                           F.col("n_fps").alias("n_a")), "label_a")
        .join(sizes.select(F.col("label").alias("label_b"),
                           F.col("n_fps").alias("n_b")), "label_b")
        .select(
            "label_a", "label_b", "n_shared", "n_a", "n_b",
            F.expr("(10000 * n_shared) div least(n_a, n_b)")
            .cast("bigint").alias("overlap_bp"),
        )
    )


def batch_drift(batch_a: DataFrame, batch_b: DataFrame,
                text_col: str = "text") -> DataFrame:
    """(bin, bin_lo, bin_hi, n_a, n_b, p_a_bp, p_b_bp, drift_bp,
    tv_total_bp) — ingest-drift monitor: the log2-binned document-
    length distribution of two crawl batches side by side, the per-bin
    share delta, and the total-variation distance between the two
    distributions. This is the between-snapshot check a continuously-
    fed corpus runs before mixing a new batch in (the PSI/TV drift
    gates every production feature store ships): a new crawl whose
    length profile jumps — boilerplate regression upstream, a parser
    change truncating pages, one giant host flooding the batch —
    shows up as TV mass in specific bins BEFORE it pollutes training
    mixes. TV distance (½·Σ|p_a − p_b|) is used instead of PSI
    because it needs no logarithms: the whole audit is bigint
    arithmetic on floor-rounded basis points, bit-identical across
    engines, while PSI's ln() would tie the result to one engine's
    libm rounding.

    Binning matches the X92 degree audit: ``length(bin(n))`` = bit
    length, bin b covering lengths [2^(b−1), 2^b − 1]; empty docs
    clamp to bin 1. ≤ 64 bins exist regardless of corpus size.

    Scale shape: each batch is one scan + one partial-agg groupBy on
    the bin key (≤ 64 groups); the join, the one-row totals
    broadcast, and the unbounded window all run over ≤ 64 rows.
    Nothing downstream of the two histogram aggs is proportional to
    corpus size."""
    return drift_from_histograms(
        length_histogram(batch_a, text_col).withColumnRenamed("n", "n_a"),
        length_histogram(batch_b, text_col).withColumnRenamed("n", "n_b"),
    )


def length_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(bin, n) — log2-binned document-length histogram (bit-length
    bins, X92's integer mechanism; empty docs clamp to bin 1). One
    partial-agged groupBy; ≤ 64 output rows at any corpus size. This
    is the mergeable summary the drift tier persists: histograms of
    disjoint batches ADD, so a cumulative reference needs one (bin,
    sum) rollup, never a re-scan of history."""
    return (
        docs.select(
            F.expr(
                f"CAST(length(bin(greatest(length({text_col}), 1))) "
                "AS BIGINT)"
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def drift_from_histograms(ha: DataFrame, hb: DataFrame) -> DataFrame:
    """``batch_drift``'s comparison stage over two pre-computed
    (bin, n_a) / (bin, n_b) histograms — the form the streaming drift
    monitor uses, where the reference side is a persisted cumulative
    histogram rather than raw documents."""
    from pyspark.sql import Window

    j = ha.join(hb, "bin", "full").fillna(0, ["n_a", "n_b"])
    # totals via the SAME single-partition window the TV sum needs —
    # an agg+crossJoin here would reference the histogram subtree
    # twice, and a lazy plan re-executes the referenced subtree: the
    # input would be scanned 4x instead of 2x (the hits_scores /
    # seed_distance failure class measured in BENCH.md). All windows
    # share one partitioning, so they cost ONE exchange of <= 64 rows.
    w = Window.partitionBy()
    scored = (
        j.withColumn("t_a", F.sum("n_a").over(w))
        .withColumn("t_b", F.sum("n_b").over(w))
        .select(
            "bin",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT) - 1)")
            .alias("bin_lo"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT)) - 1")
            .alias("bin_hi"),
            "n_a", "n_b",
            F.expr("(10000 * n_a) div greatest(t_a, 1)")
            .cast("bigint").alias("p_a_bp"),
            F.expr("(10000 * n_b) div greatest(t_b, 1)")
            .cast("bigint").alias("p_b_bp"),
        )
        .withColumn(
            "drift_bp",
            F.abs(F.col("p_a_bp") - F.col("p_b_bp")).cast("bigint"),
        )
    )
    return scored.withColumn(
        "tv_total_bp",
        (F.sum("drift_bp").over(w) / 2).cast("bigint"),
    )


def filter_agreement(verdicts_a: DataFrame, verdicts_b: DataFrame,
                     name_a: str = "a", name_b: str = "b") -> DataFrame:
    """(gate_a, gate_b, n_docs, n_both_keep, n_both_drop, n_only_a,
    n_only_b, keep_a_bp, keep_b_bp, agreement_bp) — the confusion
    cross-tab between two (doc_id, keep) filter verdicts: the gate-
    ablation measurement every filter-stack paper reports (FineWeb's
    ablations are exactly this table per rule) — two gates that agree
    on ~everything are redundant (drop the expensive one), gates that
    disagree heavily define the calibration set a human should look
    at, and the disagreement ROWS (n_only_a/n_only_b) are where each
    gate's unique contribution lives.

    Pure composition: ONE inner equi-join on doc_id, one global
    aggregate; all rates integer basis points."""
    a = verdicts_a.select("doc_id", F.col("keep").alias("keep_a"))
    b = verdicts_b.select("doc_id", F.col("keep").alias("keep_b"))
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        a.join(b, "doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            one(F.col("keep_a") & F.col("keep_b")).alias("n_both_keep"),
            one(~F.col("keep_a") & ~F.col("keep_b")).alias("n_both_drop"),
            one(F.col("keep_a") & ~F.col("keep_b")).alias("n_only_a"),
            one(~F.col("keep_a") & F.col("keep_b")).alias("n_only_b"),
        )
        .select(
            F.lit(name_a).alias("gate_a"),
            F.lit(name_b).alias("gate_b"),
            "n_docs", "n_both_keep", "n_both_drop", "n_only_a", "n_only_b",
            F.expr("(10000 * (n_both_keep + n_only_a)) "
                   "div greatest(n_docs, 1)").cast("bigint")
            .alias("keep_a_bp"),
            F.expr("(10000 * (n_both_keep + n_only_b)) "
                   "div greatest(n_docs, 1)").cast("bigint")
            .alias("keep_b_bp"),
            F.expr("(10000 * (n_both_keep + n_both_drop)) "
                   "div greatest(n_docs, 1)").cast("bigint")
            .alias("agreement_bp"),
        )
    )


def host_quality_prior(verdicts: DataFrame, pseudo_count: int = 20,
                       host_col: str = "host",
                       keep_col: str = "keep") -> DataFrame:
    """(host, n_docs, n_keep, raw_bp, global_bp, prior_bp) —
    empirical-Bayes host reputation: the per-host keep rate of a
    quality gate shrunk toward the corpus rate with ``pseudo_count``
    pseudo-observations (the beta-binomial posterior mean — the
    smoothing every production crawl planner applies before trusting
    a 3-document host; UGI/host-prior features in web-quality systems
    per Bergsma/Van Durme-style host aggregation). A 2-doc host with
    2 drops lands near the corpus rate, a 10k-doc host owns its own
    rate — exactly the signal X43's frontier gates and X23's host
    quotas should consume instead of raw small-sample rates.

        prior_bp = (10^4·n_keep + m·global_bp) div (n_docs + m)

    Integer-exact in bigints end-to-end: the corpus rate is first
    collapsed to basis points, so the numerator stays ≤ 10^4·n_keep +
    m·10^4 — headroom to n_keep ~ 9·10^14 per host, far past any real
    host at the 10^12-doc regime (collocations' int64 lesson applied:
    never multiply two corpus-scale counts).

    Scale shape: ONE partial-agg groupBy(host); the grand total is a
    second agg STACKED ON the same exchange (Spark's ReuseExchange
    dedupes the identical shuffle subtree, so the input is scanned
    once), collapsed to a one-row broadcast joined back host-side —
    never a global window over the host table."""
    m = int(pseudo_count)
    per_host = verdicts.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col(keep_col), 1).otherwise(0))
        .cast("bigint").alias("n_keep"),
    )
    totals = per_host.agg(
        F.sum("n_docs").alias("g_docs"), F.sum("n_keep").alias("g_keep")
    ).select(
        F.expr("(10000 * g_keep) div greatest(g_docs, 1)")
        .cast("bigint").alias("global_bp")
    )
    return per_host.crossJoin(F.broadcast(totals)).select(
        "host", "n_docs", "n_keep",
        F.expr("(10000 * n_keep) div greatest(n_docs, 1)")
        .cast("bigint").alias("raw_bp"),
        "global_bp",
        F.expr(f"(10000 * n_keep + {m} * global_bp) div (n_docs + {m})")
        .cast("bigint").alias("prior_bp"),
    )


_CONSENT_PAT = (
    r"we use cookies|accept all cookies|cookie settings|"
    r"consent to (the use of )?cookies|cookie policy|"
    r"manage (your )?preferences|by continuing to browse"
)


def consent_contamination(docs: DataFrame, host_col: str = "host",
                          text_col: str = "text") -> DataFrame:
    """(host, n_docs, n_contaminated, contaminated_bp, mean_hits_milli)
    — cookie-banner leakage audit over EXTRACTED text: consent
    boilerplate ('we use cookies…', 'accept all cookies…') that
    survived the boilerplate strip is the single most common template
    contamination in post-GDPR web corpora (documented in the C4 and
    FineWeb cleaning write-ups — the banner text gets memorized and
    regurgitated by models). Per host because the fix is per-host:
    a contaminated host means ITS consent widget defeats the
    extractor's density scorer — re-tune there (X132's yield audit
    says how much), don't grep the corpus per run.

    One marker regexp count riding the scan, ONE host partial agg;
    mean hit density in milli per doc (bigint div)."""
    hits = F.regexp_count(
        F.lower(F.col(text_col)), F.lit(_CONSENT_PAT)
    ).cast("bigint")
    return (
        docs.select(F.col(host_col).alias("host"), hits.alias("hits"))
        .groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
            .cast("bigint").alias("n_contaminated"),
            F.sum("hits").alias("total_hits"),
        )
        .select(
            "host", "n_docs", "n_contaminated",
            F.expr("(10000 * n_contaminated) div greatest(n_docs, 1)")
            .cast("bigint").alias("contaminated_bp"),
            F.expr("(1000 * total_hits) div greatest(n_docs, 1)")
            .cast("bigint").alias("mean_hits_milli"),
        )
        .orderBy("host")
    )


def ensemble_scores(flags: DataFrame, weights: dict[str, int],
                    id_col: str = "doc_id") -> DataFrame:
    """(score, n_docs, cum_docs, cum_share_bp) — integer ensemble
    scoring + threshold sweep: each boolean gate column contributes
    its integer weight, per-document scores roll into a distribution,
    and the cumulative column answers the sweep question every
    filter-stack ablation asks — "how much survives if we cut at
    score ≥ s?" (the FineWeb-edu classifier-threshold table, with
    auditable integer gate weights standing in for an opaque model
    score). Downstream, the chosen cut feeds X24's token budgeting
    and X20's mixture weights.

    Scale shape: the gates are evaluated upstream (each an audited
    operator); this adds ONE score partial agg over per-doc rows,
    then windows over the ≤ Σweights+1 distribution rows — the
    single-partition window is bounded by the score RANGE, never by
    corpus size (the drift_from_histograms discipline)."""
    from pyspark.sql import Window

    score = None
    for col_name, w in sorted(weights.items()):
        term = F.when(F.col(col_name), int(w)).otherwise(0)
        score = term if score is None else score + term
    per_doc = flags.select(score.cast("bigint").alias("score"))
    dist = per_doc.groupBy("score").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    w_cum = (
        Window.orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    return (
        dist.withColumn("cum_docs",
                        F.sum("n_docs").over(w_cum).cast("bigint"))
        .withColumn("total", F.sum("n_docs").over(w_all))
        .select(
            "score", "n_docs", "cum_docs",
            F.expr("(10000 * cum_docs) div greatest(total, 1)")
            .cast("bigint").alias("cum_share_bp"),
        )
        .orderBy(F.col("score").desc())
    )


def length_quantiles(docs: DataFrame, lang_col: str = "lang",
                     text_col: str = "text") -> DataFrame:
    """(lang, n_docs, p50_hi, p90_hi, p99_hi) — exact-by-construction
    length quantiles per language, resolved to power-of-2 bin upper
    bounds: doc lengths histogram into floor(log2)+1 bins (the
    batch_drift grid), cumulative counts give the bin containing each
    percentile, and the reported value is that bin's inclusive upper
    bound (2^bin − 1). Deliberately NOT approx_percentile: GK-sketch
    output depends on merge order and has no DuckDB twin, while the
    binned quantile is bit-reproducible at any scale and the grid is
    exactly what length policy needs (truncation/packing budgets are
    set in powers of two anyway — X21/X24's units).

    One (lang, bin) partial agg; cumulative windows run over ≤ 64
    bin rows per language, never over documents."""
    from pyspark.sql import Window

    b = F.expr(
        f"CAST(length(bin(greatest(length({text_col}), 1))) AS BIGINT)"
    )
    hist = docs.select(
        F.col(lang_col).alias("lang"), b.alias("bin")
    ).groupBy("lang", "bin").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w_cum = (
        Window.partitionBy("lang").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    scored = hist.select(
        "lang", "bin", "n",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    hi = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT)) "
                "- 1 AS BIGINT)")
    agg = scored.groupBy("lang").agg(
        F.max("total").cast("bigint").alias("n_docs"),
        *[
            F.min(F.when(F.col("cum") * 100 >= F.col("total") * q, hi))
            .cast("bigint").alias(f"p{q}_hi")
            for q in (50, 90, 99)
        ],
    )
    return agg.orderBy("lang")


def quality_trend(verdicts: DataFrame, snapshot_col: str = "snapshot",
                  keep_col: str = "keep") -> DataFrame:
    """(n_snapshots, first_bp, last_bp, slope_milli_bp, r2_milli) —
    the gate-pass-rate TREND across crawl snapshots, the ingest
    monitoring series a corpus operation watches between audits: X103
    (`batch_drift`) alarms on one batch's distribution jump, this fits
    the direction over the whole snapshot history — a steadily
    sinking pass rate means the crawl mix or the web itself is
    drifting against the gates and thresholds need recalibration
    before the mixture silently starves.

    Per snapshot the pass rate is integer basis points; the trend is
    an UNWEIGHTED least-squares slope of pass_bp on the snapshot
    index (chronological dense rank), in milli-bp per snapshot step,
    with the same cross-multiplied DECIMAL(38,0) sums and terminal
    double divisions as `zipf_fit` and the same degenerate guards.
    Everything after the one snapshot-keyed partial agg runs over
    ≤ n_snapshots rows."""
    from pyspark.sql import Window

    rates = verdicts.groupBy(F.col(snapshot_col).alias("snapshot")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col(keep_col).cast("bigint")).cast("bigint").alias("n_keep"),
    ).select(
        "snapshot",
        F.expr("(10000 * n_keep) div n").cast("bigint").alias("pass_bp"),
    )
    w = Window.orderBy("snapshot")
    pts = rates.select(
        F.row_number().over(w).cast("bigint").alias("x"),
        F.col("pass_bp").alias("y"),
        "snapshot",
    )
    sums = pts.agg(
        F.count("*").cast("bigint").alias("k"),
        F.min(F.struct("x", "y")).getField("y").cast("bigint")
        .alias("first_bp"),
        F.max(F.struct("x", "y")).getField("y").cast("bigint")
        .alias("last_bp"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))")
        .alias("sx"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))")
        .alias("sy"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))")
        .alias("sxy"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
        .alias("sxx"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))")
        .alias("syy"),
    )
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")
    r1 = num.cast("double") / den.cast("double")
    r2 = num.cast("double") / dyy.cast("double")
    slope = F.when(den == 0, F.lit(None).cast("bigint")) \
        .when(dyy == 0, F.lit(0).cast("bigint")) \
        .otherwise(F.floor(F.lit(1000.0) * r1).cast("bigint"))
    fit = F.when(den == 0, F.lit(None).cast("bigint")) \
        .when(dyy == 0, F.lit(1000).cast("bigint")) \
        .otherwise(F.floor(F.lit(1000.0) * r1 * r2).cast("bigint"))
    return sums.select(
        F.col("k").alias("n_snapshots"),
        "first_bp", "last_bp",
        slope.alias("slope_milli_bp"),
        fit.alias("r2_milli"),
    )


def lexicon_severity(docs: DataFrame, lexicon: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     density_cut_bp: int = 150) -> DataFrame:
    """(doc_id, n_tokens, n_hits, n_hit_terms, max_severity,
    sev_density_bp, action) — weighted harmful-term scoring against a
    curated ``(term, severity)`` lexicon (severity 1=mild profanity /
    2=adult-commercial / 3=egregious), the graded form of C4's flat
    bad-word list (X59 *removes lines* on an unweighted list; real
    moderation pipelines publish tiered lexicons — Jigsaw, LDNOOBW —
    where one tier-3 term outweighs any count of tier-1 hits).
    Verdict: ``drop`` if any severity-3 term appears or the
    severity-weighted density ``10^4·Σseverity/n_tokens`` crosses
    ``density_cut_bp``; ``flag`` on any lesser hit (route to X17's
    scrubbing rather than discard); ``keep`` otherwise. Zero-hit docs
    ARE emitted (keep) — this is a routing verdict over the corpus,
    not a hit report.

    Scale shape: per-doc token counts come from one codegen
    ``size(filter(split(...)))`` — no explode needed for the
    denominator; hits are one explode + one BROADCAST hash join
    against the lexicon (curated lists are thousands of rows — never
    a shuffle side) + one map-side-combined doc rollup; the zero-hit
    rejoin is doc-keyed. Integer arithmetic throughout (basis points
    via integral div)."""
    toks = F.expr(
        f"filter(split(lower(trim({text_col})), '\\\\s+'), x -> x <> '')"
    )
    base = docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        toks.alias("__toks"),
    )
    hits = (
        base.select(F.col(id_col), F.explode("__toks").alias("__w"))
        .join(
            F.broadcast(
                lexicon.select(
                    F.col("term").alias("__w"),
                    F.col("severity").cast("bigint").alias("__sev"),
                )
            ),
            "__w",
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_hits"),
            F.countDistinct("__w").cast("bigint").alias("n_hit_terms"),
            F.max("__sev").cast("bigint").alias("max_severity"),
            F.sum("__sev").cast("bigint").alias("__sev_sum"),
        )
    )
    joined = base.drop("__toks").join(hits, id_col, "left").select(
        id_col, "n_tokens",
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        F.coalesce("n_hit_terms", F.lit(0)).cast("bigint")
        .alias("n_hit_terms"),
        F.coalesce("max_severity", F.lit(0)).cast("bigint")
        .alias("max_severity"),
        F.expr(
            "(10000 * coalesce(__sev_sum, 0)) div greatest(n_tokens, 1)"
        ).cast("bigint").alias("sev_density_bp"),
    )
    return joined.withColumn(
        "action",
        F.when(
            (F.col("max_severity") >= 3)
            | (F.col("sev_density_bp") >= F.lit(density_cut_bp)),
            F.lit("drop"),
        ).when(F.col("n_hits") > 0, F.lit("flag"))
        .otherwise(F.lit("keep")),
    )


def effective_token_supply(docs: DataFrame, text_col: str = "text",
                           source_col: str = "source") -> DataFrame:
    """(source, n_docs, n_dup_docs, n_tokens, eff_tokens_bp,
    dup_overhead_bp) — the mixture planner's REAL inventory: raw token
    counts overstate what a source contributes once global exact dedup
    runs, so each document is discounted by its duplicate-cluster size
    (a family of c byte-identical docs contributes its token mass
    once, split as 1/c per member — the RefinedWeb/CCNet accounting;
    clusters are GLOBAL across sources, so a wire story syndicated
    into five sources is worth 1/5 in each, not 1 in each). X22's
    mixture weights and X24's token budgets should draw on
    eff_tokens_bp, not n_tokens, or duplicated sources get
    over-allocated exactly in proportion to how duplicated they are.

    Integer-exact: per-doc discounted mass is (n_tok · 10000) div
    csize (bp-tokens, bigint) summed per source; dup_overhead_bp =
    10000 − (Σeff / Σraw) in bp. Scale shape: one digest-grain
    partial-agg groupBy for cluster sizes, one digest equi-join to
    carry them back (exchanges hold 16-byte digests + two longs, never
    text), one source-grain rollup. No windows."""
    d = docs.select(
        F.col(source_col).alias("source"),
        F.md5(norm_text(F.col(text_col))).alias("digest"),
        F.size(F.filter(
            F.split(norm_text(F.col(text_col)), " "),
            lambda w: w != "",
        )).cast("bigint").alias("n_tok"),
    )
    csize = d.groupBy("digest").agg(
        F.count("*").cast("bigint").alias("csize")
    )
    per_doc = d.join(csize, "digest").select(
        "source", "n_tok", "csize",
        F.expr("(n_tok * 10000) div csize").cast("bigint").alias("eff_bp"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("csize") > 1, 1).otherwise(0))
            .cast("bigint").alias("n_dup_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("eff_bp").cast("bigint").alias("eff_tokens_bp"),
        )
        .select(
            "source", "n_docs", "n_dup_docs", "n_tokens",
            "eff_tokens_bp",
            (F.lit(10000) - F.expr(
                "eff_tokens_bp div greatest(n_tokens, 1)"
            )).cast("bigint").alias("dup_overhead_bp"),
        )
    )
