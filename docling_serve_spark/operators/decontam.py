"""Benchmark decontamination: flag corpus documents that share word
k-grams with an evaluation/benchmark set.

The standard pre-training hygiene pass (GPT-3 appendix C, PaLM §5,
Llama-2 §A.6 all run an n-gram-overlap decontamination between the
training corpus and their eval benchmarks). Semantics here: a document
is contaminated iff any of its overlapping word k-grams (over the
shared dedup normalization) appears anywhere in the benchmark text.

Scale shape — the one place a broadcast is *correct by nature of the
data*: benchmark suites are bounded (thousands of questions, at most
millions of k-grams) while the corpus side is the 10^12-document
table. So the benchmark gram set is broadcast and the corpus side
never shuffles raw grams: the broadcast hash join runs map-side inside
the scan stage, and the only shuffle is the per-doc hit-count partial
aggregation (doc_id key, map-side combined). Corpus docs shorter than
k tokens have no k-gram and are trivially clean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from docling_serve_spark.operators.dedup import hof_let, norm_text


def kgrams(text_col: Column, k: int) -> Column:
    """Array of overlapping word k-grams of the normalized text.
    Callers must pre-filter rows with fewer than k tokens:
    ``F.sequence`` generates a *descending* range when start > stop,
    so an unguarded short row would fabricate bogus grams."""
    return hof_let(
        F.split(norm_text(text_col), " "),
        lambda toks: F.transform(
            F.sequence(F.lit(1), (F.size(toks) - (k - 1)).cast("int")),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    )


def contamination_flags(docs: DataFrame, benchmark: DataFrame,
                        text_col: str = "text",
                        bench_text_col: str = "text",
                        k: int = 6) -> DataFrame:
    """(doc_id, n_gram_hits, contaminated) for every corpus document.

    ``n_gram_hits`` counts corpus-side gram *occurrences* that appear
    in the benchmark gram set (a gram repeated in the doc counts each
    time); ``contaminated`` is hits > 0. The benchmark side is
    deduplicated then broadcast.
    """
    toks_n = F.size(F.split(norm_text(F.col(text_col)), " "))
    bench_n = F.size(F.split(norm_text(F.col(bench_text_col)), " "))

    bench_grams = (
        benchmark.filter(bench_n >= k)
        .select(F.explode(kgrams(F.col(bench_text_col), k)).alias("gram"))
        .distinct()
    )
    corpus_grams = (
        docs.filter(toks_n >= k)
        .select("doc_id", F.explode(kgrams(F.col(text_col), k)).alias("gram"))
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "inner")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_gram_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            F.col("doc_id").cast("bigint"),
            F.coalesce(F.col("n_gram_hits"), F.lit(0)).cast("bigint")
            .alias("n_gram_hits"),
            (F.coalesce(F.col("n_gram_hits"), F.lit(0)) > 0)
            .alias("contaminated"),
        )
    )


def contamination_ratio(docs: DataFrame, benchmark: DataFrame,
                        text_col: str = "text",
                        bench_text_col: str = "text",
                        bench_id_col: str = "bench_id",
                        k: int = 3,
                        threshold_bp: int = 5000) -> DataFrame:
    """(doc_id, n_bench_hits, max_containment_bp, contaminated) —
    FUZZY decontamination: per (document, benchmark entry), the share
    of the entry's distinct word k-grams present in the document,
    in basis points. This is the fractional-overlap semantic the
    production reports use (GPT-4 system card appendix C and PaLM §5
    both define an eval example as contaminated when a *fraction* of
    its n-grams appears in training data, not on a single hit), and it
    is deliberately tolerant where ``contamination_flags`` is brittle:
    a single edited word in a leaked 8-token question kills every
    6-gram (exact pass: clean) but only k of its 3-grams (this pass:
    ~50% containment, flagged at the default threshold).

    Directional by design: the denominator is the BENCHMARK entry's
    gram count, never min(sizes) — the question is "how much of this
    eval item leaked", and a 5,000-token document containing a whole
    8-token question is 100% leakage, not 0.4%.

    Scale shape (same argument as ``contamination_flags``): the
    benchmark side is bounded, so its gram set and gram counts are
    broadcast; the corpus side is one explode over the scan, the gram
    probe is a map-side broadcast hash join, and the only shuffles are
    the (doc_id, bench_id) hit count and the per-doc rollup — both
    map-side combined, both bounded by actual hits rather than corpus
    size. Integer-exact: (10000 * n_inter) div n_bench_grams in pure
    bigint (n_inter <= n_bench_grams <= entry length).

    Reference anchor: the reference converts documents one at a time
    (docling_serve/datamodel/requests.py) and has no corpus-hygiene
    tier; this extends the engine's X19 exact pass."""
    from docling_serve_spark.operators.dedup import word_shingles

    bench_grams = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(word_shingles(F.col(bench_text_col), k)).alias("gram"),
    ).distinct()
    bench_sizes = bench_grams.groupBy("bench_id").agg(
        F.count("*").cast("bigint").alias("n_bench_grams")
    )
    doc_grams = docs.select(
        "doc_id",
        F.explode(word_shingles(F.col(text_col), k)).alias("gram"),
    )
    pair = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    scored = pair.join(F.broadcast(bench_sizes), "bench_id").select(
        "doc_id", "bench_id",
        F.expr("(10000 * n_inter) div n_bench_grams")
        .cast("bigint").alias("containment_bp"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("containment_bp") >= threshold_bp, 1).otherwise(0)
        ).cast("bigint").alias("n_bench_hits"),
        F.max("containment_bp").cast("bigint").alias("max_containment_bp"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            F.col("doc_id").cast("bigint"),
            F.coalesce(F.col("n_bench_hits"), F.lit(0)).cast("bigint")
            .alias("n_bench_hits"),
            F.coalesce(F.col("max_containment_bp"), F.lit(0)).cast("bigint")
            .alias("max_containment_bp"),
            (F.coalesce(F.col("n_bench_hits"), F.lit(0)) > 0)
            .alias("contaminated"),
        )
    )


def canary_scan(docs: DataFrame, canaries: DataFrame,
                id_col: str = "doc_id", text_col: str = "text",
                canary_col: str = "canary") -> DataFrame:
    """(canary, n_docs, n_hits) — canary-GUID contamination scan: eval
    suites embed a unique canary string (BIG-bench's canary GUID is
    the convention) precisely so corpus builders can prove their
    training data never saw the benchmark — one hit means the
    benchmark FILE leaked into the crawl, a stronger and cheaper
    signal than X19/X102's n-gram overlap (which catch quoted
    EXAMPLES; the canary catches wholesale file ingestion). Zero-hit
    canaries are reported with explicit zeros — the audit's deliverable
    is the attestation, not just the alarms.

    The canary list is dozens of rows: it collects to the driver once
    (bounded, the ivf-centroid discipline) and becomes ONE alternation
    regexp, so the corpus is scanned once for ALL canaries — never a
    per-canary pass and never a doc×canary join; hits explode to
    (canary, doc) and ONE partial agg + a broadcast left join back to
    the canary list produces the zeros."""
    import re as _re

    vals = [r[canary_col] for r in canaries.select(canary_col).collect()]
    if not vals:
        return canaries.select(
            F.col(canary_col).alias("canary"),
            F.lit(0).cast("bigint").alias("n_docs"),
            F.lit(0).cast("bigint").alias("n_hits"),
        )
    pat = "|".join(_re.escape(v) for v in sorted(vals))
    hits = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            ).alias("canary"),
        )
        .groupBy("canary")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_hits"),
        )
    )
    return (
        canaries.select(F.col(canary_col).alias("canary"))
        .join(F.broadcast(hits), "canary", "left")
        .select(
            "canary",
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        )
        .orderBy("canary")
    )


def contamination_weighted(docs: DataFrame, benchmark: DataFrame,
                           text_col: str = "text",
                           bench_text_col: str = "text",
                           k: int = 6,
                           flag_micro: int = 4_000_000) -> DataFrame:
    """(doc_id, n_hit_grams, weight_micro, contaminated_weighted) —
    rarity-WEIGHTED decontamination. X19's exact matcher treats every
    shared k-gram alike, so ubiquitous boilerplate ("all rights
    reserved to the" …) fires as loudly as a benchmark's distinctive
    prompt — at corpus scale the flat flag either over-fires or needs
    a hit-count cut that misses single-phrase leaks. Here each DISTINCT
    matched gram contributes its corpus IDF in micro-nats —
    w = L(N) − L(df), L(x) = floor(ln(x)·1e6) quantized per value
    (the charlm discipline: integer sums, bit-reproducible) — and the
    flag fires on summed weight ≥ ``flag_micro``: one gram private to
    <2% of the corpus outweighs dozens of stock phrases. This is the
    tf-idf escalation of the Brown/GPT-3-style n-gram overlap check
    (Brown et al. 2020, Appendix C measures benchmark overlap with
    exactly such high-order n-grams).

    Scale shape: corpus grams explode once and reduce to DISTINCT
    (doc, gram); df is one gram-grain partial agg over that same
    relation; the benchmark side deduplicates then semi-joins (hits
    only carry gram + two longs); N is a one-row broadcast total. No
    windows."""
    n_docs = docs.select(
        F.count("*").cast("bigint").alias("__n")
    )
    cg = (
        docs.filter(F.size(F.split(norm_text(F.col(text_col)), " ")) >= k)
        .select("doc_id",
                F.explode(kgrams(F.col(text_col), k)).alias("gram"))
        .distinct()
    )
    df_tab = cg.groupBy("gram").agg(
        F.count("*").cast("bigint").alias("__df")
    )
    bg = (
        benchmark.filter(
            F.size(F.split(norm_text(F.col(bench_text_col)), " ")) >= k)
        .select(F.explode(kgrams(F.col(bench_text_col), k)).alias("gram"))
        .distinct()
    )
    ln_micro = lambda c: F.floor(F.log(c) * F.lit(1_000_000))  # noqa: E731
    hits = (
        cg.join(bg, "gram", "leftsemi")
        .join(df_tab, "gram")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            (ln_micro(F.col("__n")) - ln_micro(F.col("__df")))
            .cast("bigint").alias("w"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_hit_grams"),
            F.sum("w").cast("bigint").alias("weight_micro"),
        )
    )
    return (
        docs.select(F.col("doc_id").cast("bigint"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).cast("bigint")
            .alias("n_hit_grams"),
            F.coalesce(F.col("weight_micro"), F.lit(0)).cast("bigint")
            .alias("weight_micro"),
            (F.coalesce(F.col("weight_micro"), F.lit(0))
             >= flag_micro).alias("contaminated_weighted"),
        )
    )
