"""Character n-gram language-model quality scoring — the CCNet-style
corpus filter (Wenzek et al., LREC 2020 score documents with a LM
trained on a trusted corpus and keep the low-perplexity tail; KenLM
there, a char-trigram add-one model here, which is deterministic,
trains in two hash aggregations, and needs no external artifacts).

Float discipline: double SUMs are order-dependent across engines, so
each trigram's log-probability is quantized to MICRO-NATS
(``floor(ln(p) * 1e6)`` as bigint) and documents aggregate exact
integers; only the final per-doc average is a (deterministic,
single-op) double. That keeps the driver's value-hash engine-stable.

Scale shape: the model key space is bounded by charset³ (trigrams) /
charset² (prefixes) — a few million rows at worst, so the score join
is AQE-broadcastable in practice while written as a plain shuffle
join for safety. Trigram extraction is a JVM-side
``sequence``/``explode`` (no Python), one row per character position.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_MICRO = 1000000


def _trigrams(docs: DataFrame, text_col: str, id_col: str,
              max_chars: int | None = None) -> DataFrame:
    """(id, tri) — one row per character position; docs shorter than
    3 chars contribute nothing.

    ``max_chars`` caps the scored prefix: ``F.sequence`` materializes
    the full per-row position array BEFORE exploding, so an uncapped
    multi-MB outlier document allocates a same-sized JVM array in one
    task. At corpus scale always set a cap (CCNet itself scores a
    prefix; the quality estimate converges in a few thousand chars)."""
    t = F.col(text_col)
    if max_chars is not None:
        t = t.substr(F.lit(1), F.lit(max_chars))
    return (
        docs.filter(F.length(t) >= 3)
        .select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.sequence(F.lit(1), F.length(t) - 2)
            ).alias("__pos"),
            t.alias("__t"),
        )
        .select(
            "__id", F.col("__t").substr(F.col("__pos"), F.lit(3)).alias("tri")
        )
    )


def train_char_lm(ref: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  max_chars: int | None = None) -> tuple[DataFrame, DataFrame, Column]:
    """Add-one char-trigram model from the trusted slice: returns
    (trigram counts, prefix counts, vocab-size scalar DataFrame)."""
    tri = _trigrams(ref, text_col, id_col, max_chars)
    tri_counts = tri.groupBy("tri").agg(
        F.count("*").cast("bigint").alias("c_tri")
    )
    prefix_counts = tri.select(
        F.substring("tri", 1, 2).alias("prefix")
    ).groupBy("prefix").agg(F.count("*").cast("bigint").alias("c_prefix"))
    vocab = tri.select(
        F.substring("tri", 3, 1).alias("last")
    ).agg(F.countDistinct("last").cast("bigint").alias("v"))
    return tri_counts, prefix_counts, vocab


def charlm_score(docs: DataFrame, ref: DataFrame,
                 text_col: str = "text",
                 id_col: str = "doc_id",
                 max_chars: int | None = None) -> DataFrame:
    """(doc_id, n_trigrams, sum_logprob_micro, avg_logprob) — per-doc
    average trigram log-probability under the trusted-slice model.
    Higher (closer to 0) = more like the trusted corpus; the CCNet
    keep-rule thresholds this column.

    P(c₃|c₁c₂) = (c(tri)+1)/(c(prefix)+V); unseen prefix → 1/V.
    Each trigram contributes ``floor(ln(p)·1e6)`` micro-nats (exact
    bigint aggregation, engine-order-independent)."""
    tri_counts, prefix_counts, vocab = train_char_lm(
        ref, text_col, id_col, max_chars
    )
    return _score_against(docs, tri_counts, prefix_counts, vocab,
                          text_col, id_col, max_chars)


def _score_against(docs: DataFrame, tri_counts: DataFrame,
                   prefix_counts: DataFrame, vocab: DataFrame,
                   text_col: str, id_col: str,
                   max_chars: int | None) -> DataFrame:
    # pre-aggregate (doc, tri) BEFORE the model join: the join input
    # shrinks from one row per character to one row per distinct
    # trigram per doc (~5-20x), and the per-trigram micro-nat value is
    # deterministic, so weighting by the count is exact
    doc_tri = (
        _trigrams(docs, text_col, id_col, max_chars)
        .groupBy("__id", "tri")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withColumn("prefix", F.substring("tri", 1, 2))
    )
    joined = (
        doc_tri.join(tri_counts, "tri", "left")
        .join(prefix_counts, "prefix", "left")
        .crossJoin(F.broadcast(vocab))
    )
    p = (
        (F.coalesce(F.col("c_tri"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c_prefix"), F.lit(0)) + F.col("v"))
    )
    micro = F.floor(F.log(p) * F.lit(_MICRO)).cast("bigint")
    return (
        joined.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.sum("cnt").cast("bigint").alias("n_trigrams"),
            F.sum(micro * F.col("cnt")).cast("bigint").alias("sum_logprob_micro"),
        )
        .select(
            id_col,
            "n_trigrams",
            "sum_logprob_micro",
            F.round(
                F.col("sum_logprob_micro")
                / (F.col("n_trigrams") * F.lit(_MICRO)),
                6,
            ).alias("avg_logprob"),
        )
    )


def _hashed_bigrams(docs: DataFrame, text_col: str, id_col: str,
                    n_buckets: int) -> DataFrame:
    """(id, bucket) — one row per word-bigram occurrence, feature-hashed
    into ``n_buckets`` via the cross-engine md5 48-bit prefix hash.
    Tokenization matches `host_top_terms`: lowercase, non-alpha splits."""
    from docling_serve_spark.operators.sampling import md5_hash48

    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda x: F.length(x) >= 1,
    )
    return (
        docs.select(F.col(id_col).alias("__id"), words.alias("__w"))
        .filter(F.size("__w") >= 2)
        .select(
            "__id",
            F.explode(
                F.transform(
                    F.slice(F.col("__w"), 1, F.size("__w") - 1),
                    lambda x, i: F.concat(
                        x, F.lit(" "), F.element_at(F.col("__w"), i + 2)
                    ),
                )
            ).alias("__bg"),
        )
        .select(
            "__id",
            F.pmod(md5_hash48(F.col("__bg")), F.lit(n_buckets)).alias("bucket"),
        )
    )


def dsir_weights(docs: DataFrame, ref: DataFrame,
                 text_col: str = "text",
                 id_col: str = "doc_id",
                 n_buckets: int = 8192) -> DataFrame:
    """(doc_id, n_features, weight_micro, avg_weight) — DSIR-style
    importance weights (Xie et al., NeurIPS 2023: Data Selection for
    Language Models via Importance Resampling): bag-of-hashed-word-
    bigram unigram models are fit on the TARGET slice and on the RAW
    corpus; each document's log importance weight is the sum over its
    hashed features of ln(p_target[b] / p_raw[b]). High weight = looks
    like the target distribution relative to the crawl background —
    the resampling step then feeds `domain_mix_sample` /
    `token_budget_select`.

    Same float discipline as `charlm_score`: each bucket's log-ratio is
    quantized to micro-nats (floor(ln(pt/pr)·1e6) as bigint) so per-doc
    sums are exact integers, engine-order-independent. Both models use
    add-one smoothing over the ``n_buckets`` feature space.

    Scale shape: feature extraction is a narrow explode (text never
    shuffles — only 48-bit hashes); both models are bounded by
    ``n_buckets`` rows, so the score join is AQE-broadcastable while
    written as a plain join; per-doc reduction is one partial-agg
    hash aggregation keyed on doc id."""
    tgt = _hashed_bigrams(ref, text_col, id_col, n_buckets)
    raw = _hashed_bigrams(docs, text_col, id_col, n_buckets)
    tgt_counts = tgt.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("c_t")
    )
    raw_counts = raw.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("c_r")
    )
    tgt_total = tgt.agg(F.count("*").cast("bigint").alias("n_t"))
    raw_total = raw.agg(F.count("*").cast("bigint").alias("n_r"))
    doc_feats = raw.groupBy("__id", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    joined = (
        doc_feats.join(tgt_counts, "bucket", "left")
        .join(raw_counts, "bucket", "left")
        .crossJoin(F.broadcast(tgt_total))
        .crossJoin(F.broadcast(raw_total))
    )
    log_ratio = F.log(
        (F.coalesce(F.col("c_t"), F.lit(0)) + 1).cast("double")
        / (F.col("n_t") + F.lit(n_buckets))
    ) - F.log(
        (F.coalesce(F.col("c_r"), F.lit(0)) + 1).cast("double")
        / (F.col("n_r") + F.lit(n_buckets))
    )
    micro = F.floor(log_ratio * F.lit(_MICRO)).cast("bigint")
    return (
        joined.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.sum("cnt").cast("bigint").alias("n_features"),
            F.sum(micro * F.col("cnt")).cast("bigint").alias("weight_micro"),
        )
        .select(
            id_col,
            "n_features",
            "weight_micro",
            F.round(
                F.col("weight_micro") / (F.col("n_features") * F.lit(_MICRO)),
                6,
            ).alias("avg_weight"),
        )
    )


def perplexity_buckets(docs: DataFrame, ref: DataFrame,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       lang_col: str = "lang",
                       max_chars: int | None = None) -> DataFrame:
    """(doc_id, lang, avg_logprob, bucket) — CCNet's head/middle/tail
    split (Wenzek et al., LREC 2020 §4.4): within each language, rank
    documents by LM score and cut into terciles; 'head' is the most
    trusted-corpus-like third, and the published recipe trains on
    head(+middle) while dropping tail.

    Bucket rule is integer-exact so both engines cut identically:
    r = row_number ordered by (avg_logprob DESC, doc_id), n = docs in
    the language; head iff 3r <= n, middle iff 3r <= 2n, else tail
    (ties inside the rounded score are broken by doc_id).

    Scale shape: the sort is PER LANGUAGE (window partition), so skew
    is bounded by the largest language, and only (id, lang, score)
    rows move — never text. At 10^12 docs replace the exact tercile
    with sampled boundary estimation + a broadcast classify join
    (CCNet itself derives thresholds from a sample); the exact window
    form here is what the oracle can certify."""
    scored = charlm_score(docs, ref, text_col, id_col, max_chars)
    langs = docs.select(F.col(id_col), F.col(lang_col))
    w = Window.partitionBy(lang_col).orderBy(
        F.col("avg_logprob").desc(), F.col(id_col)
    )
    n = Window.partitionBy(lang_col)
    return (
        scored.join(langs, id_col)
        .withColumn("__r", F.row_number().over(w).cast("bigint"))
        .withColumn("__n", F.count("*").over(n).cast("bigint"))
        .select(
            id_col,
            lang_col,
            "avg_logprob",
            F.when(F.col("__r") * 3 <= F.col("__n"), F.lit("head"))
            .when(F.col("__r") * 3 <= F.col("__n") * 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def _hashed_unigrams(docs: DataFrame, text_col: str, id_col: str,
                     n_buckets: int) -> DataFrame:
    """(id, bucket) — one row per word occurrence, feature-hashed into
    ``n_buckets`` via the cross-engine md5 48-bit prefix hash.
    Tokenization matches `_hashed_bigrams`: lowercase, non-alpha
    splits; docs with zero alphabetic tokens contribute nothing."""
    from docling_serve_spark.operators.sampling import md5_hash48

    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda x: F.length(x) >= 1,
    )
    return (
        docs.select(F.col(id_col).alias("__id"), words.alias("__w"))
        .filter(F.size("__w") >= 1)
        .select("__id", F.explode("__w").alias("__tok"))
        .select(
            "__id",
            F.pmod(md5_hash48(F.col("__tok")), F.lit(n_buckets))
            .alias("bucket"),
        )
    )


#: the doc_feats table the last nb_quality_score call persisted. A
#: long-lived driver scoring many corpora would otherwise accumulate
#: one cached doc×bucket table per call — evict the previous one
#: before persisting the next, so at most ONE copy is ever cached.
#: Unpersisting only drops the cache (any still-pending consumer of
#: the older DataFrame recomputes, never miscomputes).
_LAST_DOC_FEATS: DataFrame | None = None


def _cycle_doc_feats_cache(df: DataFrame) -> DataFrame:
    global _LAST_DOC_FEATS
    if _LAST_DOC_FEATS is not None:
        try:
            _LAST_DOC_FEATS.unpersist()
        except Exception:
            pass  # session of the old handle may already be stopped
    _LAST_DOC_FEATS = df.persist()
    return _LAST_DOC_FEATS


def nb_quality_score(docs: DataFrame, labels: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     label_col: str = "label",
                     pos_label: str = "pos",
                     n_buckets: int = 8192) -> DataFrame:
    """(doc_id, n_features, score_micro, is_pos) — hashed bag-of-words
    multinomial Naive Bayes quality classifier: TRAIN one-pass on the
    labeled slice, SCORE every document. This is the inference step of
    the fastText-style quality/domain classifiers corpus pipelines run
    (CCNet, Wenzek et al. LREC 2020 §4.3; FineWeb-Edu) — X160
    (`balanced_trainset`) prepares the training labels, this applies
    the trained model distributed. Naive Bayes rather than logistic
    regression because it trains in ONE aggregation pass (no iterative
    SGD on the driver) and is the classical baseline those pipelines
    ablate against.

    score(d) = prior + Σ_tokens w[bucket], with per-bucket log-odds
    w = ln((c_pos+1)/(n_pos+B)) − ln((c_neg+1)/(n_neg+B)) (add-one
    smoothing over the B-bucket feature space; buckets unseen in
    training fall through the left join to c=0, i.e. the smoothing
    floor) and prior = ln(d_pos/d_neg) over labeled doc counts. Same
    float discipline as `dsir_weights`: every log term is quantized
    to micro-nats (floor(·1e6) as bigint) so per-doc sums are exact
    integers and engine-order-independent; ``is_pos`` is the integer
    sign test score_micro > 0. Docs with zero alphabetic tokens emit
    no row (consistent with `dsir_weights`).

    Scale shape: feature extraction is a narrow explode carrying only
    48-bit hashes; the model is bounded by ``n_buckets`` rows + one
    scalar totals row (AQE-broadcast on the score join); training is
    two map-side-combinable aggregations over the labeled slice;
    per-doc reduction is one hash aggregation keyed on doc id. Text
    never shuffles."""
    lab = labels.select(
        F.col(id_col).alias("__id"),
        (F.col(label_col) == pos_label).alias("__is_pos"),
    )
    # ONE explode + ONE (doc, bucket) pre-aggregation feeds BOTH the
    # training statistics and the scoring join (token occurrences sum
    # to the same bucket counts either way); persist it so the explode
    # runs once, not once per consumer — persist (MEMORY_AND_DISK,
    # spill-tolerant) rather than localCheckpoint, whose eager full
    # write of the doc×bucket table thrashes once the corpus is large;
    # at 10^12 docs this table is what you would materialize anyway
    doc_feats = _cycle_doc_feats_cache(
        _hashed_unigrams(docs, text_col, id_col, n_buckets)
        .groupBy("__id", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    train = doc_feats.join(lab, "__id")
    bucket_counts = train.groupBy("bucket").agg(
        F.sum(F.when(F.col("__is_pos"), F.col("cnt")).otherwise(0))
        .cast("bigint").alias("c_pos"),
        F.sum(F.when(~F.col("__is_pos"), F.col("cnt")).otherwise(0))
        .cast("bigint").alias("c_neg"),
    )
    totals = bucket_counts.agg(
        F.sum("c_pos").cast("bigint").alias("n_pos"),
        F.sum("c_neg").cast("bigint").alias("n_neg"),
    )
    priors = lab.agg(
        F.sum(F.col("__is_pos").cast("bigint")).cast("bigint").alias("d_pos"),
        F.sum((~F.col("__is_pos")).cast("bigint")).cast("bigint")
        .alias("d_neg"),
    )
    joined = (
        doc_feats.join(bucket_counts, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(priors))
    )
    w_micro = F.floor(
        (
            F.log(
                (F.coalesce(F.col("c_pos"), F.lit(0)) + 1).cast("double")
                / (F.col("n_pos") + F.lit(n_buckets))
            )
            - F.log(
                (F.coalesce(F.col("c_neg"), F.lit(0)) + 1).cast("double")
                / (F.col("n_neg") + F.lit(n_buckets))
            )
        )
        * F.lit(_MICRO)
    ).cast("bigint")
    prior_micro = F.floor(
        F.log(F.col("d_pos").cast("double") / F.col("d_neg"))
        * F.lit(_MICRO)
    ).cast("bigint")
    return (
        joined.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.sum("cnt").cast("bigint").alias("n_features"),
            (F.sum(w_micro * F.col("cnt")) + F.first(prior_micro))
            .cast("bigint").alias("score_micro"),
        )
        .select(
            id_col,
            "n_features",
            "score_micro",
            (F.col("score_micro") > 0).alias("is_pos"),
        )
    )


def calibration_bins(scored: DataFrame, labels: DataFrame,
                     n_bins: int = 10,
                     score_col: str = "score_micro",
                     id_col: str = "doc_id",
                     label_col: str = "label",
                     pos_label: str = "pos") -> DataFrame:
    """(bin, n, n_pos, pos_rate_bp, avg_score_micro, score_lo,
    score_hi) — reliability audit of a trained quality classifier
    (the calibration check run before trusting a score threshold,
    Niculescu-Mizil & Caruana ICML 2005: Naive Bayes scores rank well
    but are miscalibrated): bucket documents into ``n_bins``
    equal-WIDTH score bins between the global min/max and report the
    observed positive rate per bin. A well-ranked classifier shows a
    monotone pos_rate_bp across bins; flat spans tell you where the
    score carries no signal and a threshold should not be placed.

    Integer-exact: bin = ((score − min) · n_bins) div (max − min + 1)
    off two scalar extrema, pos_rate in basis points via bigint div,
    avg score via div (floor). Equal-width rather than equal-count
    (ntile) is deliberate — quantile bins need a global sort, while
    width bins are a narrow map off two broadcast scalars + ONE
    partial agg; at 10^12 docs the quantile variant would use sampled
    boundaries (the `perplexity_buckets` note) and lose exactness."""
    lab = labels.select(
        F.col(id_col).alias("__id"),
        (F.col(label_col) == pos_label).alias("__is_pos"),
    )
    s = scored.select(
        F.col(id_col).alias("__id"),
        F.col(score_col).cast("bigint").alias("__s"),
    ).join(lab, "__id")
    # the scored input feeds TWO scans (the extrema aggregate and the
    # binning pass); upstream is typically a full classifier train, so
    # truncate lineage and compute it once (at warehouse scale the
    # scores would be a materialized table and this is free)
    s = s.localCheckpoint(eager=False)
    ext = s.agg(
        F.min("__s").cast("bigint").alias("__lo"),
        F.max("__s").cast("bigint").alias("__hi"),
    )
    # scores can be negative and sums can pass 2^63 at corpus scale;
    # aggregate the NON-NEGATIVE offset (__s - __lo) in DECIMAL(38,0)
    # and add the min back after the div, so the floor semantics are
    # engine-independent (integral div of negatives truncates
    # differently across engines) and the sum cannot wrap
    binned = s.crossJoin(F.broadcast(ext)).select(
        "__s", "__is_pos", "__lo",
        F.expr(
            f"CAST(((__s - __lo) * CAST({n_bins} AS DECIMAL(38,0))) "
            "div (__hi - __lo + 1) AS BIGINT)"
        ).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("__is_pos").cast("bigint")).cast("bigint")
            .alias("n_pos"),
            F.expr("CAST(sum(CAST(__s - __lo AS DECIMAL(38,0))) "
                   "AS DECIMAL(38,0))").alias("__sum_off"),
            F.first("__lo").alias("__lo"),
            F.min("__s").cast("bigint").alias("score_lo"),
            F.max("__s").cast("bigint").alias("score_hi"),
        )
        .select(
            "bin", "n", "n_pos",
            F.expr("(10000 * n_pos) div n").cast("bigint")
            .alias("pos_rate_bp"),
            (F.col("__lo") + F.expr("__sum_off div n").cast("bigint"))
            .cast("bigint").alias("avg_score_micro"),
            "score_lo", "score_hi",
        )
        .orderBy("bin")
    )


def doremi_weights(docs: DataFrame, ref: DataFrame,
                   group_col: str = "source",
                   text_col: str = "text",
                   id_col: str = "doc_id",
                   excess_cap_micro: int = 2_000_000) -> DataFrame:
    """X230 — DoReMi-style domain reweighting (Xie et al., NeurIPS
    2023, one deterministic step of the Group-DRO update): each
    domain's mixture weight grows with its EXCESS char-LM loss over
    the corpus baseline — domains the reference model finds hardest
    get upweighted, the published alternative to hand-tuned mixture
    proportions. The proxy loss is the repo's char-trigram model
    (X30) scored against the trusted slice, so the whole computation
    stays inside the engine.

    Integer discipline end-to-end: per-domain and global LOSS
    (positive micro-nats) are floor-divided integer ratios of the
    bigint micro-nat sums (positive operands — Spark div == DuckDB
    floor), excess = max(0, loss_d − loss_global) capped at
    ``excess_cap_micro`` (bounds exp), weight_micro =
    round(1e6·exp(excess/1e6)), share_ppm exact floor division.

    Shape at scale: charlm_score is the corpus-scale pass (already
    measured linear); everything here is two aggregations at domain
    grain + a 1-row broadcast."""
    scored = charlm_score(docs, ref, text_col, id_col).join(
        docs.select(F.col(id_col), F.col(group_col).alias("grp")), id_col
    )
    per = scored.groupBy("grp").agg(
        F.sum("n_trigrams").cast("bigint").alias("n_tri"),
        (-F.sum("sum_logprob_micro")).cast("bigint").alias("loss_sum"),
    ).filter(F.col("n_tri") > 0)
    tot = per.agg(
        F.sum("n_tri").cast("bigint").alias("__n"),
        F.sum("loss_sum").cast("bigint").alias("__l"),
    )
    joined = per.crossJoin(F.broadcast(tot)).select(
        F.col("grp").alias(group_col),
        "n_tri",
        F.expr("loss_sum div n_tri").cast("bigint").alias("loss_micro"),
        F.expr("__l div __n").cast("bigint").alias("base_micro"),
    ).select(
        group_col,
        "n_tri",
        "loss_micro",
        F.least(
            F.greatest(F.col("loss_micro") - F.col("base_micro"), F.lit(0)),
            F.lit(excess_cap_micro),
        ).cast("bigint").alias("excess_micro"),
    )
    weighted = joined.withColumn(
        "weight_micro",
        F.round(F.exp(F.col("excess_micro") / 1_000_000.0) * 1_000_000.0)
        .cast("bigint"),
    )
    wtot = weighted.agg(
        F.sum("weight_micro").cast("bigint").alias("__w")
    )
    return weighted.crossJoin(F.broadcast(wtot)).select(
        group_col, "n_tri", "loss_micro", "excess_micro", "weight_micro",
        F.expr("(1000000 * weight_micro) div greatest(__w, 1)")
        .cast("bigint").alias("share_ppm"),
    )
