"""Text-analysis operators for the training-data tier: token counting,
language-ID heuristic, quality scoring, document fingerprinting.
All JVM-side built-ins (WholeStageCodegen end to end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from docling_serve_spark.operators.dedup import norm_text

# tiny stopword sets per language (public-knowledge function words);
# enough to separate the corpus languages deterministically
_STOPWORDS = {
    "en": ("the", "and", "of", "to", "over"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "de", "sobre"),
    "de": ("der", "die", "und", "das", "uber"),
}


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("bigint")


# BPE-ish pre-tokenization pieces (GPT-2-family shape, simplified to
# an RE2/Java-common subset): letter runs, digit groups of <=3, and
# each other non-space symbol as its own piece. The count approximates
# trained-tokenizer token counts well enough for corpus budgeting,
# entirely JVM-side (and re-playable in DuckDB's RE2 verbatim).
BPE_PIECE_RE = r"\p{L}+|\p{N}{1,3}|[^\p{L}\p{N}\s]"


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokenization pieces (0 for blank)."""
    return F.regexp_count(col, F.lit(BPE_PIECE_RE)).cast("bigint")


def stopword_hits(col: Column, lang: str) -> Column:
    """Count of stopword occurrences (word-boundary regex)."""
    words = "|".join(_STOPWORDS[lang])
    return F.regexp_count(F.lower(col), F.lit(rf"\b({words})\b")).cast("bigint")


def arabic_char_count(col: Column) -> Column:
    """F11-style Arabic-codepoint count (the lang gate fallback when
    no lang column exists; reference gates on langdetect,
    arabic_correction_middleware.py:69-97)."""
    return (
        F.length(col)
        - F.length(F.regexp_replace(col, r"[؀-ۿ]", ""))
    ).cast("bigint")


def lang_id_heuristic(col: Column) -> Column:
    """n-gram/stopword language guess over {en,fr,es,de,ar}: pick the
    language with the most stopword hits; Arabic wins if Arabic
    codepoints dominate. Deterministic tie-break by fixed order."""
    hits = {lang: stopword_hits(col, lang) for lang in _STOPWORDS}
    best = F.lit("unknown")
    best_n = F.lit(0).cast("bigint")
    for lang in ("en", "fr", "es", "de"):  # fixed priority order
        cond = hits[lang] > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits[lang]).otherwise(best_n)
    return F.when(
        arabic_char_count(col) * 2 > F.length(col), F.lit("ar")
    ).otherwise(best)


def doc_quality_score(col: Column) -> Column:
    """Composite web-text quality score in [0,1]: length factor,
    alpha ratio, space sanity — the Gopher/C4-style filter family
    (public heuristics), deterministic arithmetic only."""
    length = F.greatest(F.length(col), F.lit(1))
    alpha = F.length(F.regexp_replace(col, r"[^\p{L}]", "")) / length
    toks = token_count(col)
    mean_word = length / F.greatest(toks, F.lit(1))
    len_factor = F.least(F.length(col) / F.lit(200.0), F.lit(1.0))
    word_factor = F.when((mean_word >= 3) & (mean_word <= 12), 1.0).otherwise(0.5)
    return F.round(len_factor * 0.4 + alpha * 0.4 + word_factor * 0.2, 6)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of normalized text (the exact-dedup
    key doubles as a stable content id)."""
    return F.md5(norm_text(col))


def ngram_repetition(docs: DataFrame, text_col: str = "text",
                     k: int = 2) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al.,
    "Scaling Language Models: ... Gopher", 2021, Table A1 — the
    "fraction of characters in the most common n-gram" and "fraction
    of characters in duplicated n-grams" family, counted here over
    overlapping word k-grams as gram occurrences):

      - ``top_ngram_frac``: occurrences of the most frequent k-gram /
        total k-gram occurrences;
      - ``dup_ngram_frac``: occurrences belonging to k-grams seen more
        than once / total occurrences;
      - ``repetitive``: top frac > 0.20 or dup frac > 0.60 (integer
        cross-multiplied so the flag never rides float rounding).

    Plan shape: explode k-grams once, two hash aggregations (both
    map-side combinable — (doc_id, gram) then doc_id), all
    WholeStageCodegen. The shuffle key includes the gram hash, so a
    single hot document cannot skew a partition at corpus scale.
    Documents with fewer than k tokens have no k-gram and are absent
    from the output (mirrored by the oracle's length filter)."""
    from docling_serve_spark.operators.dedup import hof_let

    toks = F.split(norm_text(F.col(text_col)), " ")
    n = F.size(toks)
    grams = hof_let(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(1), (F.size(t) - (k - 1)).cast("int")),
            lambda i: F.concat_ws(" ", F.slice(t, i, k)),
        ),
    )
    g = (
        docs.filter(n >= k)
        .select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    agg = g.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup_cnt"),
    )
    return agg.select(
        F.col("doc_id").cast("bigint"),
        F.col("n_grams").cast("bigint"),
        F.round(F.col("top_cnt") / F.col("n_grams"), 6).alias("top_ngram_frac"),
        F.round(F.col("dup_cnt") / F.col("n_grams"), 6).alias("dup_ngram_frac"),
        (
            (F.col("top_cnt") * 5 > F.col("n_grams"))
            | (F.col("dup_cnt") * 5 > F.col("n_grams") * 3)
        ).alias("repetitive"),
    )


def with_textstats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return docs.select(
        F.col("doc_id").cast("bigint"),
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        F.length(c).cast("bigint").alias("n_chars_text"),
        lang_id_heuristic(c).alias("lang_guess"),
        doc_quality_score(c).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )


def corpus_filter_chain(docs: DataFrame, text_col: str = "text",
                        min_tokens: int = 10,
                        min_quality: float = 0.5) -> DataFrame:
    """Per-document keep/drop decision — the filter composition real
    corpus pipelines ship (length gate, Gopher repetition gate,
    quality gate; first rejection reason wins). Comparisons run on
    the ROUNDED quality column so the threshold never rides raw
    double noise across engines. One broadcast-free left join on
    doc_id (repetition stats are absent for sub-k-token docs)."""
    ts = with_textstats(docs, text_col).select("doc_id", "n_tokens", "quality")
    rep = ngram_repetition(docs, text_col).select("doc_id", "repetitive")
    j = ts.join(rep, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "quality",
        F.coalesce(F.col("repetitive"), F.lit(False)).alias("repetitive"),
    )
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("repetitive"), F.lit("repetitive"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .otherwise(F.lit("keep"))
    )
    return j.select(
        F.col("doc_id").cast("bigint"),
        reason.alias("reason"),
        (reason == "keep").alias("keep"),
    )


def host_top_terms(pages: DataFrame, host_col: str = "host",
                   text_col: str = "text", k: int = 3,
                   min_len: int = 3) -> DataFrame:
    """Top-k distinctive terms per host — the corpus-exploration query
    (what is each site about?) every dataset card needs. Emits
    (host, term, tf, df, tfidf, term_rank).

    Ranking is INTEGER-EXACT — (tf desc, df asc, term asc) — so both
    engines pick identical top-k rows regardless of double rounding;
    the smoothed tf-idf score rides along rounded to 6 digits as the
    human-facing value.

    Shape at scale: explode once, two hash aggregations with map-side
    partial combine (term counts keyed (host, term); document
    frequency keyed term), one shuffle join tf⋈df on term (AQE
    broadcasts it only if the surviving vocabulary is actually small),
    and a per-host window for the top-k — no global sort, no driver
    state. The ln(n_hosts) scalar comes from a 1-row aggregate
    cross-joined in (broadcast of one row), keeping the plan fully
    lazy."""
    host = F.col(host_col)
    terms = (
        pages.select(
            host.alias("host"),
            F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z]+")).alias("term"),
        )
        .filter(F.length("term") >= min_len)
    )
    tf = terms.groupBy("host", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    df = terms.groupBy("term").agg(
        F.countDistinct("host").cast("bigint").alias("df")
    )
    n_hosts = pages.select(host.alias("host")).agg(
        F.countDistinct("host").cast("bigint").alias("__n_hosts")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_hosts))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("__n_hosts") + 1).cast("double")
                        / (F.col("df") + 1)
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
        .withColumn("term_rank", F.row_number().over(w))
    )
    return scored.filter(F.col("term_rank") <= k).select(
        "host", "term", "tf", "df", "tfidf",
        F.col("term_rank").cast("bigint").alias("term_rank"),
    )


def corpus_datasheet(docs: DataFrame, lang_col: str = "lang",
                     source_col: str = "source",
                     text_col: str = "text") -> DataFrame:
    """(lang, source, n_docs, n_tokens, n_chars, mean_tokens) — the
    corpus composition report ("datasheet") at three grain levels in
    ONE pass: per (lang, source), per lang, and the corpus total —
    what a dataset card publishes (Gebru et al., "Datasheets for
    Datasets", CACM 2021) and what mixture design (X20/X24) reads as
    its input.

    Implemented with ROLLUP, not three jobs: Spark expands the
    grouping sets inside a single aggregation (one Expand + one
    partial-agg exchange), so the corpus is scanned ONCE for all
    grains. Rollup null keys are folded to the '<all>' marker
    (the input columns are non-null by contract, so the marker is
    unambiguous); mean_tokens = n_tokens div n_docs is integer
    division — bit-reproducible."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    per_doc = docs.select(
        F.col(lang_col).alias("lang"),
        F.col(source_col).alias("source"),
        F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(toks)
        .cast("bigint").alias("toks"),
        F.length(text_col).cast("bigint").alias("chars"),
    )
    return (
        per_doc.rollup("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
            F.sum("chars").cast("bigint").alias("n_chars"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
            "n_docs", "n_tokens", "n_chars",
            F.expr("n_tokens div n_docs").cast("bigint").alias("mean_tokens"),
        )
    )


def line_repetition(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Within-document duplicate line / paragraph fractions — the
    other half of the Gopher repetition family (Rae et al. 2021,
    Table A1: "duplicate line fraction" 0.30, "duplicate paragraph
    fraction" 0.30, and their character-fraction twins at 0.20);
    ``ngram_repetition`` covers the n-gram rows of that table, this
    covers the line/paragraph rows. Cross-document line dedup is
    ``corpus.boilerplate_scrub``; this is the per-document signal
    (pages that repeat their own nav/listing rows hundreds of times).

    Conventions (Dolma's GopherAttributes): a duplicated line's
    occurrences ALL count (cnt, not cnt-1); the character denominator
    is the sum of line lengths (separators excluded) so both engines
    count the same chars; paragraphs split on a blank line (LF LF).
    All ratios are integer basis points via bigint `div` —
    bit-reproducible across engines and partitionings.

    Plan shape: two explode→two-level-aggregate branches (lines,
    paragraphs) over a (id, text)-pruned projection, joined back on
    the id — every aggregate is map-side combinable and the shuffle
    key includes the line/paragraph hash, so one pathological page
    cannot skew a partition at corpus scale."""

    def _branch(sep: str, unit: str) -> DataFrame:
        parts = docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), sep)).alias("u"),
        )
        grp = parts.groupBy(id_col, "u").agg(F.count("*").alias("cnt"))
        dup = F.col("cnt") > 1
        chars = F.col("cnt") * F.length("u")
        return grp.groupBy(id_col).agg(
            F.sum("cnt").cast("bigint").alias(f"n_{unit}"),
            F.sum(F.when(dup, F.col("cnt")).otherwise(0))
            .cast("bigint").alias(f"dup_{unit}"),
            F.sum(chars).cast("bigint").alias(f"{unit}_chars"),
            F.sum(F.when(dup, chars).otherwise(0))
            .cast("bigint").alias(f"dup_{unit}_chars"),
        )

    joined = _branch(r"\n", "lines").join(
        _branch(r"\n\n", "paras"), id_col
    )
    bp = "(10000 * dup_{u}) div n_{u}"
    cbp = "(10000 * dup_{u}_chars) div greatest({u}_chars, 1)"
    return joined.select(
        F.col(id_col).cast("bigint"),
        "n_lines",
        "n_paras",
        F.expr(bp.format(u="lines")).cast("bigint").alias("dup_line_frac_bp"),
        F.expr(cbp.format(u="lines")).cast("bigint")
        .alias("dup_line_char_frac_bp"),
        F.expr(bp.format(u="paras")).cast("bigint").alias("dup_para_frac_bp"),
        F.expr(cbp.format(u="paras")).cast("bigint")
        .alias("dup_para_char_frac_bp"),
        F.expr(
            "(10000 * dup_lines) div n_lines > 3000 "
            "OR (10000 * dup_lines_chars) div greatest(lines_chars, 1) > 2000 "
            "OR (10000 * dup_paras) div n_paras > 3000 "
            "OR (10000 * dup_paras_chars) div greatest(paras_chars, 1) > 2000"
        ).alias("is_repetitive"),
    )


#: Gopher's stop-word gate list (Rae et al. 2021, Table A1: a doc
#: must contain >= 2 of these to survive).
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words: int = 50,
                   max_words: int = 100_000) -> DataFrame:
    """Gopher's document-level quality rules (Rae et al. 2021, Table
    A1 — the gate set Dolma/DataTrove/FineWeb reimplement verbatim;
    the repetition rows of that table are ``ngram_repetition`` /
    ``line_repetition``, these are the shape rules):

      - word count within [min_words, max_words]
      - mean word length within [3, 10] chars
      - hash or ellipsis symbol-to-word ratio ≤ 0.1
      - ≤ 90% of lines starting with a bullet
      - ≤ 30% of lines ending with an ellipsis
      - ≥ 80% of words containing an alphabetic character
      - ≥ 2 of the 8 Gopher stop words

    Every rule is integer cross-multiplied (``10·n_hash ≤ n_words``,
    not a float ratio) so the verdict is bit-reproducible across
    engines and partitionings. ``reason`` is the FIRST failing rule
    in the table's order; ``keep`` when none fails.

    Scale shape: a pure zero-shuffle narrow map — line and word
    statistics come from array higher-order functions
    (``filter``/``size``) over the split arrays, never an explode, so
    the whole gate rides the scan in one codegen stage."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.when(F.trim(t) == "", F.lit(0)).otherwise(F.size(words))
    word_chars = F.length(F.regexp_replace(t, r"\s", ""))
    n_hash = F.regexp_count(t, F.lit("#"))
    n_ellipsis = F.regexp_count(t, F.lit(r"\.\.\."))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•‣▪]"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"\.\.\.$"))
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike(r"\p{L}")))
    sw = "|".join(GOPHER_STOP_WORDS)
    n_stop = F.size(
        F.filter(
            words,
            lambda w: F.lower(w).rlike(rf"^({sw})$"),
        )
    )
    m = docs.select(
        F.col(id_col).cast("bigint"),
        n_words.cast("bigint").alias("n_words"),
        word_chars.cast("bigint").alias("word_chars"),
        n_hash.cast("bigint").alias("n_hash"),
        n_ellipsis.cast("bigint").alias("n_ellipsis"),
        n_lines.cast("bigint").alias("n_lines"),
        bullet_lines.cast("bigint").alias("bullet_lines"),
        ellipsis_lines.cast("bigint").alias("ellipsis_lines"),
        alpha_words.cast("bigint").alias("alpha_words"),
        n_stop.cast("bigint").alias("n_stop_words"),
    )
    reason = (
        F.when(
            (F.col("n_words") < min_words) | (F.col("n_words") > max_words),
            F.lit("word_count"),
        )
        .when(
            (F.col("word_chars") < 3 * F.col("n_words"))
            | (F.col("word_chars") > 10 * F.col("n_words")),
            F.lit("mean_word_length"),
        )
        .when(
            (10 * F.col("n_hash") > F.col("n_words"))
            | (10 * F.col("n_ellipsis") > F.col("n_words")),
            F.lit("symbol_ratio"),
        )
        .when(
            10 * F.col("bullet_lines") > 9 * F.col("n_lines"),
            F.lit("bullet_lines"),
        )
        .when(
            10 * F.col("ellipsis_lines") > 3 * F.col("n_lines"),
            F.lit("ellipsis_lines"),
        )
        .when(
            5 * F.col("alpha_words") < 4 * F.col("n_words"),
            F.lit("alpha_words"),
        )
        .when(F.col("n_stop_words") < 2, F.lit("stop_words"))
        .otherwise(F.lit("keep"))
    )
    return m.select(
        id_col,
        "n_words",
        "n_lines",
        "alpha_words",
        "n_stop_words",
        reason.alias("reason"),
        (reason == "keep").alias("keep"),
    )


def lang_mismatch(docs: DataFrame, text_col: str = "text",
                  lang_col: str = "lang") -> DataFrame:
    """(lang, n_docs, n_detectable, n_mismatch, mismatch_bp) —
    declared-vs-detected language audit: crawl metadata (HTTP headers,
    `<html lang>`, CDX) is wrong often enough that CCNet/OSCAR discard
    it and re-detect; this op quantifies the disagreement per declared
    language so a pipeline can decide whether a source's labels are
    trustworthy or must be re-detected wholesale.

    A mismatch is counted only when the detector is CONFIDENT
    (``lang_id_heuristic`` returned a known language) — undetectable
    docs (too short, no stopword signal) inflate neither side.
    ``mismatch_bp`` is bigint-div basis points over the detectable
    subset. One codegen detection pass + one partial-agg groupBy on
    the (low-cardinality) declared language — text never shuffles."""
    per = docs.select(
        F.col(lang_col).alias("lang"),
        lang_id_heuristic(F.col(text_col)).alias("detected"),
    )
    known = F.col("detected") != "unknown"
    mism = known & (F.col("detected") != F.col("lang"))
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(known, 1).otherwise(0))
            .cast("bigint").alias("n_detectable"),
            F.sum(F.when(mism, 1).otherwise(0))
            .cast("bigint").alias("n_mismatch"),
        )
        .select(
            "lang", "n_docs", "n_detectable", "n_mismatch",
            F.expr("(10000 * n_mismatch) div greatest(n_detectable, 1)")
            .cast("bigint").alias("mismatch_bp"),
        )
    )


def vocab_topk(docs: DataFrame, k: int = 1000, min_count: int = 2,
               text_col: str = "text") -> DataFrame:
    """(rank, word, n_occurrences, n_docs) — corpus word-frequency
    table, the step every tokenizer training run starts from (BPE/
    WordPiece/Unigram all consume a word-count table — Sennrich et
    al. ACL 2016 §3 trains BPE from exactly this; SentencePiece's
    trainer builds it first): lowercase whitespace words, occurrence
    and document frequencies, rare tail cut at ``min_count``, top-k
    by (count desc, word asc) — the tie-break makes the table
    bit-identical across engines and partitionings.

    Scale shape: explode once, ONE partial-agg groupBy(word) carrying
    (count, partial distinct-doc) — the classic wordcount, map-side
    combined so the shuffle is vocabulary-sized, not token-sized;
    top-k via TakeOrderedAndProject (window over a rank-k cut), never
    a global sort of the vocabulary."""
    from pyspark.sql import Window

    words = docs.select(
        F.col("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(
        F.count("*").cast("bigint").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    ).filter(F.col("n_occurrences") >= min_count)
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-k heaps, merged on the driver) — a web-scale vocabulary is
    # billions of words, and a full sort of it just to keep k rows is
    # the classic de-optimization; the rank window then runs over the
    # k-row result only
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("word").asc()
    ).limit(k)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "word", "n_occurrences", "n_docs",
    )


def collocations(docs: DataFrame, k: int = 100, min_count: int = 5,
                 delta: int = 5, text_col: str = "text") -> DataFrame:
    """(rank, bigram, n_bigram, n_first, n_second, score_bp) — phrase
    mining by the word2vec phrase score (Mikolov et al., NeurIPS 2013
    §4: ``score(wi,wj) = (count(wi wj) − δ) · N / (count(wi)·count(wj))``,
    the count-based PMI variant with a discount δ that kills rare-pair
    flukes) — the pass that decides which token pairs become single
    vocabulary units ("new_york") before tokenizer/embedding training.

    The score is computed ENTIRELY in fixed-point integers (numerator
    cross-multiplied into basis points, integral ``div``) — no
    logarithm, so the ranking is bit-identical across engines; ties
    break on the bigram string. Top-k via orderBy+limit
    (TakeOrderedAndProject), never a full sort of the bigram table.

    Headroom: intermediates run in DECIMAL(38,0) (DuckDB promotes
    BIGINT·BIGINT to HUGEINT; int64 would wrap at web scale — the
    numerator ``10^4·n_bigram·total`` passes 2^63 near 10^9·10^9
    token counts). DECIMAL(38,0) keeps the arithmetic exact while
    ``10^4·n_bigram·total < 10^38``, i.e. up to ~10^17 total tokens —
    three decades past the 10^14-token regime of current corpora.
    Beyond that Spark yields NULL (dropped by the ``score_bp > 0``
    filter) rather than a silently wrapped ranking.

    Scale shape: one explode for unigrams, one sequence/slice pass
    for adjacent pairs, two map-side-combined groupBys, then two
    broadcast-sized joins of the top bigrams against the unigram
    table (bigrams surviving ``min_count`` ≪ tokens)."""
    from pyspark.sql import Window

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_tok = F.size(toks)
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("n_w"))
    )
    total = uni.agg(F.sum("n_w").alias("n")).collect()[0]["n"]
    from docling_serve_spark.operators.dedup import hof_let

    grams = hof_let(
        toks,
        lambda t: F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), (F.size(t) - 1).cast("int")),
                lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    big = (
        docs.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("n_bigram"))
        .filter(F.col("n_bigram") >= min_count)
    )
    parts = big.select(
        "bigram", "n_bigram",
        F.split("bigram", " ")[0].alias("w1"),
        F.split("bigram", " ")[1].alias("w2"),
    )
    j = (
        parts.join(uni.select(F.col("w").alias("w1"),
                              F.col("n_w").alias("n_first")), "w1")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("n_w").alias("n_second")), "w2")
    )
    scored = j.select(
        "bigram", "n_bigram", "n_first", "n_second",
        F.expr(
            f"(CAST(10000 AS DECIMAL(38,0)) * (n_bigram - {delta}) "
            f"* {total}) div "
            "(CAST(n_first AS DECIMAL(38,0)) * n_second)"
        ).cast("bigint").alias("score_bp"),
    ).filter(F.col("score_bp") > 0)
    top = scored.orderBy(
        F.col("score_bp").desc(), F.col("bigram").asc()
    ).limit(k)
    w = Window.orderBy(F.col("score_bp").desc(), F.col("bigram").asc())
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "bigram", "n_bigram", "n_first", "n_second", "score_bp",
    )


def length_outliers(docs: DataFrame, group_col: str = "lang",
                    len_col: str = "n_chars",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, grp, n, q1_x4, q3_x4, lo_fence_x4, hi_fence_x4,
    is_outlier) — per-group Tukey-fence length outliers (Tukey, EDA
    1977: flag values outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR]), the
    robust alternative to the fixed length cut-offs in C4/Gopher
    (X11/X60): a fence ADAPTS per language/source, so a threshold
    tuned on English prose does not over-prune CJK or code-heavy
    groups.

    Exactness: quartiles are the standard linear interpolation at
    index p·(n−1) — carried in QUARTER units (×4), where the
    interpolation fraction ∈ {0,¼,½,¾} makes every quartile an exact
    integer; fences are bigint floor-division off the x4 quartiles.
    No doubles anywhere, bit-reproducible (and equal to
    quantile_cont·4 in any ANSI engine).

    Scale shape: this does NOT buffer each group's values into an
    exact-percentile aggregate (which holds all values per group in
    executor memory — a non-starter for billion-doc languages).
    Quartiles come from the LENGTH HISTOGRAM: one (grp, len)
    partial-agg groupBy — cardinality bounded by distinct lengths,
    not docs — a per-grp cumulative window over those few thousand
    rows, a 4-rank lookup join, and one broadcastable fence table
    joined back to the doc stream. Every shuffle carries counts, not
    documents."""
    from pyspark.sql import Window

    lens = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        F.col(len_col).cast("bigint").alias("n"),
    )
    hist = lens.groupBy("grp", "n").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("grp").orderBy("n")
    hist = hist.withColumn("cum", F.sum("cnt").over(w))
    totals = hist.groupBy("grp").agg(
        F.max("cum").cast("bigint").alias("total")
    )
    ranks = totals.select(
        "grp", "total",
        F.expr("(1 * (total - 1)) div 4").alias("i1"),
        F.expr("(1 * (total - 1)) % 4").alias("f1"),
        F.expr("(3 * (total - 1)) div 4").alias("i3"),
        F.expr("(3 * (total - 1)) % 4").alias("f3"),
    )
    need = ranks.select(
        "grp", "f1", "f3",
        F.explode(
            F.array(
                F.struct(F.lit("q1a").alias("which"),
                         F.col("i1").alias("r")),
                F.struct(F.lit("q1b").alias("which"),
                         F.least(F.col("i1") + 1,
                                 F.col("total") - 1).alias("r")),
                F.struct(F.lit("q3a").alias("which"),
                         F.col("i3").alias("r")),
                F.struct(F.lit("q3b").alias("which"),
                         F.least(F.col("i3") + 1,
                                 F.col("total") - 1).alias("r")),
            )
        ).alias("x"),
    ).select("grp", "f1", "f3", F.col("x.which").alias("which"),
             F.col("x.r").alias("r"))
    # value at 0-based rank r: the histogram row covering r
    vals = need.join(hist, "grp").where(
        (F.col("cum") - F.col("cnt") <= F.col("r"))
        & (F.col("r") < F.col("cum"))
    ).select("grp", "which", "f1", "f3", F.col("n").alias("v"))
    q = vals.groupBy("grp", "f1", "f3").agg(
        F.max(F.when(F.col("which") == "q1a", F.col("v"))).alias("q1a"),
        F.max(F.when(F.col("which") == "q1b", F.col("v"))).alias("q1b"),
        F.max(F.when(F.col("which") == "q3a", F.col("v"))).alias("q3a"),
        F.max(F.when(F.col("which") == "q3b", F.col("v"))).alias("q3b"),
    )
    fences = q.select(
        "grp",
        (F.col("q1a") * (4 - F.col("f1"))
         + F.col("q1b") * F.col("f1")).cast("bigint").alias("q1_x4"),
        (F.col("q3a") * (4 - F.col("f3"))
         + F.col("q3b") * F.col("f3")).cast("bigint").alias("q3_x4"),
    ).select(
        "grp", "q1_x4", "q3_x4",
        F.expr("q1_x4 - (3 * (q3_x4 - q1_x4)) div 2")
        .cast("bigint").alias("lo_fence_x4"),
        F.expr("q3_x4 + (3 * (q3_x4 - q1_x4)) div 2")
        .cast("bigint").alias("hi_fence_x4"),
    )
    return lens.join(F.broadcast(fences), "grp").select(
        "doc_id", "grp", "n", "q1_x4", "q3_x4",
        "lo_fence_x4", "hi_fence_x4",
        ((4 * F.col("n") < F.col("lo_fence_x4"))
         | (4 * F.col("n") > F.col("hi_fence_x4"))).alias("is_outlier"),
    )


def token_fertility(docs: DataFrame, text_col: str = "text",
                    lang_col: str = "lang") -> DataFrame:
    """(lang, n_docs, n_chars, n_tokens, n_pieces, fertility_bp,
    chars_per_piece_bp) — per-language tokenizer fertility: subword
    pieces per whitespace word in basis points, plus characters per
    piece. Fertility is the standard multilingual tokenizer-equity
    metric (Ács 2019 "Exploring BERT's vocabulary"; the NLLB and
    XLM-R reports both publish it): a language whose fertility is 2-3x
    English pays that multiple in sequence length, compute, and
    effective context for the same content — the number that drives
    vocabulary sizing and per-language sampling temperature when the
    corpus mix is decided.

    Uses the engine's BPE-ish pre-tokenization (``BPE_PIECE_RE``,
    RE2/Java-common) so the audit is engine-portable and cheap; it
    approximates trained-tokenizer counts well enough for the
    RELATIVE cross-language comparison the metric exists for.

    Scale shape: one scan, all counting inside whole-stage codegen,
    ONE partial-agg groupBy on the (tiny-cardinality) lang key — the
    shuffle carries a handful of longs per language per task.
    Integer-exact: (10000 * n_pieces) div n_tokens in bigint;
    intermediates stay below 2^63 while any language's total pieces
    stay under ~9.2e14 (≈ 900 T pieces — two decades above a 100 TB
    corpus), the same headroom discipline as retrieval.py documents.

    Reference anchor: the reference exposes no corpus accounting
    (per-upload conversion only, docling_serve/app.py); this is
    engine-added budgeting machinery."""
    c = F.col(text_col)
    base = docs.select(
        F.col(lang_col).alias("lang"),
        F.length(c).cast("bigint").alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_pieces"),
    )
    return (
        base.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
        )
        .select(
            "lang", "n_docs", "n_chars", "n_tokens", "n_pieces",
            F.expr("(10000 * n_pieces) div greatest(n_tokens, 1)")
            .cast("bigint").alias("fertility_bp"),
            F.expr("(10000 * n_chars) div greatest(n_pieces, 1)")
            .cast("bigint").alias("chars_per_piece_bp"),
        )
    )


def host_dup_stats(pages: DataFrame, url_col: str = "url",
                   text_col: str = "text") -> DataFrame:
    """(host, n_pages, n_dup_pages, n_clusters, dup_bp) — per-host
    exact-duplication pressure: how much of each host is verbatim
    copies of itself. Template mills, calendar/session traps, and
    mirror paths show up as hosts whose dup_bp dwarfs the corpus
    norm — the number a crawl team uses to cut a host's budget (X23)
    or tighten its template rules (X45) BEFORE global dedup pays to
    re-discover the same copies every snapshot. Host-LOCAL by design:
    cross-host duplication is X46/X98's job; this isolates the
    within-host signal that host-level knobs can act on.

    Scale shape: one codegen fingerprint pass, then two STACKED
    partial aggs — (host, fp) sizes, host rollup — both map-side
    combined; nothing ever pairs, the shuffle carries (host, fp)
    counts. dup_bp = (10000 · n_dup_pages) div n_pages in bigint."""
    from docling_serve_spark.operators.dedup import norm_text
    from docling_serve_spark.operators.urltools import url_host

    sizes = (
        pages.select(
            url_host(F.col(url_col)).alias("host"),
            F.md5(norm_text(F.col(text_col))).alias("fp"),
        )
        .groupBy("host", "fp")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return (
        sizes.groupBy("host")
        .agg(
            F.sum("n").cast("bigint").alias("n_pages"),
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
            .cast("bigint").alias("n_dup_pages"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            .cast("bigint").alias("n_clusters"),
        )
        .withColumn(
            "dup_bp",
            F.expr("(10000 * n_dup_pages) div greatest(n_pages, 1)")
            .cast("bigint"),
        )
    )


def sampling_temperature(docs: DataFrame, lang_col: str = "lang",
                         text_col: str = "text",
                         alpha: float = 0.3) -> DataFrame:
    """(lang, n_pieces, p_raw, q_sampled, boost) — temperature-scaled
    multilingual sampling weights: q_l = p_l^α / Σ_m p_m^α over the
    per-language subword-piece mass (XLM-R §3.1, α=0.3; mBERT and
    NLLB use the same exponentiated-smoothing form). ``boost`` =
    q/p is the factor a language's documents are over- or
    under-sampled relative to natural abundance — low-resource
    languages get boost > 1, the head language < 1. Pairs with X103:
    fertility says what a language COSTS per word, this says how often
    the mixture should visit it.

    The exponentiation is necessarily floating-point (the only
    non-integer scoring op in the catalog besides jaccard's ratio);
    outputs are rounded to 6 decimals, the repo's documented
    double-comparison grain. Scale shape: one codegen counting pass,
    ONE partial-agg groupBy on lang, then all arithmetic over the
    handful of language rows via one single-partition window."""
    from pyspark.sql import Window

    counts = (
        docs.select(
            F.col(lang_col).alias("lang"),
            bpe_token_count(F.col(text_col)).alias("n"),
        )
        .groupBy("lang")
        .agg(F.sum("n").cast("bigint").alias("n_pieces"))
    )
    w = Window.partitionBy()
    scored = (
        counts.withColumn("total", F.sum("n_pieces").over(w))
        .withColumn("p_raw", F.col("n_pieces") / F.col("total"))
        .withColumn("p_alpha", F.pow(F.col("p_raw"), F.lit(alpha)))
        .withColumn("z", F.sum("p_alpha").over(w))
        .withColumn("q_sampled", F.col("p_alpha") / F.col("z"))
    )
    return scored.select(
        "lang", "n_pieces",
        F.round("p_raw", 6).alias("p_raw"),
        F.round("q_sampled", 6).alias("q_sampled"),
        F.round(F.col("q_sampled") / F.col("p_raw"), 6).alias("boost"),
    )


def lang_quality_cut(docs: DataFrame, lang_col: str = "lang",
                     text_col: str = "text",
                     drop_bottom_bp: int = 2000) -> DataFrame:
    """(doc_id, lang, score_bp, pct_bp, keep) — per-LANGUAGE calibrated
    quality cut: rank every document within its language by an
    integer quality score and drop each language's own bottom
    ``drop_bottom_bp`` share. This is the FineWeb2 lesson (Penedo et
    al. 2024: filters tuned on English over-filter most other
    languages — thresholds must be calibrated per language): a fixed
    global score cut silently deletes low-resource languages whose
    score DISTRIBUTION sits lower, while a per-language percentile cut
    removes each language's own worst tail and nothing else.

    score_bp = (10000 · letter_chars) div chars — the letter-density
    signal of the F3-F8 family in pure bigint; pct_bp is the exact
    percentile position (10000·(rank−1)) div (n−1) under the
    deterministic (score_bp, doc_id) order, so the verdict is
    bit-reproducible and engine-portable (no double percentiles).

    Scale shape: one codegen scoring pass, then per-language windows
    (rank + count) — langs are few and huge, the same per-lang window
    grain as X36 with the same documented 10^12 fallback (sampled
    boundary cuts per language instead of exact ranks)."""
    from pyspark.sql import Window

    c = F.col(text_col)
    scored = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.expr(
            f"(10000 * length(regexp_replace({text_col}, "
            f"'[^\\\\p{{L}}]', ''))) div greatest(length({text_col}), 1)"
        ).cast("bigint").alias("score_bp"),
    )
    w = Window.partitionBy("lang").orderBy("score_bp", "doc_id")
    wn = Window.partitionBy("lang")
    ranked = scored.withColumn(
        "__rk", F.row_number().over(w).cast("bigint")
    ).withColumn("__n", F.count("*").over(wn).cast("bigint"))
    return ranked.select(
        "doc_id", "lang", "score_bp",
        F.expr("(10000 * (__rk - 1)) div greatest(__n - 1, 1)")
        .cast("bigint").alias("pct_bp"),
        (F.expr("(10000 * (__rk - 1)) div greatest(__n - 1, 1)")
         >= drop_bottom_bp).alias("keep"),
    )


def stopword_discovery(docs: DataFrame, text_col: str = "text",
                       df_threshold_bp: int = 5000,
                       k: int = 200) -> DataFrame:
    """(rank, token, df, df_bp) — corpus-derived stopword list: the
    top-k tokens by document frequency among those appearing in at
    least ``df_threshold_bp`` of documents. Fixed English stopword
    lists do not transfer (a multilingual or domain corpus has its own
    function words and boilerplate vocabulary), so production
    pipelines LEARN the list from the corpus itself — this is the
    artifact behind the X4/X100 df-caps made explicit and auditable:
    what exactly got treated as a stopword, at what frequency, ranked.
    Re-run per snapshot, the list's churn is itself a drift signal
    (new boilerplate vocabulary = a template change upstream).

    Scale shape: distinct-tokens-per-doc explode, ONE map-side-
    combined groupBy on the token, threshold filter, then
    TakeOrderedAndProject for the top-k cut (never a global sort) and
    a rank window over the ≤k surviving rows. df_bp integer-exact."""
    from pyspark.sql import Window

    from docling_serve_spark.operators.dedup import tokens

    n_docs = docs.select("doc_id").distinct().count()
    df_tbl = (
        docs.select(
            F.explode(F.array_distinct(tokens(F.col(text_col))))
            .alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("df"))
        .withColumn(
            "df_bp",
            F.expr(f"(10000 * df) div {max(n_docs, 1)}").cast("bigint"),
        )
        .filter(F.col("df_bp") >= df_threshold_bp)
    )
    top = df_tbl.orderBy(F.col("df").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("df").desc(), F.col("token").asc())
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "token", "df", "df_bp",
    )


def bpe_pair_stats(docs: DataFrame, k: int = 100, min_count: int = 2,
                   text_col: str = "text") -> DataFrame:
    """(rank, pair, n_pairs, n_types) — the first BPE merge iteration
    (Sennrich/Haddow/Birch ACL 2016 §3.2): adjacent-character pair
    counts over the corpus, weighted by word frequency; the top pair
    IS the first merge a BPE trainer would take, and re-running the
    pass between merge rounds is the inner loop of tokenizer training.
    Complements X69 (the word-count table BPE starts from) and X103
    (fertility of a FINISHED tokenizer) with the training-side signal:
    which symbol pairs the corpus itself wants fused.

    Scale shape — the trick Sennrich's reference implementation uses,
    distributed: pair extraction runs over DISTINCT WORD TYPES (the
    vocabulary-sized word-count table, not the token stream), each
    type exploded once and weighted by its corpus count, so a 10^11-
    token corpus costs one wordcount shuffle plus a vocabulary-sized
    pair pass. Characters come from substring over a sequence —
    codegen higher-order functions, no Python tokenizer. One
    groupBy(pair) partial agg, TakeOrderedAndProject top-k, rank
    window over k rows only. n_pairs is bigint-exact (pair count ≤
    token count ≪ 2^63); ties break on the pair string so the merge
    choice is bit-identical across engines and partitionings."""
    from pyspark.sql import Window

    words = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word")
    ).filter(F.col("word") != "")
    wc = (
        words.groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") >= min_count)
        # Spark's sequence(1, 0) DESCENDS instead of yielding empty,
        # so 1-char words must be cut before the transform
        .filter(F.length("word") >= 2)
    )
    pairs = wc.select(
        "word", "n",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> substring(word, i, 2))"
            )
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("n").cast("bigint").alias("n_pairs"),
        F.countDistinct("word").cast("bigint").alias("n_types"),
    )
    top = agg.orderBy(F.col("n_pairs").desc(), F.col("pair").asc()).limit(k)
    w = Window.orderBy(F.col("n_pairs").desc(), F.col("pair").asc())
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "pair", "n_pairs", "n_types",
    )


def vocab_coverage(docs: DataFrame, lang_col: str = "lang",
                   text_col: str = "text") -> DataFrame:
    """(lang, n_tokens, n_types, n_hapax, gt_unseen_bp, ttr_bp) —
    Good-Turing coverage estimate per language: the probability mass
    of UNSEEN vocabulary is estimated by the hapax share N1/N (Good,
    Biometrika 1953 — the missing-mass estimator), i.e. how much new
    vocabulary the next crawl increment would surface. The
    keep-crawling signal mixture planning needs per language: a lang
    whose unseen mass is still high is under-collected (more crawl
    buys genuinely new content), one near zero has saturated and
    further collection only adds duplicates-in-distribution. TTR
    (type/token ratio) rides along as the classical lexical-diversity
    check.

    Scale shape: ONE (lang, word) partial-agg groupBy (map-side
    combined — the shuffle is vocabulary-sized, not token-sized),
    then ONE per-lang rollup of (tokens, types, hapax). Both rates
    are integer basis points (bigint div): hapax and type counts are
    ≤ token counts, so 10^4·count stays far under 2^63 at the
    10^11-token regime."""
    words = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")
    wc = words.groupBy("lang", "word").agg(
        F.count("*").cast("bigint").alias("n")
    )
    return (
        wc.groupBy("lang")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
            .cast("bigint").alias("n_hapax"),
        )
        .select(
            "lang", "n_tokens", "n_types", "n_hapax",
            F.expr("(10000 * n_hapax) div greatest(n_tokens, 1)")
            .cast("bigint").alias("gt_unseen_bp"),
            F.expr("(10000 * n_types) div greatest(n_tokens, 1)")
            .cast("bigint").alias("ttr_bp"),
        )
        .orderBy("lang")
    )


def readability_stats(docs: DataFrame, lang_col: str = "lang",
                      text_col: str = "text",
                      hard_milli: int = 12000) -> DataFrame:
    """(lang, n_docs, wps_milli, spw_milli, fk_milli, hard_bp) —
    Flesch-Kincaid grade-level audit per language (Kincaid et al.
    1975: ``0.39·words/sentences + 11.8·syllables/word − 15.59``), the
    readability feature classic quality stacks (and the C4/Gopher
    lineage's manual-threshold ancestors) compute per document;
    aggregated here per language with the share of documents above a
    hard-grade threshold. A language slice whose FK mass sits far
    above grade 12 is specialist/legal/spam text, far below is
    listicle filler — both ends inform mixture weighting next to
    X11's rule gates.

    Syllables are approximated by vowel-group runs ([aeiouy]+ per
    lowercased word — the standard cheap proxy; a real syllabifier is
    latin-script-specific anyway, and the audit's value is in the
    DISTRIBUTION, not per-doc precision). Everything is fixed-point
    milli/bp integers with per-term bigint div — bit-reproducible;
    per-doc terms stay < 10^7 milli so sums have int64 headroom past
    10^11 docs per language.

    Scale shape: three regexp counts riding the scan (zero shuffles
    until ONE per-lang partial agg)."""
    t = F.col(text_col)
    words = F.when(F.trim(t) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    ).cast("bigint")
    sents = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("bigint")
    syls = F.greatest(
        F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")), words
    ).cast("bigint")  # every word counts at least one syllable
    per_doc = docs.select(
        F.col(lang_col).alias("lang"),
        words.alias("w"), sents.alias("s"), syls.alias("y"),
    ).select(
        "lang",
        F.expr("(1000 * w) div s").alias("wps"),
        F.expr("CASE WHEN w = 0 THEN 0 ELSE (1000 * y) div w END")
        .alias("spw"),
    ).select(
        "lang", "wps", "spw",
        # 0.39·wps + 11.8·spw − 15.59, all in milli (integer div, not
        # float-then-cast: DuckDB CAST(double AS BIGINT) rounds while
        # Spark truncates — bigint div sidesteps the mismatch)
        F.expr("(wps * 390 + spw * 11800) div 1000")
        .cast("bigint").alias("fk_raw"),
    ).select(
        "lang", "wps", "spw",
        (F.col("fk_raw") - 15590).alias("fk"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.expr("sum(wps) div count(*)").cast("bigint")
            .alias("wps_milli"),
            F.expr("sum(spw) div count(*)").cast("bigint")
            .alias("spw_milli"),
            F.expr("sum(fk) div count(*)").cast("bigint")
            .alias("fk_milli"),
            F.expr(f"(10000 * sum(CASE WHEN fk > {int(hard_milli)} "
                   "THEN 1 ELSE 0 END)) div count(*)")
            .cast("bigint").alias("hard_bp"),
        )
        .orderBy("lang")
    )


def code_switch_stats(docs: DataFrame, lang_col: str = "lang",
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(lang, n_docs, n_switched, switched_bp, mean_trans_milli) —
    line-level code-switching audit: each non-empty line is assigned
    a dominant script (Arabic / CJK / Cyrillic / Latin-other by
    per-line character counts, fixed tie precedence), and a document
    whose lines span ≥2 scripts is script-switched, with the count of
    adjacent-line script transitions as the mixing intensity. X118
    catches char-level homoglyph smuggling INSIDE words; this catches
    the structural case — bilingual pages, quoted foreign blocks,
    boilerplate in another script — which breaks lang-pure corpus
    slices and is simultaneously the positive signal X139's bitext
    mining wants surfaced (a page alternating en/ar lines is a
    translation candidate, not trash).

    Scale shape: posexplode lines, three regexp counts riding the
    exploded scan, ONE doc-keyed window for transitions (partition-
    local sort on line position), two stacked partial aggs (doc,
    then lang). Integer milli/bp throughout."""
    from pyspark.sql import Window

    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    ).filter(F.trim(F.col("line")) != "")
    n_ar = F.regexp_count(F.col("line"), F.lit(r"[؀-ۿ]"))
    n_cjk = F.regexp_count(F.col("line"), F.lit(r"[一-鿿]"))
    n_cyr = F.regexp_count(F.col("line"), F.lit(r"[Ѐ-ӿ]"))
    n_lat = F.regexp_count(F.col("line"), F.lit(r"[A-Za-z]"))
    script = (
        F.when((n_ar >= F.greatest(n_cjk, n_cyr, n_lat)) & (n_ar > 0),
               "arabic")
        .when((n_cjk >= F.greatest(n_cyr, n_lat)) & (n_cjk > 0), "cjk")
        .when((n_cyr >= n_lat) & (n_cyr > 0), "cyrillic")
        .otherwise("latin")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    scored = lines.select(
        "doc_id", "lang", "pos", script.alias("script")
    ).select(
        "doc_id", "lang", "script",
        F.when(
            F.lag("script").over(w).isNotNull()
            & (F.lag("script").over(w) != F.col("script")), 1
        ).otherwise(0).alias("trans"),
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.countDistinct("script").alias("n_scripts"),
        F.sum("trans").cast("bigint").alias("n_trans"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_scripts") >= 2, 1).otherwise(0))
            .cast("bigint").alias("n_switched"),
            F.sum("n_trans").alias("total_trans"),
        )
        .select(
            "lang", "n_docs", "n_switched",
            F.expr("(10000 * n_switched) div greatest(n_docs, 1)")
            .cast("bigint").alias("switched_bp"),
            F.expr("(1000 * total_trans) div greatest(n_docs, 1)")
            .cast("bigint").alias("mean_trans_milli"),
        )
        .orderBy("lang")
    )


def host_lang_entropy(pages: DataFrame, url_col: str = "url",
                      lang_col: str = "lang",
                      mixed_threshold_micro: int = 600000) -> DataFrame:
    """(host, n_docs, n_langs, dominant_lang, dominant_bp,
    entropy_micro, is_mixed) — per-host language entropy, the
    MT-spam / content-farm signal: a host serving the same template
    machine-translated into many languages shows near-uniform language
    counts (high entropy), while a legitimate site concentrates on one
    or two. CCNet-era corpus builders downweight or drop such hosts
    (Kreutzer et al., TACL 2022 audit low-resource crawls and find MT
    content farms dominate several languages). Cross-check against
    X52's `hreflang_alternates` before dropping — a declared-hreflang
    multilingual site (wikipedia-style) is high-entropy and legitimate.

    Integer-exact entropy: each language's term is
    c_l · floor(ln(n/c_l)·10^6) — the floor happens per (c_l, n) pair
    (deterministic in both engines), the weighted sum is exact bigint,
    and entropy_micro = Σ div n. ``is_mixed`` thresholds at
    ``mixed_threshold_micro`` (default 0.6 nats ≈ between a 50/50
    two-language split at ln 2 ≈ 0.693 and a 75/25 split at 0.562).

    Scale shape: one (host, lang) partial agg (the shuffle carries
    counts, never text), per-host totals via a window over a host's
    ≤ n_languages rows, one final host agg. Dominant language via the
    same bounded window (max count, ties to the smaller lang code)."""
    from pyspark.sql import Window

    from docling_serve_spark.operators.urltools import url_host

    counts = pages.select(
        url_host(F.col(url_col)).alias("host"),
        F.col(lang_col).alias("lang"),
    ).groupBy("host", "lang").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_host = Window.partitionBy("host")
    w_rank = Window.partitionBy("host").orderBy(
        F.col("c").desc(), F.col("lang").asc()
    )
    terms = counts.select(
        "host", "lang", "c",
        F.sum("c").over(w_host).cast("bigint").alias("n"),
        F.row_number().over(w_rank).alias("__rk"),
    ).withColumn(
        "__term",
        F.col("c")
        * F.floor(F.log(F.col("n") / F.col("c")) * F.lit(1000000))
        .cast("bigint"),
    )
    return (
        terms.groupBy("host")
        .agg(
            F.first("n").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_langs"),
            F.max(F.when(F.col("__rk") == 1, F.col("lang")))
            .alias("dominant_lang"),
            F.max(F.when(F.col("__rk") == 1, F.col("c"))).cast("bigint")
            .alias("__dom_c"),
            F.sum("__term").cast("bigint").alias("__sum_term"),
        )
        .select(
            "host", "n_docs", "n_langs", "dominant_lang",
            F.expr("(10000 * __dom_c) div n_docs").cast("bigint")
            .alias("dominant_bp"),
            F.expr("__sum_term div n_docs").cast("bigint")
            .alias("entropy_micro"),
            (F.expr("__sum_term div n_docs")
             >= F.lit(mixed_threshold_micro)).alias("is_mixed"),
        )
    )


def zipf_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(n_tokens, n_terms, n_classes, alpha_milli, r2_milli) — Zipf
    rank-frequency fit, the corpus-linguistics QA gate: a natural-
    language corpus follows freq ∝ rank^(−α) with α ≈ 1 (Zipf 1949;
    Piantadosi 2014 review), while template farms, log spam, and
    broken extraction bend the curve — an α far from ~0.9–1.2 or a
    poor fit (low r²) says the token distribution is not natural
    prose and the SOURCE needs review before training on it.

    α is the weighted least-squares slope of ln(freq) on ln(rank).
    Scale shape: ranking the raw vocabulary needs a GLOBAL sort of
    10^8 rows, so the regression runs on the COUNT-CLASS histogram
    instead — terms with equal count share a class (one (count,
    n_terms) row; Zipf corpora have O(√tokens) distinct counts), each
    class is placed at its MIDRANK (the tie-standard rank), and the
    regression weights each class by its term count. Identical to the
    per-term regression with midrank tie-handling, via two bounded
    aggregations + windows over distinct-count rows only.

    Integer-exactness: x = floor(ln(midrank)·10^6), y =
    floor(ln(count)·10^6) quantize per class (deterministic per
    value-pair); the five weighted sums (Σw, Σwx, Σwy, Σwxy, Σwx²)
    ride DECIMAL(38,0) (micro² × 10^8-term weights pass 2^63);
    alpha_milli = −slope and r2_milli from the same sums, each one
    deterministic scalar division at the end."""
    from pyspark.sql import Window

    words = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(
        F.count("*").cast("bigint").alias("c")
    )
    classes = counts.groupBy("c").agg(
        F.count("*").cast("bigint").alias("n_terms")
    )
    w_cum = Window.orderBy(F.col("c").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    placed = classes.select(
        "c", "n_terms",
        (F.sum("n_terms").over(w_cum) - F.col("n_terms")).alias("__before"),
    ).select(
        "c", "n_terms",
        # midrank of the class in halves: 2*before + n_terms + 1
        (F.lit(2) * F.col("__before") + F.col("n_terms") + 1)
        .alias("__mr_x2"),
    ).select(
        "c", "n_terms",
        F.floor(F.log(F.col("__mr_x2") / F.lit(2.0)) * F.lit(1000000))
        .cast("bigint").alias("x"),
        F.floor(F.log(F.col("c").cast("double")) * F.lit(1000000))
        .cast("bigint").alias("y"),
    )
    sums = placed.agg(
        F.expr("CAST(sum(CAST(n_terms AS DECIMAL(38,0))) "
               "AS DECIMAL(38,0))").alias("sw"),
        F.expr("CAST(sum(CAST(n_terms AS DECIMAL(38,0)) * x) "
               "AS DECIMAL(38,0))").alias("swx"),
        F.expr("CAST(sum(CAST(n_terms AS DECIMAL(38,0)) * y) "
               "AS DECIMAL(38,0))").alias("swy"),
        F.expr("CAST(sum(CAST(n_terms AS DECIMAL(38,0)) * x * y) "
               "AS DECIMAL(38,0))").alias("swxy"),
        F.expr("CAST(sum(CAST(n_terms AS DECIMAL(38,0)) * x * x) "
               "AS DECIMAL(38,0))").alias("swxx"),
        F.expr("CAST(sum(CAST(n_terms AS DECIMAL(38,0)) * y * y) "
               "AS DECIMAL(38,0))").alias("swyy"),
        F.expr("CAST(sum(CAST(n_terms AS DECIMAL(38,0)) * c) "
               "AS DECIMAL(38,0))").alias("n_tok"),
        F.count("*").cast("bigint").alias("n_classes"),
    )
    # cross-multiplied forms: sw·Sxy = sw·swxy − swx·swy etc. stay
    # EXACT decimals (decimal division scale rules differ between
    # engines, so no intermediate division); the slope and r² are
    # then a fixed number of deterministic double ops at the end
    num = F.col("sw") * F.col("swxy") - F.col("swx") * F.col("swy")
    den = F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx")
    syy = F.col("sw") * F.col("swyy") - F.col("swy") * F.col("swy")
    ratio1 = num.cast("double") / den.cast("double")
    ratio2 = num.cast("double") / syy.cast("double")
    return sums.select(
        F.col("n_tok").cast("bigint").alias("n_tokens"),
        F.col("sw").cast("bigint").alias("n_terms"),
        "n_classes",
        F.floor(F.lit(-1000.0) * ratio1).cast("bigint")
        .alias("alpha_milli"),
        F.floor(F.lit(1000.0) * ratio1 * ratio2).cast("bigint")
        .alias("r2_milli"),
    )


def heaps_fit(docs: DataFrame, n_points: int = 8,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(n_docs, n_terms, n_points, beta_milli, r2_milli) — Heaps'-law
    vocabulary-growth fit, X172's companion gate: natural text grows
    vocabulary as V ∝ N^β with β ≈ 0.4–0.6 (Heaps 1978; Egghe 2007),
    while a closed template vocabulary saturates (β → 0) and OCR noise
    or mojibake inflates it (β → 1, every damaged token "new"). Both
    failure directions are extraction-quality regressions worth a
    gate.

    The curve is sampled at ``n_points`` doc-id cut points spaced
    evenly across [min_id, max_id]: N_i = docs with id ≤ t_i, V_i =
    words whose FIRST document (min doc id) ≤ t_i — so the whole curve
    comes from ONE word-grain aggregation (min id per word) plus two
    single-pass aggregates with n_points conditional sums each; no
    per-prefix rescans, no global rank window. β and r² via the same
    quantized-log least-squares used by `zipf_fit` (micro-nat x/y,
    DECIMAL(38,0) cross-multiplied sums, two double divisions)."""
    ids = docs.select(F.col(id_col).cast("bigint").alias("__id"))
    ext = ids.agg(
        F.min("__id").alias("__lo"), F.max("__id").alias("__hi")
    )
    words = docs.select(
        F.col(id_col).cast("bigint").alias("__id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")
    first = words.groupBy("word").agg(F.min("__id").alias("__first"))

    def _t(i: int):
        return (F.col("__lo")
                + F.expr(f"((__hi - __lo + 1) * {i}) div {n_points}"))

    n_row = ids.crossJoin(F.broadcast(ext)).agg(*[
        F.sum((F.col("__id") <= _t(i)).cast("bigint")).cast("bigint")
        .alias(f"n{i}") for i in range(1, n_points + 1)
    ])
    v_row = first.crossJoin(F.broadcast(ext)).agg(*[
        F.sum((F.col("__first") <= _t(i)).cast("bigint")).cast("bigint")
        .alias(f"v{i}") for i in range(1, n_points + 1)
    ])
    pts = n_row.crossJoin(v_row).select(
        F.explode(F.array(*[
            F.struct(F.col(f"n{i}").alias("n"), F.col(f"v{i}").alias("v"))
            for i in range(1, n_points + 1)
        ])).alias("p")
    ).select(
        F.col("p.n").alias("n"), F.col("p.v").alias("v")
    ).filter((F.col("n") > 0) & (F.col("v") > 0)).select(
        "n", "v",
        F.floor(F.log(F.col("n").cast("double")) * F.lit(1000000))
        .cast("bigint").alias("x"),
        F.floor(F.log(F.col("v").cast("double")) * F.lit(1000000))
        .cast("bigint").alias("y"),
    )
    sums = pts.agg(
        F.count("*").cast("bigint").alias("k"),
        F.max("n").cast("bigint").alias("n_docs"),
        F.max("v").cast("bigint").alias("n_terms"),
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
    # degenerate guards (NaN casts diverge across engines): a fully
    # saturated vocabulary has all y equal (dyy = 0) — the flat line
    # fits exactly, so beta = 0, r² = 1; identical x (den = 0) means
    # fewer than two distinct cut points — no fit, NULLs
    beta = F.when(den == 0, F.lit(None).cast("bigint")) \
        .when(dyy == 0, F.lit(0).cast("bigint")) \
        .otherwise(F.floor(F.lit(1000.0) * r1).cast("bigint"))
    rr = F.when(den == 0, F.lit(None).cast("bigint")) \
        .when(dyy == 0, F.lit(1000).cast("bigint")) \
        .otherwise(F.floor(F.lit(1000.0) * r1 * r2).cast("bigint"))
    return sums.select(
        "n_docs", "n_terms",
        F.col("k").alias("n_points"),
        beta.alias("beta_milli"),
        rr.alias("r2_milli"),
    )


def oov_rate(docs: DataFrame, vocab: DataFrame,
             text_col: str = "text", lang_col: str = "lang",
             word_col: str = "word") -> DataFrame:
    """(lang, n_tokens, n_oov, oov_bp, n_oov_chars,
    fallback_fertility_bp) — vocabulary coverage against a LEARNED
    vocab table: the fraction of token occurrences a candidate
    tokenizer vocabulary absorbs per language, and the sequence-length
    cost of the byte/char fallback the misses pay (SentencePiece's
    byte-fallback, GPT-2's byte-level BPE floor). This is the
    vocabulary-SIZING curve: X69 ranks candidate entries, X124/X117
    (`token_fertility`) measures regex-piece equity, this one scores
    an actual vocab artifact — rerun it per candidate size and pick
    the knee. fallback_fertility ≈ (hits + chars-of-misses) / tokens,
    the upper-bound piece count if every miss decomposes to
    characters.

    Scale shape: one token-grain explode carrying (lang, token, len);
    the vocab join is a broadcast semi-style left join against a
    ≤ vocab-size table; one lang-keyed partial agg ends it — text
    never shuffles and the shuffle rows are a handful of longs per
    language per task."""
    toks = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("__tok"),
    ).filter(F.col("__tok") != "")
    v = vocab.select(
        F.col(word_col).alias("__tok"), F.lit(True).alias("__in_vocab")
    )
    joined = toks.join(F.broadcast(v), "__tok", "left").select(
        "lang",
        F.coalesce("__in_vocab", F.lit(False)).alias("__hit"),
        F.length("__tok").cast("bigint").alias("__len"),
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum((~F.col("__hit")).cast("bigint")).cast("bigint")
            .alias("n_oov"),
            F.sum(F.when(~F.col("__hit"), F.col("__len")).otherwise(0))
            .cast("bigint").alias("n_oov_chars"),
        )
        .select(
            "lang", "n_tokens", "n_oov",
            F.expr("(10000 * n_oov) div n_tokens").cast("bigint")
            .alias("oov_bp"),
            "n_oov_chars",
            F.expr("(10000 * ((n_tokens - n_oov) + n_oov_chars)) "
                   "div n_tokens").cast("bigint")
            .alias("fallback_fertility_bp"),
        )
    )


def sentence_uniformity(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        min_sentences: int = 5,
                        dispersion_cut_x100: int = 150) -> DataFrame:
    """(doc_id, n_sentences, mean_len_x100, dispersion_x100,
    is_uniform) — sentence-length uniformity, a machine-generated /
    template-text signal: human prose has bursty sentence lengths
    (high variance-to-mean dispersion), while template farms and
    LLM-generated filler produce near-constant-length sentences —
    the post-2023 crawl-contamination concern corpus audits now
    screen for (low "burstiness" is the classic statistical
    generated-text tell). Flagged docs route to review next to X51's
    parked pages and X14's repetition gates; a low-dispersion doc
    that also trips X14 is template with near-certainty.

    Sentence lengths are word counts between [.!?]+ boundaries; the
    dispersion index D = variance/mean rides exact integer sums
    (n·Σx² − (Σx)²) div (n·Σx) in hundredths — engine-order-exact,
    no doubles. ``is_uniform`` requires ≥ ``min_sentences`` (a
    two-sentence doc has no burstiness to measure) and
    D < ``dispersion_cut_x100``. Pure codegen narrow map: split,
    transform, aggregate — zero shuffles, zero Python. Headroom:
    100·n·Σx² stays under 2^63 while a doc's sentences × mean-length²
    stay under ~9·10^16 word² (a 10^5-sentence doc of 100-word
    sentences uses 10^11 — five decades of margin; gigabyte outliers
    are excluded upstream by the F13 size guards)."""
    sentences = F.filter(
        F.transform(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.size(
                F.filter(F.split(F.trim(s), r"\s+"),
                         lambda w: F.length(w) >= 1)
            ).cast("bigint"),
        ),
        lambda n: n > 0,
    )
    base = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        sentences.alias("__lens"),
    ).select(
        "doc_id",
        F.size("__lens").cast("bigint").alias("n_sentences"),
        F.aggregate("__lens", F.lit(0).cast("bigint"),
                    lambda a, x: a + x).alias("__sx"),
        F.aggregate("__lens", F.lit(0).cast("bigint"),
                    lambda a, x: a + x * x).alias("__sxx"),
    )
    mean_x100 = F.expr("(100 * __sx) div greatest(n_sentences, 1)")
    disp_x100 = F.expr(
        "(100 * (n_sentences * __sxx - __sx * __sx)) "
        "div greatest(n_sentences * __sx, 1)"
    )
    return base.select(
        "doc_id", "n_sentences",
        mean_x100.cast("bigint").alias("mean_len_x100"),
        disp_x100.cast("bigint").alias("dispersion_x100"),
        (
            (F.col("n_sentences") >= min_sentences)
            & (disp_x100 < dispersion_cut_x100)
        ).alias("is_uniform"),
    )


def markdown_structure(docs: DataFrame, md_col: str = "md",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_headings, max_heading_depth, n_list_items,
    n_table_rows, n_code_fences, structure_bp) — structure profile of
    the extraction pipeline's markdown channel (E1): headings by ATX
    depth, list items, table rows, fenced code blocks, and the share
    of lines that are structural. Downstream consumers slice on this
    — instruction-tuning mixes prize structured documents, a
    retrieval chunker (X68) should split at headings when there are
    any, and a doc_type whose structure profile collapses after an
    extractor upgrade (X170) lost its layout parse, not just bytes.

    Line-grain regex counts riding the scan (ATX `#{1,6} `, `- `/`* `
    /ordered-list markers, `|`-delimited rows, ``` fences — the
    CommonMark constructs E1 emits); max depth via the longest `#` run
    matched per line. Pure codegen narrow map, zero shuffles."""
    lines = F.split(F.col(md_col), "\n")
    heads = F.filter(lines, lambda l: l.rlike(r"^#{1,6} "))
    depth = F.array_max(
        F.transform(
            heads,
            lambda l: F.length(F.regexp_extract(l, r"^(#{1,6}) ", 1))
            .cast("bigint"),
        )
    )
    n_list = F.size(
        F.filter(lines, lambda l: l.rlike(r"^\s*(?:[-*]|\d+\.) "))
    )
    n_table = F.size(F.filter(lines, lambda l: l.rlike(r"^\|.*\|\s*$")))
    n_fence = F.size(F.filter(lines, lambda l: l.rlike(r"^```")))
    n_lines = F.size(F.filter(lines, lambda l: F.length(F.trim(l)) > 0))
    return docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.size(heads).cast("bigint").alias("n_headings"),
        F.coalesce(depth, F.lit(0)).cast("bigint")
        .alias("max_heading_depth"),
        n_list.cast("bigint").alias("n_list_items"),
        n_table.cast("bigint").alias("n_table_rows"),
        n_fence.cast("bigint").alias("n_code_fences"),
        lines.alias("__l"),
    ).select(
        "doc_id", "n_headings", "max_heading_depth", "n_list_items",
        "n_table_rows", "n_code_fences",
        F.expr(
            "(10000 * (n_headings + n_list_items + n_table_rows "
            "+ n_code_fences)) div greatest("
            "size(filter(__l, l -> length(trim(l)) > 0)), 1)"
        ).cast("bigint").alias("structure_bp"),
    )


def keyword_stuffing(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", min_tokens: int = 20,
                     top1_cut_bp: int = 2000,
                     hhi_cut_bp: int = 1500) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, top1_share_bp, hhi_bp, stuffed)
    — SEO keyword-stuffing detection by token-frequency CONCENTRATION:
    a stuffed page repeats a handful of commercial terms far beyond
    natural Zipfian density, which shows up as (a) the single most
    frequent word owning an outsized share of all tokens and (b) a
    high Herfindahl-Hirschman index Σ(c_w/N)² over the doc's word
    distribution. Complements X14's *adjacent*-repetition gates
    (Gopher dup-ngram fractions): stuffing scattered through otherwise
    varied filler has low adjacent-gram duplication but extreme
    concentration, and the repetition family misses it by design.

    All integer: shares in basis points via integral ``div``; the HHI
    numerator ``10^4·Σc²`` stays under 2^63 up to ~10^7 tokens per
    DOCUMENT (not corpus) — three decades past any real web page.
    ``stuffed`` requires ``n_tokens >= min_tokens`` (short navigation
    stubs are concentrated by nature, not by spam). Zero-token docs
    produce no row (no distribution to measure), same contract as the
    repetition operators.

    Scale shape: one explode, then TWO map-side-combined groupBys —
    (doc, word) partial-aggregates collapse repeats BEFORE the first
    exchange, so both shuffles carry per-doc vocabulary rows (distinct
    words), never raw tokens; the doc-grain rollup's exchange moves
    four longs per (doc, word). No windows, no joins, no driver
    state."""
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("__w"),
    ).filter(F.col("__w") != "")
    tf = words.groupBy(id_col, "__w").agg(
        F.count("*").cast("bigint").alias("__c")
    )
    agg = tf.groupBy(id_col).agg(
        F.sum("__c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.max("__c").cast("bigint").alias("__mx"),
        F.sum(F.col("__c") * F.col("__c")).cast("bigint").alias("__ss"),
    )
    top1 = F.expr("(10000 * __mx) div n_tokens")
    hhi = F.expr("(10000 * __ss) div (n_tokens * n_tokens)")
    return agg.select(
        id_col, "n_tokens", "n_distinct",
        top1.cast("bigint").alias("top1_share_bp"),
        hhi.cast("bigint").alias("hhi_bp"),
        (
            (F.col("n_tokens") >= F.lit(min_tokens))
            & ((top1 >= F.lit(top1_cut_bp)) | (hhi >= F.lit(hhi_cut_bp)))
        ).alias("stuffed"),
    )


def vocab_drift(docs: DataFrame, period_col: str = "period",
                text_col: str = "text", k: int = 100,
                min_late: int = 5, rise_bp: int = 30000) -> DataFrame:
    """(rank, word, n_early, n_late, growth_bp, status) — vocabulary
    drift between two crawl periods: the words whose per-token RATE in
    the late period most outgrows their early-period rate. Two
    statuses survive: ``new`` (zero early occurrences — genuine
    neologisms, product names, event vocabulary) and ``rising`` (rate
    grew ≥ ``rise_bp``/10⁴-fold, cross-normalized for period token
    mass). The freshness counterpart to X104/X107's SHAPE drift: a
    length histogram can hold perfectly still while the corpus
    silently stops acquiring new vocabulary — this is the gate that
    notices (and the neologism feed timestamp-aware tokenizer refresh
    consumes). ``period_col`` carries exactly 'early'/'late'; callers
    bucket timestamps upstream (X62's temporal-split discipline).

    growth_bp is the integer cross-multiplication
    ``10^4·n_late·total_early div (n_early·total_late)`` in
    DECIMAL(38,0) (collocations' headroom rule: int64 wraps near
    10^9·10^9; decimal is exact to ~10^17 total tokens). ``new`` rows
    report growth_bp NULL — there is no finite rate ratio, and a
    sentinel would sort as data.

    Scale shape: one explode, ONE map-side-combined groupBy(word)
    carrying two conditional partial sums (never a groupBy(word,
    period) + pivot — half the shuffle), grand totals as a bounded
    driver scalar each (collocations' pattern), top-k via
    orderBy+limit = TakeOrderedAndProject, rank window over k rows
    only."""
    from pyspark.sql import Window

    is_late = F.col(period_col) == "late"
    words = docs.select(
        is_late.alias("__late"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("__w"),
    ).filter(F.col("__w") != "")
    counts = words.groupBy(F.col("__w").alias("word")).agg(
        F.sum(F.when(~F.col("__late"), 1).otherwise(0))
        .cast("bigint").alias("n_early"),
        F.sum(F.when(F.col("__late"), 1).otherwise(0))
        .cast("bigint").alias("n_late"),
    )
    tot = counts.agg(
        F.sum("n_early").alias("te"), F.sum("n_late").alias("tl")
    ).collect()[0]
    total_early, total_late = int(tot["te"] or 0), int(tot["tl"] or 0)
    growth = F.expr(
        f"(CAST(10000 AS DECIMAL(38,0)) * n_late * {total_early}) div "
        f"(CAST(greatest(n_early, 1) AS DECIMAL(38,0)) * {max(total_late, 1)})"
    ).cast("bigint")
    scored = counts.filter(F.col("n_late") >= min_late).select(
        "word", "n_early", "n_late",
        F.when(F.col("n_early") > 0, growth).alias("growth_bp"),
        F.when(F.col("n_early") == 0, F.lit("new"))
        .when(growth >= rise_bp, F.lit("rising"))
        .otherwise(F.lit(None)).alias("status"),
    ).filter(F.col("status").isNotNull())
    top = scored.orderBy(
        F.col("n_late").desc(), F.col("word").asc()
    ).limit(k)
    w = Window.orderBy(F.col("n_late").desc(), F.col("word").asc())
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "word", "n_early", "n_late", "growth_bp", "status",
    )


def char_entropy(docs: DataFrame, text_col: str = "text",
                 prefix_len: int = 256,
                 low_micro: int = 2_500_000,
                 high_micro: int = 4_700_000) -> DataFrame:
    """(doc_id, n_bigrams, n_distinct, entropy_micro, verdict) —
    character-BIGRAM Shannon entropy over a bounded prefix, the
    two-sided junk gate token-level screens can't see: REPETITIVE
    junk (template spins, keyboard mash, X185's stuffing taken to the
    char level) collapses entropy toward 0, while ENCODED blobs
    leaking into "text" (base64/hex dumps — near-uniform bigrams)
    push it above anything natural language reaches (natural prose
    sits ~3.2-4.5 nats on this construction; Shannon, "Prediction and
    entropy of printed English", BSTJ 1951 — printed English carries
    far less per-char information than a uniform alphabet).

    Float discipline (same micro-nat scheme as ``charlm_score``):
    every count's log is quantized per VALUE — L(c) = floor(ln(c)·1e6)
    as bigint — before any cross-row sum, so per-doc aggregation is
    pure integer arithmetic and bit-reproducible under any
    partitioning; H_micro = (N·L(N) − Σ c·L(c)) div N.

    Scale shape: entropy is computed on a ``prefix_len`` prefix —
    the gram explode is bounded at prefix_len−1 rows/doc regardless
    of document size (the junk signature shows in any window; real
    pipelines sample exactly like this) — then one (doc, gram)
    partial-agg groupBy and one doc-grain rollup; exchanges carry
    2-char grams, never text. Docs shorter than 2 chars have no
    bigram distribution and are omitted."""
    # bigrams come from zipping the char array with its shift — NOT
    # from a lambda re-evaluating the normalized prefix per index
    # (an expression inside a higher-order-function lambda runs once
    # PER ELEMENT: the first cut of this operator paid 255 regexp
    # normalizations per row, 9.5 s -> 1.5 s at sf0.1)
    t = F.substring(norm_text(F.col(text_col)), 1, prefix_len)
    chs = (
        docs.filter(F.length(t) >= 2)
        .select("doc_id", F.split(t, "").alias("__ch"))
    )
    grams = F.zip_with(
        F.slice(F.col("__ch"), 1, F.size(F.col("__ch")) - 1),
        F.slice(F.col("__ch"), 2, F.size(F.col("__ch")) - 1),
        lambda a, b: F.concat(a, b),
    )
    rows = (
        chs.select("doc_id", F.explode(grams).alias("g"))
        .filter(F.length("g") == 2)
    )
    counts = rows.groupBy("doc_id", "g").agg(
        F.count("*").cast("bigint").alias("c")
    )
    lc = F.floor(F.log(F.col("c")) * F.lit(1_000_000)).cast("bigint")
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.sum(F.col("c") * lc).cast("bigint").alias("s"),
    )
    ln_n = F.floor(F.log(F.col("n_bigrams")) * F.lit(1_000_000)) \
        .cast("bigint")
    ent = F.expr("(n_bigrams * __ln_n - s) div n_bigrams")
    return (
        agg.withColumn("__ln_n", ln_n)
        .withColumn("entropy_micro", ent.cast("bigint"))
        .select(
            "doc_id", "n_bigrams", "n_distinct", "entropy_micro",
            F.when(F.col("entropy_micro") < low_micro,
                   F.lit("low_entropy"))
            .when(F.col("entropy_micro") > high_micro,
                  F.lit("high_entropy"))
            .otherwise(F.lit("ok")).alias("verdict"),
        )
    )


def source_token_pmi(docs: DataFrame, min_docs: int = 5, k: int = 5,
                     source_col: str = "source",
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """X206-wave — template-token mining by pointwise mutual
    information between token PRESENCE and source group: pmi(t, s) =
    ln( P(t, s) / (P(t)·P(s)) ) over document-presence counts. Tokens
    whose presence is concentrated in one source are that source's
    boilerplate/template vocabulary (nav bars, footers, licence
    blurbs) — the per-source complement of the tf-idf view
    (host_top_terms): PMI normalizes by the token's CORPUS prevalence,
    so a globally common word can never look distinctive.

    Emits (source, term, n_docs_ts, pmi_micro, term_rank): top-k per
    source by (pmi_micro desc, n_docs_ts desc, term asc), support-
    filtered to n_docs_ts >= min_docs. pmi_micro is micro-nats
    (round(ln(ratio)·1e6), bigint) — the repo's standard integer
    log-score discipline; the argument of ln is an exact integer
    ratio ((c_ts·n) / (c_t·c_s)), identical in both engines.

    Shape at scale: one explode of DISTINCT per-doc tokens (presence,
    not tf — array_distinct runs JVM-side before the explode), three
    hash aggregations with map-side partial combine, one shuffle join
    on term (the only corpus-scale key), source totals + the corpus
    total ride a broadcast (sources are few), top-k via a per-source
    window. No global sort, no driver state."""
    from pyspark.sql import Window

    from docling_serve_spark.operators.dedup import tokens

    pres = docs.select(
        F.col(source_col).alias("source"),
        F.explode(
            F.array_distinct(F.filter(tokens(F.col(text_col)),
                                      lambda t: t != ""))
        ).alias("term"),
    )
    c_ts = pres.groupBy("source", "term").agg(
        F.count("*").cast("bigint").alias("n_docs_ts")
    )
    c_t = pres.groupBy("term").agg(
        F.count("*").cast("bigint").alias("__n_docs_t")
    )
    c_s = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("bigint").alias("__n_docs_s")
    )
    n = docs.agg(F.count("*").cast("bigint").alias("__n_docs"))
    w = Window.partitionBy("source").orderBy(
        F.col("pmi_micro").desc(), F.col("n_docs_ts").desc(),
        F.col("term").asc()
    )
    return (
        c_ts.filter(F.col("n_docs_ts") >= min_docs)
        .join(c_t, "term")
        .join(F.broadcast(c_s), "source")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "pmi_micro",
            F.round(
                F.log(
                    (F.col("n_docs_ts") * F.col("__n_docs"))
                    / (F.col("__n_docs_t") * F.col("__n_docs_s"))
                ) * 1_000_000.0
            ).cast("bigint"),
        )
        .withColumn("term_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("term_rank") <= k)
        .select("source", "term", "n_docs_ts", "pmi_micro", "term_rank")
    )


# Burrows' Delta function-word panel: high-frequency closed-class
# English words — the stylometric signal is HOW OFTEN a text uses
# them, not what it is about (Burrows, "'Delta': a measure of
# stylistic difference", LLC 2002).
DELTA_WORDS = ("the", "of", "and", "to", "a",
               "in", "is", "for", "on", "with")


def stylometry_delta(docs: DataFrame, words: tuple[str, ...] = DELTA_WORDS,
                     k: int = 15, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """X206-wave — Burrows' Delta stylometric outlier scan: per-doc
    function-word rates (per-1000-token), z-scored against the corpus
    (population stddev), delta = mean |z| over the word panel. Docs
    whose function-word profile sits far from the corpus centroid are
    style outliers — the classic screen for machine-generated /
    template / non-prose text that CONTENT filters miss (the words
    are topic-free by construction).

    Emits the top-k (doc_id, n_tokens, delta) by (delta desc, doc_id
    asc); delta is rounded to 6 digits (double discipline — rates and
    moments are exact-integer-derived doubles, so 6-dp rounding is
    engine-stable). Zero-stddev words contribute z = 0.

    Shape at scale: per-doc counts are ``size(filter(tokens, ...))``
    per panel word — JVM higher-order functions over the token array,
    NO explode and NO shuffle for the feature extraction; the corpus
    moments are ONE 1-row aggregate broadcast back; top-k is
    TakeOrderedAndProject. Two passes over the (narrow) feature rows,
    zero passes over raw text beyond tokenization."""
    from docling_serve_spark.operators.dedup import hof_let, tokens

    feats = docs.select(
        F.col(id_col),
        hof_let(
            F.filter(tokens(F.col(text_col)), lambda t: t != ""),
            lambda toks: F.struct(
                F.size(toks).cast("bigint").alias("n_tokens"),
                *[
                    # closure factory, not a default arg: F.filter
                    # treats a 2-parameter lambda as (element, index)
                    F.size(F.filter(toks, (lambda w: lambda t: t == F.lit(w))(w)))
                    .cast("bigint").alias(f"c{i}")
                    for i, w in enumerate(words)
                ],
            ),
        ).alias("f"),
    ).select(id_col, "f.*").filter(F.col("n_tokens") > 0)
    rates = feats.select(
        id_col,
        "n_tokens",
        *[
            (F.col(f"c{i}") * 1000.0 / F.col("n_tokens")).alias(f"r{i}")
            for i in range(len(words))
        ],
    )
    moments = rates.agg(*(
        [F.avg(f"r{i}").alias(f"m{i}") for i in range(len(words))]
        + [
            (F.avg(F.col(f"r{i}") * F.col(f"r{i}"))).alias(f"q{i}")
            for i in range(len(words))
        ]
    ))
    zsum = None
    for i in range(len(words)):
        var = F.col(f"q{i}") - F.col(f"m{i}") * F.col(f"m{i}")
        sd = F.sqrt(F.greatest(var, F.lit(0.0)))
        z = F.when(sd > 0, F.abs((F.col(f"r{i}") - F.col(f"m{i}")) / sd)
                   ).otherwise(F.lit(0.0))
        zsum = z if zsum is None else zsum + z
    return (
        rates.crossJoin(F.broadcast(moments))
        .select(
            F.col(id_col).cast("bigint"),
            F.col("n_tokens"),
            F.round(zsum / len(words), 6).alias("delta"),
        )
        .orderBy(F.col("delta").desc(), F.col(id_col).asc())
        .limit(k)
    )


def design_effect(docs: DataFrame, group_col: str = "host",
                  value_col: str = "n_chars") -> DataFrame:
    """X220 — cluster-sampling design effect over host-grouped docs:
    deff = 1 + (m̄ − 1)·ρ (Kish 1965 §8.2), with ρ the one-way-ANOVA
    intraclass correlation — how much sampling whole HOSTS (the only
    cheap unit in a crawl) inflates the variance of a per-doc metric
    vs simple random sampling. ρ near 1 (template farms: every page
    alike) means a host-clustered eval sample is worth n/deff
    effective docs — the planning number for X176-style holdouts.

    Exactness: the ANOVA sums (Σx, Σx² at group grain, then corpus
    grain) are INTEGER sums of bigint values; every double is derived
    from exact int64 sums at the end (MSB/MSW/ρ/deff, rounded to 6),
    so results are partition-invariant and engine-identical.

    Shape at scale: one map-side-combined group aggregation + one
    1-row corpus rollup — the same two-level shape as host_health;
    nothing but (group, 3 bigints) shuffles."""
    g = docs.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("bigint").alias("x"),
    ).groupBy("g").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("x").cast("bigint").alias("s_g"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("q_g").cast("bigint").alias("q"),
        # within-group sum of squares: Σ_g (q_g - s_g²/n_g), exact
        # per-group in double (int64-derived), summed
        F.sum(
            F.col("q_g").cast("double")
            - F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")
        ).alias("ssw"),
    )
    sst = F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ssb = sst - F.col("ssw")
    msw = F.col("ssw") / (F.col("n") - F.col("k"))
    msb = ssb / (F.col("k") - 1)
    mbar = F.col("n").cast("double") / F.col("k")
    icc = (msb - msw) / (msb + (mbar - 1.0) * msw)
    # the ANOVA estimator is undefined for k < 2 groups (no between-
    # group variance) or n == k (one doc per group: no within-group
    # variance) — emit NULL rather than NaN/Inf leaking into planners
    defined = (F.col("k") > 1) & (F.col("n") > F.col("k"))
    return tot.select(
        F.col("n").alias("n_docs"),
        F.col("k").alias("n_groups"),
        F.round(mbar, 6).alias("mean_group_size"),
        F.when(defined, F.round(icc, 6)).alias("icc"),
        F.when(defined, F.round(1.0 + (mbar - 1.0) * icc, 6)).alias("deff"),
    )
