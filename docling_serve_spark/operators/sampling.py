"""Deterministic corpus sampling and training-sequence packing.

Two mixture-construction stages every pre-training pipeline runs after
filtering/dedup:

- **Domain-mix sampling**: keep each page with a per-host (per-domain)
  probability — the mixture-weights pass (C4's and The Pile's domain
  reweighting). The keep decision must be a pure function of the
  document's stable key so re-runs, resumes, and incremental crawls
  make the *same* decision — no ``rand()``. We use Knuth's
  multiplicative hash (TAOCP vol. 3, §6.4: h = key * 2654435761 mod
  2^32) and compare in exact integer arithmetic against a
  parts-per-million rate, so Spark and any replaying engine agree
  bit-for-bit.

- **Sequence packing**: concatenate documents and chunk into
  fixed-length training sequences (the GPT-style "pack then split at
  seq_len boundaries"). A single global ordering would serialize the
  window into one partition at corpus scale, so packing is per-shard:
  shard = doc_id mod n_shards, each shard packs independently under a
  (shard)-partitioned window ordered by doc_id. Shards are the unit of
  parallelism AND the unit of determinism — adding executors changes
  nothing about bin assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_KNUTH = 2654435761  # golden-ratio multiplier, TAOCP §6.4
_U32 = 4294967296
_PPM = 1000000


def hash_u32(key: Column) -> Column:
    """Knuth multiplicative hash of a bigint key onto [0, 2^32)."""
    return F.pmod(key.cast("bigint") * F.lit(_KNUTH), F.lit(_U32))


def domain_mix_sample(pages: DataFrame, rates: DataFrame,
                      key_col: str = "doc_id",
                      host_col: str = "host") -> DataFrame:
    """(doc_id, host, keep_ppm, kept) — deterministic Bernoulli keep
    per page with a per-host rate given in parts-per-million.

    ``rates`` is (host, keep_ppm:bigint) — the mixture spec, a small
    config table, broadcast. Hosts absent from the spec default to
    keep_ppm = 0 (drop): mixture construction is allow-listed.
    The comparison ``h * 1e6 < keep_ppm * 2^32`` stays in exact
    bigint arithmetic (max ~2^52, no overflow, no float boundary).
    """
    h = hash_u32(F.col(key_col))
    joined = pages.join(F.broadcast(rates), host_col, "left")
    ppm = F.coalesce(F.col("keep_ppm"), F.lit(0)).cast("bigint")
    return joined.select(
        F.col(key_col).cast("bigint").alias("doc_id"),
        F.col(host_col).alias("host"),
        ppm.alias("keep_ppm"),
        (h * F.lit(_PPM) < ppm * F.lit(_U32)).alias("kept"),
    )


def pack_sequences(docs: DataFrame, seq_len: int = 512,
                   n_shards: int = 16,
                   text_col: str = "text") -> DataFrame:
    """(doc_id, shard, n_tokens, bin_id, offset_in_bin) — greedy
    concat-and-chunk packing of documents into fixed ``seq_len``
    token bins, independently per shard.

    ``bin_id`` is the bin the document *starts* in; ``offset_in_bin``
    its start offset. Documents may span bin boundaries (the
    concatenate-then-split training layout, not first-fit binning).
    One shuffle (the shard-partitioned window); shards bound both the
    sort size and the skew: doc_id mod n_shards is uniform by
    construction of the id space.
    """
    from docling_serve_spark.operators.textstats import token_count

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = docs.select(
        F.col("doc_id").cast("bigint"),
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("bigint").alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / seq_len).cast("bigint").alias("bin_id"),
        F.pmod(start, F.lit(seq_len)).cast("bigint").alias("offset_in_bin"),
    )


def host_quota(pages: DataFrame, max_per_host: int = 3,
               n_salts: int = 16, host_col: str = "host",
               key_col: str = "doc_id") -> DataFrame:
    """(doc_id, host, host_rank) — cap pages per host (RefinedWeb-style
    domain quota), keeping a deterministic uniform sample: priority is
    the Knuth hash of the doc key, so which pages survive is stable
    across re-runs and independent of crawl order.

    Skew is the whole problem here — one mega-host can hold 10^8 pages
    while the median host has 3 — so the top-N is two-phase: phase 1
    ranks within ``(host, key mod n_salts)`` and keeps ``max_per_host``
    per salt (the heavy host fans out over n_salts tasks; every other
    host pays nothing extra), phase 2 ranks the ≤ n_salts*max
    survivors per host exactly. The global top-N is a subset of the
    union of per-salt top-Ns, so the two-phase result is exact."""
    pri = hash_u32(F.col(key_col))
    salt = F.pmod(F.col(key_col).cast("bigint"), F.lit(n_salts))
    w1 = Window.partitionBy(F.col(host_col), salt).orderBy(
        pri.asc(), F.col(key_col).asc()
    )
    local = (
        pages.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= max_per_host)
        .drop("__rn")
    )
    w2 = Window.partitionBy(host_col).orderBy(pri.asc(), F.col(key_col).asc())
    return (
        local.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= max_per_host)
        .select(
            F.col(key_col).cast("bigint").alias("doc_id"),
            F.col(host_col).alias("host"),
            F.col("host_rank").cast("bigint").alias("host_rank"),
        )
    )


def token_budget_select(docs: DataFrame, budget_tokens: int,
                        n_buckets: int = 256,
                        text_col: str = "text",
                        key_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, cum_tokens, kept) — fill a token budget with
    a deterministic uniform subsample: documents are ordered by Knuth
    hash priority and taken while the running token total stays within
    ``budget_tokens`` (the Dolma-style "subsample the corpus to K
    tokens" pass; a doc whose inclusion would cross the budget is
    dropped, not truncated).

    A global ORDER BY cumulative sum would serialize into one task, so
    the prefix sum is distributed: priority's top 8 bits form an
    ordered bucket (buckets partition the priority space), each bucket
    cumsums locally under its own window, and the per-bucket totals —
    ``n_buckets`` scalar rows, broadcast back — provide each bucket's
    global offset. Exactly the classic two-level scan: local scan +
    offsets of block sums."""
    from docling_serve_spark.operators.textstats import token_count

    pri = hash_u32(F.col(key_col))
    base = docs.select(
        F.col(key_col).cast("bigint").alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        pri.alias("__pri"),
        F.floor(pri / F.lit(_U32 // n_buckets)).cast("bigint").alias("__bucket"),
    )
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("__pri").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("__cum_local", F.sum("n_tokens").over(w_local))
    w_off = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        base.groupBy("__bucket")
        .agg(F.sum("n_tokens").alias("__bucket_tokens"))
        .withColumn(
            "__offset",
            F.sum("__bucket_tokens").over(w_off) - F.col("__bucket_tokens"),
        )
        .select("__bucket", "__offset")
    )
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("__cum_local") + F.col("__offset"))
            .cast("bigint")
            .alias("cum_tokens"),
            (
                F.col("__cum_local") + F.col("__offset")
                <= F.lit(budget_tokens)
            ).alias("kept"),
        )
    )


# --- leakage-safe corpus splits ----------------------------------- #

_BP = 10000  # basis points: split boundaries in 1/10000ths


def md5_hash48(col: Column) -> Column:
    """48-bit integer from the md5 hex prefix — the deterministic
    cross-engine STRING hash (hash_u32 covers bigint keys). 12 hex
    chars = 48 bits: fits a bigint exactly, no sign wraparound."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def split_assign(pages: DataFrame, url_col: str = "url",
                 test_bp: int = 500, val_bp: int = 500,
                 salt: str = "split-v1") -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a pure
    function of the page's canonical HOST (+ a version salt), so every
    page of a host lands in the same split — near-duplicate pages from
    one site can never straddle train and eval, the standard guard
    when corpus-level near-dups survive dedup.

    ``test_bp``/``val_bp`` are basis points (1/10000). Pure narrow map
    — no shuffle, no state; resharding or growing the corpus never
    moves an existing host between splits (hash stability is the
    contract a 100 TB incremental pipeline needs)."""
    from docling_serve_spark.operators import urltools

    host = urltools.url_host(F.col(url_col))
    bucket = F.pmod(
        md5_hash48(F.concat(host, F.lit("/" + salt))), F.lit(_BP)
    )
    split = (
        F.when(bucket < F.lit(test_bp), F.lit("test"))
        .when(bucket < F.lit(test_bp + val_bp), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return pages.select(
        "*",
        host.alias("host"),
        bucket.alias("split_bucket"),
        split.alias("split"),
    )


def temporal_split(pages: DataFrame, cutoff: str,
                   url_col: str = "url",
                   ts_col: str = "warc_ts") -> DataFrame:
    """(url, host, host_split, split) — time-based train/eval split
    with host-level leakage quarantine: train on the past, evaluate
    on the future (the temporal-decontamination discipline: an eval
    set crawled AFTER the training cutoff cannot have leaked into
    training data, the guard benchmark builders apply on top of
    n-gram decontamination, X14).

    ``split_assign`` guards SPATIAL leakage (a host never straddles
    splits); this guards TEMPORAL leakage the strict way: a host
    whose captures span the cutoff is ``spanning`` and quarantined
    from BOTH sides — its pre-cutoff pages are near-duplicates of its
    post-cutoff pages often enough (templated sites) that putting
    either side in eval leaks the other. Hosts entirely before the
    cutoff are ``train``, entirely after are ``eval``; every page
    inherits its host's verdict.

    Scale shape: one partial-agg groupBy(host) computing (min_ts,
    max_ts) — two timestamps per host cross the shuffle, never pages
    — then one equi-join back (hosts ≪ pages; AQE broadcasts when it
    fits). Deterministic: the verdict is a pure function of the
    host's capture-time envelope."""
    from docling_serve_spark.operators import urltools

    cut = F.to_timestamp(F.lit(cutoff))
    host = urltools.url_host(F.col(url_col))
    withh = pages.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("__ts"),
        host.alias("host"),
    )
    envelope = withh.groupBy("host").agg(
        F.min("__ts").alias("__min_ts"), F.max("__ts").alias("__max_ts")
    )
    host_split = (
        F.when(F.col("__max_ts") < cut, F.lit("train"))
        .when(F.col("__min_ts") >= cut, F.lit("eval"))
        .otherwise(F.lit("spanning"))
    )
    verdict = envelope.select("host", host_split.alias("host_split"))
    return withh.join(verdict, "host").select(
        "url",
        "host",
        "host_split",
        F.when(F.col("host_split") == "spanning", F.lit("quarantine"))
        .otherwise(F.col("host_split")).alias("split"),
    )


def shard_manifest(packed: DataFrame) -> DataFrame:
    """(shard, n_docs, n_tokens, n_bins, min_doc_id, max_doc_id,
    fingerprint) — the delivery manifest over ``pack_sequences``
    output: what a training data loader reads to (a) size its
    per-shard work, (b) verify a shard's integrity after transfer,
    and (c) detect a partial/duplicated shard before a run trains on
    it (the manifest role WebDataset/MDS index files play).

    ``fingerprint`` is an ORDER-INDEPENDENT content hash: the sum of
    each doc's md5-48 reduced mod 10^6 — partition- and shuffle-
    order-invariant by commutativity, and bounded (10^12 docs × 10^6
    < 2^63) so the bigint sum can never overflow on either engine
    (DuckDB sums BIGINT into HUGEINT, Spark wraps — staying far from
    the boundary keeps them identical). One partial-agg groupBy on
    the already-small packed projection; rows never carry text."""
    fp_term = F.pmod(md5_hash48(F.col("doc_id").cast("string")),
                     F.lit(1_000_000))
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            (F.max("bin_id") + 1).cast("bigint").alias("n_bins"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
            F.sum(fp_term).cast("bigint").alias("fingerprint"),
        )
    )


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, chunk_id, n_chunk_tokens, chunk_text) — fixed-size
    token-window chunking with overlap, the retrieval-side ingestion
    step (RAG indexes and X42's BM25 both consume passages, not whole
    documents; overlap keeps answers that straddle a boundary findable
    from at least one chunk — the standard sliding-window layout).
    ``pack_sequences`` is the training-side counterpart (concat-and-
    chunk, no overlap); this one never merges documents.

    Whitespace tokens; stride = chunk_tokens − overlap; the FINAL
    window is emitted only when it adds new tokens (a doc shorter
    than one chunk yields exactly one). All codegen: split once,
    window starts via ``sequence``, each chunk a ``slice`` +
    ``array_join`` — the only row growth is the posexplode, ~1/stride
    per token, and text shuffles only if the caller repartitions."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
        F.size(toks)
    )
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    # window k covers tokens [k*stride+1, k*stride+chunk]; emit the
    # smallest m with (m-1)*stride + chunk >= n so the final window is
    # never pure overlap: m = floor((n-chunk-1)/stride) + 2 for
    # n > chunk, 1 for 0 < n <= chunk, 0 for empty docs
    n_starts = F.when(
        n <= chunk_tokens, F.when(n > 0, F.lit(1)).otherwise(F.lit(0))
    ).otherwise(
        F.floor((n - chunk_tokens - 1) / F.lit(stride)) + 2
    )
    # guard: sequence(0, -1) DESCENDS in Spark — empty docs need an
    # explicit empty array, not a degenerate sequence
    starts = F.when(
        n_starts > 0, F.sequence(F.lit(0), n_starts.cast("int") - 1)
    ).otherwise(F.array().cast("array<int>"))
    from docling_serve_spark.operators.dedup import hof_let

    # bind toks once: referencing it inside the per-start lambda would
    # re-split the document once per window (hof_let rationale)
    chunks = hof_let(
        toks,
        lambda t: F.transform(
            starts,
            lambda k: F.struct(
                k.alias("k"),
                F.slice(
                    t, k * stride + 1, F.lit(chunk_tokens)
                ).alias("w"),
            ),
        ),
    )
    ex = docs.select(
        F.col(id_col).cast("bigint"),
        F.explode(chunks).alias("c"),
    )
    return ex.select(
        id_col,
        F.col("c.k").cast("bigint").alias("chunk_id"),
        F.size("c.w").cast("bigint").alias("n_chunk_tokens"),
        F.array_join("c.w", " ").alias("chunk_text"),
    )


def component_split(docs: DataFrame, pairs: DataFrame,
                    test_bp: int = 500, val_bp: int = 500,
                    salt: str = "csplit-v1") -> DataFrame:
    """(doc_id, anchor, split_bucket, split) — near-dup-SAFE split
    assignment: every member of a dup component (connected components
    over candidate pairs, X10) hashes the COMPONENT anchor instead of
    itself, so a whole near-dup family lands in one split and the X99
    train/eval leakage class is prevented rather than detected.
    ``split_assign`` (X28) quarantines at host grain — but syndicated
    near-dups CROSS hosts (the X100 wire-story shape), and a host
    split happily puts the AP original in train and its republication
    in test; content-grain quarantine is the missing other half.
    Singleton documents hash their own id, so non-dup assignment is
    exactly as uniform as X28's.

    Deterministic and incremental: the anchor is the component's min
    doc_id, the hash is the engine-portable 48-bit md5 — re-running
    over a grown corpus moves a document only if its component gained
    an older member (the unavoidable cost of content-grain safety,
    worth stating: host-grain never moves, content-grain may).

    Scale shape: components over the candidate-pair graph only (tiny
    vs the corpus; X10's checkpointed min-label rounds), ONE left
    equi-join on doc_id to attach anchors, then a pure narrow map."""
    from docling_serve_spark.operators.dedup import dup_components

    comps = dup_components(pairs)
    anchor = F.coalesce(F.col("component"), F.col("doc_id")).cast("bigint")
    bucket = F.pmod(
        md5_hash48(F.concat(anchor.cast("string"), F.lit("/" + salt))),
        F.lit(_BP),
    )
    return (
        docs.select("doc_id")
        .join(comps, "doc_id", "left")
        .select(
            F.col("doc_id").cast("bigint"),
            anchor.alias("anchor"),
            bucket.cast("bigint").alias("split_bucket"),
            F.when(bucket < F.lit(test_bp), F.lit("test"))
            .when(bucket < F.lit(test_bp + val_bp), F.lit("val"))
            .otherwise(F.lit("train")).alias("split"),
        )
    )


def packing_audit(packed: DataFrame, seq_len: int = 512) -> DataFrame:
    """(shard, n_docs, total_tokens, n_bins, n_fragmented,
    frag_bp, padding_tokens, padding_bp) — quality audit of an X21
    concat-then-split packing: how many documents got SPLIT across
    training-sequence boundaries (each fragment loses cross-boundary
    attention — the truncation cost quantified by Ding et al., "Fewer
    truncations improve language modeling", ICML 2024, which motivates
    best-fit packing precisely by this number), and how much tail
    padding each shard pays. frag_bp is the argument for moving to a
    smarter packer; padding_bp the argument it isn't needed (concat-
    then-split pads only the final bin per shard, so its padding is
    already near-optimal — the trade is fragmentation, not padding).

    Consumes X21's output columns, so the audit replays over any
    committed packing manifest without re-reading text. One partial-
    agged groupBy on shard; a doc is fragmented iff its token span
    crosses a bin boundary — pure bigint arithmetic."""
    end_bin = F.floor(
        (F.col("bin_id") * seq_len + F.col("offset_in_bin")
         + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / seq_len
    ).cast("bigint")
    frag = (F.col("n_tokens") > 0) & (end_bin > F.col("bin_id"))
    per = packed.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.when(frag, 1).otherwise(0)).cast("bigint")
        .alias("n_fragmented"),
    )
    n_bins = F.expr(
        f"(total_tokens + {seq_len} - 1) div {seq_len}"
    ).cast("bigint")
    return per.select(
        F.col("shard").cast("bigint"),
        "n_docs", "total_tokens",
        n_bins.alias("n_bins"),
        "n_fragmented",
        F.expr("(10000 * n_fragmented) div greatest(n_docs, 1)")
        .cast("bigint").alias("frag_bp"),
        (n_bins * seq_len - F.col("total_tokens")).cast("bigint")
        .alias("padding_tokens"),
        F.expr(
            f"(10000 * (((total_tokens + {seq_len} - 1) div {seq_len}) "
            f"* {seq_len} - total_tokens)) div greatest("
            f"((total_tokens + {seq_len} - 1) div {seq_len}) * {seq_len}, 1)"
        ).cast("bigint").alias("padding_bp"),
    )


def mixture_ess(weights: DataFrame,
                weight_col: str = "q_sampled") -> DataFrame:
    """(n_groups, sum_w_micro, ess_milli, ess_share_bp) — Kish
    effective sample size of a mixture weighting (Kish, Survey
    Sampling 1965: ESS = (Σw)²/Σw²) — the standard degeneracy check
    on any reweighting: X109's temperature weights or X37's DSIR
    importance weights can silently collapse onto a handful of groups
    (ESS → 1, the mixture is a monoculture wearing weights) or stay
    flat (ESS → n, the reweighting did nothing). Run it after every
    weight derivation, before tokens are spent; share = ESS/n.

    Weights quantize to micro units (round half-up to the 1e-6 grid,
    matching the 6-decimal fixed point the weight operators already
    emit), then ONE global aggregate in bigints. Headroom: Σw_micro
    for a normalized weighting is ~10^6, so (Σw)² ~ 10^12 and
    1000·(Σw)² ~ 10^15 « 2^63; the share derives from ess_milli to
    avoid the n·Σw² product (the collocations int64 lesson)."""
    w = F.round(F.col(weight_col) * 1_000_000, 0).cast("bigint")
    agg = weights.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(w).cast("bigint").alias("s"),
        F.sum(w * w).cast("bigint").alias("s2"),
    )
    return agg.select(
        "n_groups",
        F.col("s").alias("sum_w_micro"),
        F.expr("(1000 * s * s) div greatest(s2, 1)")
        .cast("bigint").alias("ess_milli"),
    ).select(
        "n_groups", "sum_w_micro", "ess_milli",
        F.expr("(10 * ess_milli) div greatest(n_groups, 1)")
        .cast("bigint").alias("ess_share_bp"),
    )


def curriculum_schedule(docs: DataFrame,
                        phase_bp: tuple[int, ...] = (5000, 3000, 2000),
                        score_col: str = "score",
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(phase, n_docs, n_tokens, score_min, score_max) — curriculum
    annealing assignment: order the corpus by ascending quality score
    and carve it into consecutive training phases by TOKEN budget
    (``phase_bp`` in basis points of the corpus token count), so the
    lowest-quality mass is consumed in phase 1 and the best data is
    what the model sees last. This is the delivery-side schedule the
    anneal-on-high-quality practice needs (curriculum learning,
    Bengio et al. ICML 2009; staged pretraining data schedules): X24
    answers "which docs fit ONE budget", this assigns EVERY doc to
    its stage.

    A document's position is its cumulative token count in
    (score asc, doc_id asc) order; with boundaries b_k = (total ·
    Σ_{j≤k} phase_bp_j) div 10000, a doc lands in phase
    1 + Σ_k [cum > b_k] — i.e. phase k while cum ≤ b_k, the same
    inclusive rule as X24's kept flag. Integer arithmetic end to end.

    Scale shape: boundaries come from the SCORE HISTOGRAM (one
    (score) partial agg; cumulative window over ≤ distinct-score
    rows, bounded because scores are basis-point-grained by
    convention), never from a global document sort. Interior score
    buckets assign WHOLESALE via a broadcast join (no boundary falls
    strictly inside their cumulative span, so every member shares the
    bucket-end phase); only the ≤ len(phase_bp)−1 boundary-straddling
    buckets get a doc-grain per-score cumulative window, and that
    window runs over one score's documents only (documented limit: a
    corpus where one score carries most of the token mass makes that
    window a hot partition — pre-salt by doc_id range if a score
    exceeds a partition budget)."""
    from docling_serve_spark.operators.textstats import token_count

    if sum(phase_bp) != 10000:
        raise ValueError(
            f"phase_bp must sum to 10000 basis points, got {sum(phase_bp)}"
        )
    base = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(score_col).cast("bigint").alias("score"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    if len(phase_bp) < 2:  # one phase: everything is phase 1
        return base.groupBy(F.lit(1).cast("int").alias("phase")).agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.min("score").cast("bigint").alias("score_min"),
            F.max("score").cast("bigint").alias("score_max"),
        )
    hist = base.groupBy("score").agg(
        F.sum("n_tokens").cast("bigint").alias("tok")
    )
    w_cum = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum_bp = []
    running = 0
    for bp in phase_bp[:-1]:
        running += bp
        cum_bp.append(running)
    buckets = hist.select(
        "score",
        F.sum("tok").over(w_cum).alias("cum_end"),
        (F.sum("tok").over(w_cum) - F.col("tok")).alias("cum_start"),
        F.sum("tok").over(w_all).cast("bigint").alias("total"),
    )
    bounds = [
        F.expr(f"(total * {c}) div 10000").cast("bigint") for c in cum_bp
    ]
    straddles = None
    end_phase = F.lit(1)
    for b in bounds:
        # cum_start == b COUNTS as straddling: a zero-token doc ordered
        # first in that bucket has per-doc cum == b and the inclusive
        # rule (phase k while cum <= b_k) puts it in the EARLIER phase —
        # wholesale assignment to the bucket-end phase would misplace it
        inside = (F.col("cum_start") <= b) & (b < F.col("cum_end"))
        straddles = inside if straddles is None else (straddles | inside)
        end_phase = end_phase + (F.col("cum_end") > b).cast("int")
    buckets = buckets.select(
        "score", "cum_start", "total",
        straddles.alias("straddle"),
        end_phase.cast("int").alias("bucket_phase"),
    )
    joined = base.join(F.broadcast(buckets), "score")
    whole = joined.filter(~F.col("straddle")).select(
        "score", "n_tokens", F.col("bucket_phase").alias("phase")
    )
    w_local = Window.partitionBy("score").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    strad = joined.filter(F.col("straddle")).withColumn(
        "__p", F.col("cum_start") + F.sum("n_tokens").over(w_local)
    )
    phase = F.lit(1)
    for b in bounds:
        phase = phase + (F.col("__p") > b).cast("int")
    strad = strad.select(
        "score", "n_tokens", phase.cast("int").alias("phase")
    )
    return (
        whole.unionByName(strad)
        .groupBy("phase")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.min("score").cast("bigint").alias("score_min"),
            F.max("score").cast("bigint").alias("score_max"),
        )
        .orderBy("phase")
    )


def balanced_trainset(docs: DataFrame, label_col: str = "label",
                      group_col: str = "lang", id_col: str = "doc_id",
                      n_buckets: int = 256) -> DataFrame:
    """(doc_id, grp, label) — a class-balanced training set per group:
    within each group (language, typically) every class keeps exactly
    ``m`` = the minority-class count, selected deterministically by
    Knuth-hash priority (which docs survive is stable across re-runs
    and independent of ingest order). This is the data-prep step for
    the fastText-style quality/domain classifiers corpus pipelines
    train (CCNet, Wettig et al.; FineWeb-Edu): gate verdicts or
    trusted-source membership give cheap labels, but the raw
    pos/neg ratio is wildly skewed per language, and a classifier
    trained on the skew learns the prior, not the signal.

    Exactness without a giant rank window: a per-(group, class)
    row_number over 10^9 rows is one hot partition, so selection is
    the bucket-histogram + boundary-bucket refinement used by X24/
    X159 — priority's top bits form ``n_buckets`` ordered buckets,
    a (group, class, bucket) partial-agg histogram (≤ groups×2×256
    rows) locates each class's cut, buckets strictly below the cut
    keep WHOLESALE, and only the single boundary bucket per class
    gets a doc-grain rank over ~1/n_buckets of the class. The kept
    set equals the plain rank-≤-m answer by construction (priority
    order is bucket-major)."""
    pri = hash_u32(F.col(id_col))
    base = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.col(label_col).alias("label"),
        pri.alias("__pri"),
        F.floor(pri / F.lit(_U32 // n_buckets)).cast("bigint")
        .alias("__bucket"),
    )
    hist = base.groupBy("grp", "label", "__bucket").agg(
        F.count("*").cast("bigint").alias("n")
    )
    counts = hist.groupBy("grp", "label").agg(
        F.sum("n").cast("bigint").alias("n_class")
    )
    minority = counts.groupBy("grp").agg(
        F.min("n_class").cast("bigint").alias("m")
    )
    w_cum = (
        Window.partitionBy("grp", "label").orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cuts = (
        hist.withColumn("__cum_end", F.sum("n").over(w_cum))
        .withColumn("__cum_start", F.col("__cum_end") - F.col("n"))
        .join(F.broadcast(minority), "grp")
        .filter(F.col("__cum_start") < F.col("m"))
        .select(
            "grp", "label", "__bucket", "__cum_start", "m",
            (F.col("__cum_end") <= F.col("m")).alias("__whole"),
        )
    )
    joined = base.join(
        F.broadcast(cuts), ["grp", "label", "__bucket"]
    )
    whole = joined.filter(F.col("__whole")).select(
        "doc_id", "grp", "label"
    )
    w_local = Window.partitionBy("grp", "label", "__bucket").orderBy(
        F.col("__pri").asc(), F.col("doc_id").asc()
    )
    boundary = (
        joined.filter(~F.col("__whole"))
        .withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__cum_start") + F.col("__rn") <= F.col("m"))
        .select("doc_id", "grp", "label")
    )
    return whole.unionByName(boundary)


def epoch_allocation(sources: DataFrame, budget_ratio_bp: int = 25000,
                     max_epochs: int = 4,
                     source_col: str = "source",
                     tokens_col: str = "n_tokens",
                     weight_col: str = "weight_bp") -> DataFrame:
    """(source, n_tokens, weight_bp, capped, epochs_micro,
    alloc_tokens) — data-constrained epoch allocation (Muennighoff et
    al., NeurIPS 2023: Scaling Data-Constrained Language Models —
    repeating data up to ~4 epochs costs little; beyond that returns
    decay): given per-source token counts and target mixture weights,
    split a training budget of ``(total · budget_ratio_bp) div 10^4``
    tokens proportionally to weight, cap every source at
    ``max_epochs`` repeats of its corpus, and re-spread the capped
    sources' unused budget over the uncapped ones — the water-filling
    answer, computed CLOSED-FORM with prefix sums rather than an
    iterative redistribution loop.

    Order sources by the quantized saturation key r = (max_epochs ·
    n_tokens · 10^4) div weight_bp ascending (the order in which
    proportional shares hit the repeat cap; ties and floor-induced
    near-ties break by source name — the quantized key IS the
    contract, so both engines cut identically). With prefix sums C/W
    of capacity and weight over PRECEDING rows, source k caps iff
    (B − C) · w_k ≥ capacity_k · (W_total − W); uncapped sources get
    epochs_micro = min((B_rem · w · 10^6) div (W_rem · n), cap) with
    B_rem/W_rem summed over the capped/uncapped sets — the min guard
    makes the allocation well-defined even at quantization boundaries.
    Wide intermediates ride DECIMAL(38,0) so a 10^13-token budget
    times 10^6-micro-epochs cannot wrap int64.

    Scale shape: the input is ONE ROW PER SOURCE (dozens to a few
    thousand), so the unpartitioned windows are bounded by the source
    count, never the corpus — the token counts themselves come from
    an upstream partial agg (`corpus_datasheet` / `token_count`)."""
    base = sources.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
        F.col(weight_col).cast("bigint").alias("weight_bp"),
    ).filter(F.col("weight_bp") > 0)
    cap_expr = F.lit(max_epochs) * F.col("n_tokens")
    keyed = base.select(
        "*",
        cap_expr.cast("bigint").alias("__cap"),
        F.expr(
            f"(CAST({max_epochs} AS DECIMAL(38,0)) * n_tokens * 10000) "
            "div weight_bp"
        ).cast("bigint").alias("__r"),
    )
    w_pre = (
        Window.orderBy(F.col("__r").asc(), F.col("source").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    staged = keyed.select(
        "*",
        (F.sum("__cap").over(w_pre) - F.col("__cap")).alias("__c_pre"),
        (F.sum("weight_bp").over(w_pre) - F.col("weight_bp"))
        .alias("__w_pre"),
        F.sum("weight_bp").over(w_all).alias("__w_tot"),
        F.expr("(CAST(sum(n_tokens) OVER () AS DECIMAL(38,0)) "
               f"* {budget_ratio_bp}) div 10000")
        .cast("bigint").alias("__budget"),
    )
    capped = staged.withColumn(
        "capped",
        F.expr(
            "(CAST(__budget - __c_pre AS DECIMAL(38,0)) * weight_bp) "
            ">= (CAST(__cap AS DECIMAL(38,0)) * (__w_tot - __w_pre))"
        ),
    )
    pools = capped.select(
        "*",
        F.sum(F.when(F.col("capped"), F.col("__cap")).otherwise(F.lit(0)))
        .over(w_all).alias("__c_capped"),
        F.sum(F.when(F.col("capped"), F.lit(0)).otherwise(F.col("weight_bp")))
        .over(w_all).alias("__w_rem"),
    )
    micro_uncapped = F.expr(
        "least((CAST(__budget - __c_capped AS DECIMAL(38,0)) * weight_bp "
        "* 1000000) div (greatest(__w_rem, 1) * greatest(n_tokens, 1)), "
        f"CAST({max_epochs} AS DECIMAL(38,0)) * 1000000)"
    ).cast("bigint")
    epochs = F.when(
        F.col("capped"), F.lit(max_epochs) * F.lit(1000000)
    ).otherwise(F.greatest(micro_uncapped, F.lit(0))).cast("bigint")
    return pools.select(
        "source", "n_tokens", "weight_bp", "capped",
        epochs.alias("epochs_micro"),
    ).withColumn(
        "alloc_tokens",
        F.expr("CAST((CAST(epochs_micro AS DECIMAL(38,0)) * n_tokens) "
               "div 1000000 AS BIGINT)"),
    )


def interleave_audit(delivery: DataFrame, shard_col: str = "shard",
                     pos_col: str = "pos",
                     source_col: str = "source") -> DataFrame:
    """(source, n_items, n_runs, max_run, mean_run_x100) — delivery-
    order mixing audit: in the order a trainer will actually read each
    shard, how long are the runs of consecutive same-source examples?
    Training on long single-source runs is the classic shuffle-quality
    failure (gradient steps see a non-stationary distribution; the
    data-loader literature calls this inter-shard shuffle debt) — a
    well-mixed delivery shows mean runs near 1 and small maxima, and a
    source whose max_run spans thousands of steps needs a re-shard or
    a within-shard shuffle before training.

    Run structure per shard via one lag + running-sum window in
    delivery order (the same narrow window shape as `sessionize`),
    run lengths from one (shard, run) partial agg, per-source stats
    from a second — the shuffle carries (shard, run_id, source, len)
    rows, never payloads. mean_run_x100 = (100·n_items) div n_runs,
    integer-exact. Delivery order is per shard by construction
    (trainers stream shards independently), so no global window
    exists anywhere in the plan."""
    w_seq = Window.partitionBy(shard_col).orderBy(pos_col)
    marked = delivery.select(
        F.col(shard_col).alias("__shard"),
        F.col(pos_col).alias("__pos"),
        F.col(source_col).alias("__src"),
    ).withColumn(
        "__new",
        (
            F.lag("__src").over(
                Window.partitionBy("__shard").orderBy("__pos")
            ).isNull()
            | (F.lag("__src").over(
                Window.partitionBy("__shard").orderBy("__pos")
            ) != F.col("__src"))
        ).cast("int"),
    ).withColumn(
        "__rid",
        F.sum("__new").over(
            Window.partitionBy("__shard").orderBy("__pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = marked.groupBy("__shard", "__rid").agg(
        F.first("__src").alias("source"),
        F.count("*").cast("bigint").alias("__len"),
    )
    return (
        runs.groupBy("source")
        .agg(
            F.sum("__len").cast("bigint").alias("n_items"),
            F.count("*").cast("bigint").alias("n_runs"),
            F.max("__len").cast("bigint").alias("max_run"),
        )
        .select(
            "source", "n_items", "n_runs", "max_run",
            F.expr("(100 * n_items) div n_runs").cast("bigint")
            .alias("mean_run_x100"),
        )
    )


def bin_provenance(packed: DataFrame, probes: DataFrame,
                   seq_len: int = 512) -> DataFrame:
    """(shard, bin_id, doc_id, tok_from, tok_to, n_tokens_in_bin) —
    training-data attribution, the inverse of `pack_sequences`: given
    probe training bins (the sequences a model actually consumed —
    a memorization hit, a regurgitation complaint, an eval leak),
    return every document that contributed tokens to each bin and the
    doc-relative token span it contributed. Packing provenance is the
    lineage record a 10^12-doc pipeline must be able to invert
    WITHOUT storing a per-token map: the (bin_id, offset) columns X21
    already emits are sufficient, and this op proves it.

    A doc occupies the global token interval [start, start+n) with
    start = bin_id·L + offset; it contributes to probe bin b iff
    start < (b+1)·L and start+n > b·L, and the contributed span is
    the interval intersection, re-based to doc-relative offsets.
    Pure integer arithmetic.

    Scale shape: probes are FEW (attribution requests), so the join
    is an equi-join on shard with the range condition as a residual
    filter — the probe side broadcasts, docs never shuffle, and the
    fan-out is bounded by probes-per-shard. The alternative (explode
    every doc's bin range, equi-join on bin) scans bounded rows but
    materializes corpus-tokens/L rows to answer a handful of probes;
    use that form only for probe sets comparable to the bin count."""
    p = packed.filter(F.col("n_tokens") > 0).select(
        F.col("doc_id").cast("bigint"),
        F.col("shard").cast("bigint").alias("__pshard"),
        F.col("n_tokens").cast("bigint"),
        (F.col("bin_id") * seq_len + F.col("offset_in_bin"))
        .cast("bigint").alias("__start"),
    ).withColumn("__end", F.col("__start") + F.col("n_tokens"))
    b = probes.select(
        F.col("shard").cast("bigint").alias("shard"),
        F.col("bin_id").cast("bigint").alias("bin_id"),
    )
    cond = (
        (F.col("__pshard") == F.col("shard"))
        & (F.col("__start") < (F.col("bin_id") + 1) * seq_len)
        & (F.col("__end") > F.col("bin_id") * seq_len)
    )
    j = p.join(F.broadcast(b), cond)
    tok_from = (
        F.greatest(F.col("__start"), F.col("bin_id") * seq_len)
        - F.col("__start")
    )
    tok_to = (
        F.least(F.col("__end"), (F.col("bin_id") + 1) * seq_len)
        - F.col("__start")
    )
    return j.select(
        "shard", "bin_id", "doc_id",
        tok_from.cast("bigint").alias("tok_from"),
        tok_to.cast("bigint").alias("tok_to"),
        (tok_to - tok_from).cast("bigint").alias("n_tokens_in_bin"),
    )


def compaction_plan(files: DataFrame, target_bytes: int = 134217728,
                    file_col: str = "file_id",
                    bytes_col: str = "n_bytes",
                    part_col: str | None = None) -> DataFrame:
    """(group_id, n_files, group_bytes, utilization_bp, n_small) —
    warehouse compaction planning, the small-files maintenance every
    table format schedules (Iceberg's rewrite_data_files / Delta
    OPTIMIZE bin-packing): assign files to merge groups targeting
    ``target_bytes`` per output file. A checkpointed extraction run
    that commits per-chunk leaves thousands of sub-target files; read
    amplification at 10^12 docs makes periodic compaction mandatory,
    and the PLAN must be deterministic so a re-run schedules the same
    merges.

    Files are ATOMIC (unlike X21's token packing, which splits
    documents across bins): a file lands wholly in the group where its
    cumulative START offset falls — group = cum_start div target, the
    prefix-sum binning rule — so groups can exceed target by at most
    one file, the standard bin-pack semantic. Order is (file_id) so
    the plan is ingest-order-stable. ``n_small`` counts inputs under
    half target (the files the compaction exists to absorb);
    utilization_bp = group bytes vs target.

    Scale shape: with ``part_col`` set (partition/chunk column —
    compaction never merges across partitions), the prefix sum is a
    per-partition window, bounded by files-per-partition; without it,
    one global window over the FILE MANIFEST (metadata rows — a 10^12
    -doc table has ~10^6-10^7 files, fine for one task; the partition-
    scoped form is the cluster path)."""
    from pyspark.sql import Window

    keys = [part_col] if part_col else []
    base = files.select(
        *( [F.col(part_col).alias(part_col)] if part_col else [] ),
        F.col(file_col).cast("bigint").alias("file_id"),
        F.col(bytes_col).cast("bigint").alias("n_bytes"),
    )
    w = (
        Window.partitionBy(*keys).orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = base.withColumn(
        "__start", F.sum("n_bytes").over(w) - F.col("n_bytes")
    ).withColumn(
        "group_id", F.expr(f"__start div {target_bytes}").cast("bigint")
    )
    return (
        placed.groupBy(*keys, "group_id")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("n_bytes").cast("bigint").alias("group_bytes"),
            F.sum((F.col("n_bytes") < target_bytes // 2).cast("bigint"))
            .cast("bigint").alias("n_small"),
        )
        .withColumn(
            "utilization_bp",
            F.expr(f"(10000 * group_bytes) div {target_bytes}")
            .cast("bigint"),
        )
    )


def stratified_holdout(docs: DataFrame, budget: int,
                       stratum_col: str = "lang",
                       id_col: str = "doc_id",
                       n_buckets: int = 256) -> DataFrame:
    """(doc_id, stratum) — an EXACT proportionally-stratified holdout
    of ``budget`` documents: each stratum's quota comes from Hamilton
    largest-remainder apportionment (floor share + top-up by remainder
    rank — the same house-seats rule X141 uses for crawl budgets, so
    quotas sum to the budget exactly and no stratum is rounded away),
    and members are the quota-many smallest Knuth-hash priorities, so
    the holdout is re-run-stable and ingest-order-independent. This is
    the eval-set construction step: a held-out set whose language (or
    source) mix matches the corpus, drawn deterministically so every
    pipeline run evaluates against the SAME documents.

    Selection avoids a giant per-stratum rank window via the X24/X160
    bucket-histogram discipline: priority's top bits form
    ``n_buckets`` ordered buckets, a (stratum, bucket) histogram
    locates each stratum's cut, wholesale-keep below it, doc-grain
    rank only inside the single boundary bucket per stratum.
    Apportionment windows run over one row per stratum."""
    from pyspark.sql import Window

    pri = hash_u32(F.col(id_col))
    base = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        pri.alias("__pri"),
        F.floor(pri / F.lit(_U32 // n_buckets)).cast("bigint")
        .alias("__bucket"),
    )
    hist = base.groupBy("stratum", "__bucket").agg(
        F.count("*").cast("bigint").alias("n")
    )
    counts = hist.groupBy("stratum").agg(
        F.sum("n").cast("bigint").alias("n_s")
    )
    w_all = Window.partitionBy()
    w_rem = Window.orderBy(
        F.expr(f"(CAST({budget} AS DECIMAL(38,0)) * n_s) % total").desc(),
        F.col("stratum").asc(),
    )
    quotas = counts.select(
        "stratum", "n_s",
        F.sum("n_s").over(w_all).cast("bigint").alias("total"),
    ).select(
        "stratum", "n_s", "total",
        F.expr(f"(CAST({budget} AS DECIMAL(38,0)) * n_s) div total")
        .cast("bigint").alias("__floor"),
        F.row_number().over(w_rem).cast("bigint").alias("__rr"),
    )
    # leftover seats = budget − Σ floor shares; the __rr smallest
    # remainder-ranks get one extra each (Hamilton)
    leftover = quotas.agg(
        (F.lit(budget) - F.sum("__floor")).cast("bigint").alias("__left")
    )
    quotas = quotas.crossJoin(F.broadcast(leftover)).select(
        "stratum",
        F.least(
            F.col("__floor")
            + (F.col("__rr") <= F.col("__left")).cast("bigint"),
            F.col("n_s"),
        ).cast("bigint").alias("m"),
    )
    w_cum = (
        Window.partitionBy("stratum").orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cuts = (
        hist.withColumn("__cum_end", F.sum("n").over(w_cum))
        .withColumn("__cum_start", F.col("__cum_end") - F.col("n"))
        .join(F.broadcast(quotas), "stratum")
        .filter(F.col("__cum_start") < F.col("m"))
        .select(
            "stratum", "__bucket", "__cum_start", "m",
            (F.col("__cum_end") <= F.col("m")).alias("__whole"),
        )
    )
    joined = base.join(F.broadcast(cuts), ["stratum", "__bucket"])
    whole = joined.filter(F.col("__whole")).select("doc_id", "stratum")
    w_local = Window.partitionBy("stratum", "__bucket").orderBy(
        F.col("__pri").asc(), F.col("doc_id").asc()
    )
    boundary = (
        joined.filter(~F.col("__whole"))
        .withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__cum_start") + F.col("__rn") <= F.col("m"))
        .select("doc_id", "stratum")
    )
    return whole.unionByName(boundary)


def long_context_supply(docs: DataFrame,
                        thresholds: tuple[int, ...] = (512, 2048, 8192),
                        source_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """(source, threshold, n_docs_ge, n_tokens_ge, token_share_bp) —
    the LONG-CONTEXT SUPPLY audit: per source, how many documents
    clear each context-length threshold and what share of the
    source's token mass they carry. Long-context training data is the
    scarce resource of the 100k-context era (a context window can
    only be trained on documents that FILL it — padding and packing
    fragments teach nothing about long-range attention), so the
    mixture decision needs this table before promising any context
    length: a source whose 32k-token share is zero cannot anchor a
    32k curriculum phase no matter its total mass.

    One token-count pass, one source-keyed partial agg with
    2·len(thresholds) conditional sums, then a literal-array unpivot —
    no per-threshold rescans, text never shuffles."""
    from docling_serve_spark.operators.textstats import token_count

    base = docs.select(
        F.col(source_col).alias("source"),
        token_count(F.col(text_col)).alias("__n"),
    )
    aggs = [
        F.sum("__n").cast("bigint").alias("__tok_total"),
    ]
    for t in thresholds:
        aggs.append(
            F.sum((F.col("__n") >= t).cast("bigint")).cast("bigint")
            .alias(f"__d{t}")
        )
        aggs.append(
            F.sum(F.when(F.col("__n") >= t, F.col("__n")).otherwise(0))
            .cast("bigint").alias(f"__t{t}")
        )
    wide = base.groupBy("source").agg(*aggs)
    pts = wide.select(
        "source", "__tok_total",
        F.explode(F.array(*[
            F.struct(
                F.lit(t).cast("bigint").alias("threshold"),
                F.col(f"__d{t}").alias("n_docs_ge"),
                F.col(f"__t{t}").alias("n_tokens_ge"),
            ) for t in thresholds
        ])).alias("p"),
    )
    return pts.select(
        "source",
        F.col("p.threshold").alias("threshold"),
        F.col("p.n_docs_ge").alias("n_docs_ge"),
        F.col("p.n_tokens_ge").alias("n_tokens_ge"),
        F.expr("(10000 * p.n_tokens_ge) div greatest(__tok_total, 1)")
        .cast("bigint").alias("token_share_bp"),
    )


def recency_weights(docs: DataFrame, age_col: str = "age_days",
                    group_col: str = "source", tau_days: int = 30,
                    id_col: str = "doc_id") -> DataFrame:
    """X206-wave — freshness-decayed sampling weights: each document
    gets weight exp(-age/tau) (exponential time decay, tau-day
    e-folding), normalized WITHIN its group to a sampling share —
    the standard recency prior for training-data selection over
    rolling crawl snapshots (newer captures of a source outweigh
    stale ones without hard cutoffs).

    Integer discipline: ``weight_micro = round(1e6·exp(-age/tau))``
    (bigint — the micro-unit log/exp convention shared with the
    char-LM and PMI operators); ``share_ppm = (1e6·w) div Σ_group w``
    is then pure bigint floor division, engine-exact.

    Shape at scale: one map pass for the weights (no shuffle), one
    hash aggregation for per-group totals with map-side combine,
    totals broadcast back (groups ≪ docs). No windows, no sort —
    the plan is two exchanges short of the naive per-group window
    formulation and skew-immune (a hot group is still only one
    aggregation row)."""
    wmic = F.round(
        F.exp(-F.col(age_col).cast("double") / float(tau_days)) * 1_000_000.0
    ).cast("bigint")
    weighted = docs.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.col(group_col).alias("grp"),
        F.col(age_col).cast("bigint").alias("age_days"),
        wmic.alias("weight_micro"),
    )
    totals = weighted.groupBy("grp").agg(
        F.sum("weight_micro").cast("bigint").alias("__w_total")
    )
    return (
        weighted.join(F.broadcast(totals), "grp")
        .select(
            id_col,
            F.col("grp").alias(group_col),
            "age_days",
            "weight_micro",
            F.expr("(1000000 * weight_micro) div greatest(__w_total, 1)")
            .cast("bigint").alias("share_ppm"),
        )
    )


def weighted_sample(docs: DataFrame, weight_col: str = "n_chars",
                    k: int = 50, id_col: str = "doc_id",
                    salt: str = "ws") -> DataFrame:
    """X213 — deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis, IPL 2006): each row draws a reproducible
    uniform u from an md5-derived hash of its id and competes on key
    ln(u)/w — the top-k keys are an exact weighted sample without
    replacement, computed as a single top-k pass (no sequential
    draws, no rejection loop — THE distributed-sampling algorithm,
    this is what Spark's own sampleBy cannot do without replacement
    across partitions).

    Determinism discipline: u = (h+1)/2^32 with h the first 32 md5
    bits of ``salt:id`` (u ∈ (0,1], portable to DuckDB bit-exactly);
    the competition key is ``key_nano = round(1e9·ln(u)/w)`` (bigint
    — the repo's integer log convention), ties broken by ascending
    id. Zero/negative weights clamp to 1.

    Shape at scale: one map pass (hash + ln — no shuffle), then
    TakeOrderedAndProject for the global top-k: per-partition heaps
    of k rows merged on the driver — no global sort, no window. The
    sample size k never scales with the corpus, so the driver merge
    stays constant-size at 10^12 rows."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    w = F.greatest(F.col(weight_col).cast("bigint"), F.lit(1))
    u = (h + 1).cast("double") / F.lit(4294967296.0)
    key_nano = F.round(F.log(u) * 1_000_000_000.0 / w.cast("double")).cast(
        "bigint"
    )
    return (
        docs.select(
            F.col(id_col).cast("bigint").alias(id_col),
            w.alias("weight"),
            key_nano.alias("key_nano"),
        )
        .orderBy(F.col("key_nano").desc(), F.col(id_col).asc())
        .limit(k)
    )


def rendezvous_shard(id_col, n_shards: int, salt: str = "hrw"):
    """Column: highest-random-weight (rendezvous) shard assignment
    (Thaler & Ravishankar, ToN 1998) — each row scores every shard
    with a 48-bit md5-derived weight and lands on the argmax. The
    property consistent-hash rings approximate, HRW gives exactly:
    growing S → S+1 shards moves ONLY the rows whose new-shard score
    wins (an expected 1/(S+1) of the corpus) and every other row
    stays put — the stable shard/bucket assignment that lets a
     10^12-doc corpus re-shard without a full rewrite. Per-row codegen
    over an n_shards-element literal-scored array (one array_max — no
    shuffle, no join); score ties (2^-48 probability) break toward
    the higher shard id (struct-max order), pinned in both engines."""
    scored = F.array(*[
        F.struct(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{salt}:{s}:"),
                                   id_col.cast("string"))),
                    1, 12,
                ),
                16, 10,
            ).cast("bigint").alias("score"),
            F.lit(s).cast("int").alias("shard"),
        )
        for s in range(n_shards)
    ])
    return F.array_max(scored)["shard"]


def rendezvous_stability(docs: DataFrame, n_shards: int = 8,
                         id_col: str = "doc_id") -> DataFrame:
    """X216 — the measured HRW re-shard audit: assign every doc at S
    and S+1 shards and report what moved. HRW theory says movers go
    ONLY to the new shard (n_changed_within MUST be 0 — the executable
    witness) at an expected 1/(S+1) rate; max/min shard load at S
    bounds the balance. One projection (both assignments per row,
    zero joins) + two tiny aggregates."""
    assigned = docs.select(
        F.col(id_col),
        rendezvous_shard(F.col(id_col), n_shards).alias("s_lo"),
        rendezvous_shard(F.col(id_col), n_shards + 1).alias("s_hi"),
    )
    moves = assigned.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((F.col("s_hi") == n_shards).cast("bigint"))
        .cast("bigint").alias("n_moved"),
        F.sum(
            ((F.col("s_hi") != n_shards)
             & (F.col("s_hi") != F.col("s_lo"))).cast("bigint")
        ).cast("bigint").alias("n_changed_within"),
    )
    # every shard id must appear in the load extrema — an EMPTY shard
    # is exactly the imbalance the audit exists to expose, and a bare
    # groupBy would silently drop it
    shard_ids = docs.sparkSession.range(n_shards).select(
        F.col("id").cast("int").alias("s_lo")
    )
    loads = (
        shard_ids.join(
            assigned.groupBy("s_lo").agg(
                F.count("*").cast("bigint").alias("load")
            ),
            "s_lo", "left",
        )
        .select(F.coalesce(F.col("load"), F.lit(0)).alias("load"))
        .agg(
            F.max("load").cast("bigint").alias("max_load"),
            F.min("load").cast("bigint").alias("min_load"),
        )
    )
    return (
        moves.crossJoin(F.broadcast(loads))
        .select(
            "n_docs", "n_moved",
            F.expr("(1000000 * n_moved) div n_docs").cast("bigint")
            .alias("moved_ppm"),
            F.lit(1_000_000 // (n_shards + 1)).cast("bigint")
            .alias("expected_ppm"),
            "n_changed_within", "max_load", "min_load",
        )
    )


def epoch_shuffle_audit(docs: DataFrame, n_shards: int = 16,
                        id_col: str = "doc_id",
                        epochs: tuple[str, str] = ("e1", "e2")) -> DataFrame:
    """X227 — epoch-reshuffle audit for training delivery: each epoch
    orders every shard's docs by a salted md5 rank (shard-LOCAL
    shuffling — the global-shuffle approximation every data loader
    actually ships, because a true global permutation of 10^12 rows
    is a full-corpus sort per epoch; shard-local + shard-order
    rotation is the standard substitute). Verifies the two properties
    that make it sound: each epoch's positions are a BIJECTION within
    every shard (max position == shard size, distinct positions ==
    shard size), and consecutive epochs are genuinely decorrelated —
    Spearman's footrule Σ|pos₁ − pos₂| lands near its random
    expectation n²/3 per shard (Diaconis & Graham, JRSS-B 1977), in
    exact integer arithmetic summed across shards.

    Emits one row: (n_docs, n_shards, bijection_ok, d_footrule,
    footrule_expected, footrule_ratio_bp ≈ 10000). Windows are
    PARTITIONED by shard — no global sort at any scale."""
    from pyspark.sql import Window

    shard = (F.col(id_col) % n_shards).alias("shard")
    base = docs.select(F.col(id_col).alias("id"), shard)
    pos = base
    for e in epochs:
        we = Window.partitionBy("shard").orderBy(
            F.md5(F.concat(F.lit(f"{e}:"), F.col("id").cast("string"))),
            F.col("id"),
        )
        pos = pos.withColumn(f"pos_{e}", F.row_number().over(we)
                             .cast("bigint"))
    a, b = (f"pos_{epochs[0]}", f"pos_{epochs[1]}")
    per_shard = pos.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("m"),
        F.max(a).cast("bigint").alias("max_a"),
        F.countDistinct(a).cast("bigint").alias("dist_a"),
        F.max(b).cast("bigint").alias("max_b"),
        F.countDistinct(b).cast("bigint").alias("dist_b"),
        F.sum(F.abs(F.col(a) - F.col(b))).cast("bigint").alias("d_shard"),
        # E[footrule] for a random permutation of m items = (m^2-1)/3
        F.expr("CAST((max(" + a + ") * max(" + a + ") - 1) div 3 "
               "AS BIGINT)").alias("exp_shard"),
    )
    return per_shard.agg(
        F.sum("m").cast("bigint").alias("n_docs"),
        F.count("*").cast("int").alias("n_shards"),
        F.min(
            (F.col("max_a") == F.col("m")) & (F.col("dist_a") == F.col("m"))
            & (F.col("max_b") == F.col("m")) & (F.col("dist_b") == F.col("m"))
        ).alias("bijection_ok"),
        F.sum("d_shard").cast("bigint").alias("d_footrule"),
        F.sum("exp_shard").cast("bigint").alias("footrule_expected"),
    ).withColumn(
        "footrule_ratio_bp",
        F.expr("(10000 * d_footrule) div greatest(footrule_expected, 1)")
        .cast("bigint"),
    )
