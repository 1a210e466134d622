"""Partition-count invariance: the result of every shuffle-bearing
operator must be a pure function of the DATA, not of the parallelism
it ran at — the property that makes the N->4N scaling claim safe (a
cluster resize or an AQE re-plan must never change answers).

Each query runs twice in the same session at different
`spark.sql.shuffle.partitions` (4 vs 13 — coprime so partition
boundaries genuinely move) and must collect identical sorted rows.
This would catch: order-dependent double accumulation (why micro-nat
integer sums exist), window ties broken by physical row order instead
of explicit keys, and driver loops sensitive to partition iteration
order (kmeans/dup_components).
"""

import pytest

from docling_serve_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Shuffle-bearing representatives of each operator family: float
# aggregation (charlm/dsir), global prefix sums (token_budget),
# windows with explicit tie keys (host_top_terms, perplexity_buckets,
# pack_sequences), banded candidate joins (dedup_minhash), iterative
# driver loops (dup_components), span merges (substring_spans).
INVARIANCE_QUERIES = [
    "charlm_score",
    "dsir_weights",
    "perplexity_buckets",
    "host_top_terms",
    "token_budget_select",
    "pack_sequences",
    "dedup_minhash",
    "dedup_recall",
    "dup_components",
    "substring_spans",
    "ann_recall_multitable",
    "anchor_texts",     # per-host top-k window tie keys
    "bm25_search",      # micro-nat integer sums + global top-k
    "frontier_select",  # priority ties + per-host cap + batch cut
    "mirror_hosts",     # df-cap + pair emission via self-join
    "url_templates",    # distinct-count threshold per group
    "link_farms",       # reversed-key self-join counts
    "redirect_chains",  # iterative hop joins
    "corpus_datasheet", # rollup grains
    "fetch_schedule",   # per-host windows over X43 output
    "line_repetition",  # dup-line aggregates joined across branches
    "sitemap_urls",     # groupBy + membership join
    "revisit_stats",    # stacked two-level aggregation
    "c4_clean",         # posexplode + ordered reassembly + flag join
    "temporal_split",   # host envelope agg + verdict join
    "shard_manifest",   # order-independent fingerprint sum
    "lang_mismatch",    # detection pass + per-lang rollup
    "robots_sitemaps",  # multiline regexp + distinct
    "dup_cluster_stats",# histogram over iterative components
    "chunk_documents",  # sequence/slice explode
    "vocab_topk",       # wordcount + global rank tie-break
    "robots_delays",    # max-agg per host over extracted values
    "collocations",     # two-level counts + score joins + top-k
    "source_scorecard", # fp-count join + verdict join + rollup
    "host_health",      # per-page signal join + host rollup
    "title_dedup",      # fp groupBy + membership join
    "rep_ngram3_stats", # k=3 gram aggregation
    "trustrank",        # seed-personalized power iteration
    "spam_mass",        # two power iterations + ratio join
    "host_vocab_kmv",   # per-group k-smallest-hash rank
    "winnow_fingerprints",  # packed-key window min + distinct
    "hits_scores",      # max-normalized dual power iteration
    "cocitation_similar",  # df-capped pair self-join + degree joins
    "triangle_stats",   # degree-ordered wedge closure
    "phrase_search",    # posting joins + positional array pass
    "bloom_seen_urls",  # bit_or word agg + probe join + bool_and
    "cms_token_freq",   # counter groupBy + min-over-rows probe
    "semantic_dedup",   # k-means fixed point + pair tie rule
    "bpe_pairs",        # pair counts + global rank tie-break
    "delta_chains",     # per-url lag window ordering
    "bitext_url_pairs", # min-url dedup + bounded self-join
    "cdc_dedup",        # chunk digests across Arrow batch splits
    "host_quality_prior",  # reused-exchange grand total
    "crawl_budget",     # remainder TakeOrdered + leftover scalar
    "copy_direction",   # pair orientation tie rule
    "quality_ensemble", # cumulative sweep windows
    "code_switch",      # per-doc transition window
    "charset_decls",    # per-host top-legacy window tie
    "length_quantiles", # cumulative bin windows per lang
    "license_signals",  # per-host top-license window tie
    "mixture_ess",      # global integer sums + scalar division
    "index_delta_merge",  # anti-join merge + BM25 over merged index
    "curriculum_schedule",  # histogram windows + straddle-bucket split
    "balanced_trainset",    # bucket histogram + boundary-bucket rank
    "nb_classifier",    # hashed counts, micro-nat sums, checkpoint
    "calibration_bins", # broadcast extrema + binning over checkpoint
    "epoch_allocation", # quantized-order prefix sums
    "host_lang_entropy",  # per-host entropy terms + dominant tie
    "ai_optout",        # lag + running-sum group windows
    "interleave_audit", # per-shard run windows + stacked aggs
    "dedup_scope",      # fp-group window canonical + snapshot rollup
    "optout_impact",    # verdict join + broadcast total
    "bin_provenance",   # broadcast range join over packing
    "extract_diff",     # full-outer fingerprint join + format rollup
    "zipf_fit",         # decimal weighted sums + final double divisions
    "heaps_fit",        # word-grain min-id agg + conditional-sum curve
    "dedup_threshold_sweep",  # verified-pair histograms + grid lookup
    "compaction_plan",  # partition-scoped prefix-sum binning
    "stratified_holdout",  # Hamilton remainders + bucket-cut selection
    "oov_rate",         # broadcast vocab join + lang partial agg
    "quality_trend",    # snapshot rates + decimal LS slope
    "long_context_supply",  # conditional-sum thresholds + unpivot
    "host_categories",  # broadcast rules join + min-priority winner
    "keyword_stuffing", # two-level (doc,word)->doc aggregation
    "vocab_drift",      # conditional sums + driver totals + top-k tie
    "lexicon_severity", # broadcast lexicon join + zero-hit rejoin
    "contrastive_pairs",  # LSH verify + per-anchor row_number cap
    "confusable_hosts",  # two-level host->skeleton agg + collect_set
    "kcore_layers",     # iterative peel: per-round joins + checkpoints
    "jl_distortion",    # literal-matrix projection + shift self-join
    "char_entropy",     # micro-nat integer sums at (doc,gram) grain
    "effective_tokens",  # digest-grain cluster sizes + source rollup
    "pagination_chains",  # seam-hash join + bounded chain walk
    "pii_risk",         # per-doc regex counts + host rollup
    "decontam_weighted",  # gram df + micro-nat weighted hit sums
    "dom_skeletons",    # skeleton md5 groupBy + broadcast total
    "int8_quant",       # per-row quantization + shift self-join
    "allocation_fairness",  # global rank window + scalar joins
    "late_data_audit",  # per-shard arrival-order running max
    "embedding_outliers",  # broadcast sample + sorted distance list
    "host_reputation",  # pagerank + reciprocity + quality fusion
    "regional_supplier_volume",  # 6-table star + decimal rollup
    "part_supplier_breadth",  # anti-join + distinct-count agg
    "small_quantity_revenue",  # grouped-avg join-back threshold
    "hybrid_rrf",       # two top-k legs + full-outer rank fusion
    "template_pmi",     # presence explode + term join + source window
    "host_label_prop",  # synchronous plurality rounds + clamped seeds
    "stylometry",       # double moments broadcast + rounded top-k
    "recency_weights",  # per-group weight totals + ppm floor division
    "cohort_retention", # anchor-agg join-back + distinct counts
    "join_skew_audit",  # bucket-grain rank sums + ceil-rank pctls
    "weighted_sample",  # global top-k over hash-seeded keys
    "event_funnel",     # staged min-ts joins + strict ordering
    "salted_host_counts",  # two-phase salt must equal plain groupBy
    "rendezvous_stability",  # HRW argmax + load extrema
    "proximity_search",      # positional postings + window test
    "host_vocab_hll",        # register maxima + exact-power sums
    "deff_audit",            # integer ANOVA sums -> derived doubles
    "order_count_distribution",  # outer join + double aggregate
    "lone_late_supplier",    # semi + anti double correlation
    "late_order_priorities", # EXISTS as left-semi
    "rolling_crawl_rate",    # RANGE-frame trailing window
    "neighborhood_function", # register-max rounds + micro-int sums
    "prefix_jaccard_join",   # prefix candidates + pair verification
    "epoch_shuffle_audit",   # per-shard rank windows + footrule sums
    "idle_rich_customers",   # scalar broadcast + anti-join + rollup
    "doremi_weights",        # micro-nat loss ratios + exp shares
    "harmonic_centrality",   # register rounds + shell lag + top-k
    "event_cube",            # 2^k grouping-set grains in one pass
    "user_event_pivot",      # pivot as conditional aggregation
    "session_windows",       # native session_window merge semantics
    "table_stats",           # one-pass multi-column distinct counts
    "bowtie_structure",      # bounded dual reachability + tagging
    "exact_median_bisect",   # bisection counts must be data-pure
    "typo_host_pairs",       # deletion-key join + verify
]


def _rows_at(spark, name, n_shuffle):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
    try:
        df = QUERIES[name](spark, SF_DIR)
        rows = list(map(tuple, df.collect()))
        # None-safe sort: CUBE/outer-join rows carry NULL key cells
        return sorted(rows, key=lambda t: tuple(
            (v is None, str(v)) for v in t
        ))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", INVARIANCE_QUERIES)
def test_result_is_invariant_to_shuffle_partitioning(spark, name):
    a = _rows_at(spark, name, 4)
    b = _rows_at(spark, name, 13)
    assert len(a) > 0
    assert a == b
