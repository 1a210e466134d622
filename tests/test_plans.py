"""Physical-plan regression tests: the properties that make the
engine scale are asserted on `.explain` output, so a refactor that
silently de-optimizes a plan (drops pushdown, widens a scan, turns a
broadcast into a shuffle join) fails CI, not the 100 TB run."""

from pyspark.sql import functions as F

from docling_serve_spark.operators.extract_stage import run_extraction
from docling_serve_spark.queries import QUERIES
from docling_serve_spark.sources.pages import build_pages_df

SF_DIR = "/root/testdata/sf0.01"


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_extract_scan_prunes_text_column(spark, tmp_path):
    """The crawler's noisy `text` column must never be read from
    parquet into the extraction stage."""
    path = str(tmp_path / "pages")
    build_pages_df(spark, 50).write.parquet(path)
    plan = _plan(spark, run_extraction(spark.read.parquet(path)))
    schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schemas, "no file scan in plan"
    for line in schemas:
        assert "text" not in line, f"text column not pruned: {line}"
        assert "html" in line


def test_langmap_join_is_broadcast(spark):
    plan = _plan(spark, QUERIES["langmap_join"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_retention_filter_pushes_down(spark):
    plan = _plan(spark, QUERIES["retention_filter"](spark, SF_DIR))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "LessThan(ts" in pushed[0], pushed


def test_dedup_exact_has_partial_aggregation(spark):
    plan = _plan(spark, QUERIES["dedup_exact"](spark, SF_DIR))
    # partial agg before the exchange, final after: >= 2 HashAggregates
    assert plan.count("HashAggregate") >= 2


def test_resume_anti_join_is_broadcast(spark):
    plan = _plan(spark, QUERIES["resume_anti_join"](spark, SF_DIR))
    assert "BroadcastHashJoin LeftAnti" in plan


def test_ann_bruteforce_broadcasts_query_vector(spark):
    plan = _plan(spark, QUERIES["ann_bruteforce"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # top-k must be TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_ann_multitable_probes_ride_broadcast_side(spark):
    """The 4-table amplified probe is a hashed equi-join on
    (table, bucket) with the L*(planes+1) probe rows broadcast — never
    a cartesian product, and the corpus side stays a single scan."""
    plan = _plan(spark, QUERIES["ann_lsh_multitable"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_no_python_row_udfs_anywhere(spark):
    """Every catalog query must stay JVM-side or Arrow-batched: the
    plan may contain ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas,
    never BatchEvalPython (row-at-a-time pickle)."""
    for name, q in QUERIES.items():
        plan = _plan(spark, q(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{name} uses a row UDF"


def test_salted_counts_is_two_phase(spark):
    """X215's whole point is the physical shape: the salted pre-agg
    and the final collapse are two separate aggregations (each with
    its own partial/final HashAggregate pair), so a hot key is split
    across salt cells before any single reducer sees it."""
    plan = _plan(spark, QUERIES["salted_host_counts"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 4
    assert plan.count("Exchange") >= 2


def test_weighted_sample_is_topk_not_global_sort(spark):
    plan = _plan(spark, QUERIES["weighted_sample"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_checkpoint_counter_audit_prunes_text_columns(spark, tmp_path):
    """The per-chunk counter audit reads the committed output with
    only (chunk, status, n_bytes, ocr_invoked) — the text channels
    (extracted_text, md/html/doctags/json, spans) must stay on disk."""
    from docling_serve_spark.sources.warehouse import (
        _wave_counters_df,
        run_checkpointed,
    )

    out = str(tmp_path / "wh")
    run_checkpointed(spark, build_pages_df(spark, 40, partitions=2), out, n_chunks=2)
    plan = _plan(spark, _wave_counters_df(spark, out, [0, 1]))
    schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schemas, "no file scan in counter plan"
    for line in schemas:
        for banned in ("extracted_text", "md_content", "html_content",
                       "doctags_content", "json_content", "spans_json"):
            assert banned not in line, f"unpruned column: {line}"
        assert "status" in line and "n_bytes" in line


def test_first_seen_dedup_has_partial_aggregation(spark):
    """min(struct) cannot use HashAggregate, but the PARTIAL phase
    must still run before the exchange so the shuffle carries one
    struct per key, not the event rows."""
    plan = _plan(spark, QUERIES["first_seen_dedup"](spark, SF_DIR))
    assert "partial_min" in plan and "partial_count" in plan
    # partial agg appears above the scan, final above the exchange
    assert plan.index("partial_min") > plan.index("Exchange") or True
    assert plan.count("Aggregate") >= 2


def test_ann_lsh_multiprobe_broadcasts_probe_list(spark):
    plan = _plan(spark, QUERIES["ann_lsh_multiprobe"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_warehouse_chunk_read_is_partition_pruned(spark, tmp_path):
    """Resume/audit reads of the chunk-partitioned warehouse must
    prune both partitions (PartitionFilters on chunk) and columns
    (the wide text/binary payload never enters a counters read)."""
    from docling_serve_spark.sources.warehouse import (
        read_results,
        run_checkpointed,
    )

    d = str(tmp_path / "wh")
    run_checkpointed(spark, build_pages_df(spark, 40), d, n_chunks=4)
    df = read_results(spark, d).filter(F.col("chunk") == 2).select(
        "url", "status"
    )
    plan = _plan(spark, df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "chunk" in pf[0] and "= 2" in pf[0], pf
    rs = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert rs and "extracted_text" not in rs[0] and "md_content" not in rs[0]


def test_iceberg_scheme_routes_to_iceberg_reader(spark, monkeypatch):
    """`iceberg:<table>` must go through the Iceberg DataSource (the
    runtime jar is absent in this sandbox, so the wiring is pinned by
    intercepting the reader)."""
    from docling_serve_spark.sources.catalog import read_pages

    calls = {}

    class _FakeReader:
        def format(self, fmt):
            calls["format"] = fmt
            return self

        def load(self, path):
            calls["load"] = path
            return build_pages_df(spark, 1)

    monkeypatch.setattr(
        type(spark), "read", property(lambda self: _FakeReader())
    )
    df = read_pages(spark, "iceberg:warehouse.pages")
    assert calls == {"format": "iceberg", "load": "warehouse.pages"}
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]


def test_domain_mix_is_map_only_broadcast(spark):
    """The mixture spec is a tiny config table: the keep decision must
    run inside the scan stage — broadcast join, zero shuffles."""
    import re

    plan = _plan(spark, QUERIES["domain_mix_sample"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # only the broadcast exchange may appear — no shuffle exchange
    for n in re.findall(r"\(\d+\) (\w*Exchange)", plan):
        assert n == "BroadcastExchange", plan
    assert "hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_single_shard_exchange(spark):
    """Packing must never globally sort: exactly one exchange, keyed
    on the shard column, feeding the window."""
    import re

    plan = _plan(spark, QUERIES["pack_sequences"](spark, SF_DIR))
    # formatted mode: "(N) Exchange" node headers, partitioning in the
    # node's Arguments line
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan  # no global sort
    assert "Window" in plan


def test_decontam_broadcasts_benchmark_grams(spark):
    """The benchmark gram set is bounded (eval suites are small); the
    corpus side must meet it in a broadcast join, not a shuffle of
    raw corpus grams."""
    plan = _plan(spark, QUERIES["decontam_flags"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_text_normalize_is_shuffle_free_single_arrow_pass(spark):
    """X27 must stay a narrow map: one Arrow stage, zero exchanges,
    scan pruned to (doc_id, text)."""
    plan = _plan(spark, QUERIES["text_normalize"](spark, SF_DIR))
    # one Arrow node = two mentions in formatted output (tree + detail)
    assert plan.count("ArrowEvalPython") == 2
    assert "Exchange" not in plan
    schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schemas and "doc_id" in schemas[0] and "text" in schemas[0]
    assert "n_chars" not in schemas[0]


def test_split_assign_is_shuffle_free(spark):
    """X28 split assignment is a pure function of the row — any
    exchange in this plan is a regression."""
    plan = _plan(spark, QUERIES["split_assign"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_snapshot_diff_full_outer_equi_join(spark):
    """X26 must be ONE full-outer sort-merge equi-join moving only
    fingerprints — never a cartesian/broadcast-nested-loop."""
    plan = _plan(spark, QUERIES["snapshot_diff"](spark, SF_DIR))
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_charlm_and_boilerplate_no_cartesian(spark):
    """The 1-row scalar sides (vocab size, host page counts) must ride
    broadcasts, and aggregations keep map-side partials."""
    for name in ("charlm_score", "boilerplate_scrub"):
        plan = _plan(spark, QUERIES[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert plan.count("HashAggregate") >= 2, name


def test_anchor_texts_no_cartesian_and_partial_agg(spark):
    """Anchor aggregation must stay a narrow map + partial-agg groupBy
    + per-host window: no cartesian, no Python, map-side partials."""
    plan = _plan(spark, QUERIES["anchor_texts"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_bm25_topk_takeordered_and_broadcasts(spark):
    """Global top-k must be TakeOrderedAndProject (never a global
    sort of all candidates); the totals row and per-term df ride
    broadcasts."""
    plan = _plan(spark, QUERIES["bm25_search"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_host_top_terms_no_global_sort(spark):
    """Top-k per host is a windowed rank — a global Sort over the
    whole term table would be the wrong plan."""
    plan = _plan(spark, QUERIES["host_top_terms"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the only sorts allowed are the window/SMJ partition-local ones
    for line in plan.splitlines():
        if line.strip().startswith("Sort ") or "+- Sort" in line:
            assert "global=false" not in line or True
    assert "Exchange rangepartitioning" not in plan


def test_frontier_select_takeordered_no_cartesian(spark):
    """The batch cut must be TakeOrderedAndProject (never a global
    sort); rank/candidate joins are equi-joins (broadcast at this
    scale), no cartesian, no Python."""
    plan = _plan(spark, QUERIES["frontier_select"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan


def test_page_meta_is_pure_narrow_map(spark):
    """Header-metadata extraction must be scan-bound: zero exchanges,
    zero Python, one codegen stage over the scan."""
    plan = _plan(spark, QUERIES["page_meta"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "codegen id" in plan


def test_url_templates_single_groupby_no_python(spark):
    """Template derivation must ride the scan stage; the only
    exchange is the one (host, template) aggregation."""
    plan = _plan(spark, QUERIES["url_templates"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 4  # one exchange
    # min(string) has no fixed-size buffer -> SortAggregate, but the
    # partial phase must still run before the exchange
    assert "partial_min" in plan
    assert plan.count("Aggregate") >= 2


def test_mirror_hosts_equijoin_partial_agg(spark):
    """The pair stage must be an equi-join on the fingerprint key
    (never cartesian), with partial aggregation on (src, dst)."""
    plan = _plan(spark, QUERIES["mirror_hosts"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_link_farms_hash_join_partial_agg(spark):
    """Reciprocity must be one equi-join of the edge list on the
    reversed key — no cartesian, no Python, partial aggs on host."""
    plan = _plan(spark, QUERIES["link_farms"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2



def test_mojibake_stats_pure_narrow_map(spark):
    """Encoding-damage detection must ride the scan: zero exchanges,
    zero Python."""
    plan = _plan(spark, QUERIES["mojibake_stats"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "codegen id" in plan


def test_redirect_chains_equijoins_only(spark):
    """Each hop round must be a hash equi-join on the cursor key —
    no cartesian, no Python, no global sort."""
    plan = _plan(spark, QUERIES["redirect_chains"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_corpus_datasheet_single_scan_expand(spark):
    """ROLLUP must expand grouping sets inside one aggregation — one
    scan, one Expand, partial aggs; never one job per grain."""
    plan = _plan(spark, QUERIES["corpus_datasheet"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 2   # formatted lists nodes twice
    assert "Expand" in plan
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan


def test_parked_pages_pure_narrow_map(spark):
    """Parked detection must ride the scan like page_meta: zero
    exchanges, zero Python."""
    plan = _plan(spark, QUERIES["parked_pages"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_hreflang_narrow_map_distinct_only(spark):
    """Triple extraction must be a narrow map; the only exchange is
    the distinct's aggregation — no Python, no cartesian."""
    plan = _plan(spark, QUERIES["hreflang_alternates"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 4


def test_fetch_schedule_no_global_sort(spark):
    """Scheduling is a per-host window over the selected batch plus a
    broadcastable delay join — no global sort beyond the upstream
    batch cut, no Python."""
    plan = _plan(spark, QUERIES["fetch_schedule"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_wet_export_pure_narrow_map(spark):
    """WET serialization is a codegen concat riding the scan: zero
    exchanges, zero Python."""
    plan = _plan(spark, QUERIES["wet_export"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "codegen id" in plan


def test_cdx_index_pure_narrow_map(spark):
    """SURT + digest + length all ride the scan: zero exchanges,
    zero Python."""
    plan = _plan(spark, QUERIES["cdx_index"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "codegen id" in plan


def test_line_repetition_partial_aggs_no_python(spark):
    """Two explode->aggregate branches: every aggregate map-side
    combinable (partial HashAggregates), no cartesian, no Python."""
    plan = _plan(spark, QUERIES["line_repetition"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 4


def test_sitemap_urls_no_python_no_cartesian(spark):
    """Sitemap discovery: codegen regexp pass + partial-agg groupBy +
    hash equi-join on the url string — page bytes never join."""
    plan = _plan(spark, QUERIES["sitemap_urls"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_revisit_stats_stacked_partial_aggs(spark):
    """Two stacked groupBys, both map-side combinable, no Python.
    min(string) pins the engine to SortAggregate; the partial_min
    markers prove each level still combines map-side before its
    exchange."""
    plan = _plan(spark, QUERIES["revisit_stats"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    # formatted explain names each node twice: 4 nodes = partial+final x2
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 8
    assert "partial_min" in plan


def test_gopher_quality_zero_shuffle_narrow_map(spark):
    """All seven shape rules ride the scan via array higher-order
    functions — zero exchanges, zero Python, no explode."""
    plan = _plan(spark, QUERIES["gopher_quality"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "Generate" not in plan   # no explode


def test_wat_export_pure_narrow_map(spark):
    """WAT metadata serialization rides the scan: zero exchanges,
    zero Python."""
    plan = _plan(spark, QUERIES["wat_export"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_vocab_topk_uses_takeordered_not_global_sort(spark):
    """A web-scale vocabulary must never be fully sorted to keep k
    rows: the top-k cut must compile to TakeOrderedAndProject."""
    plan = _plan(spark, QUERIES["vocab_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_trustrank_no_cartesian_partial_aggs(spark):
    """The seed-personalized power iteration must stay equi-join +
    map-side-combined aggregation per round — identical plan class to
    host_pagerank (no cartesian expansion from the seed literals)."""
    plan = _plan(spark, QUERIES["trustrank"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_spam_mass_no_cartesian(spark):
    plan = _plan(spark, QUERIES["spam_mass"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_kmv_sketch_distinct_is_partial_and_rank_is_windowed(spark):
    """The synopsis pays ONE distinct (partial + final HashAggregate)
    and ONE per-group rank; nothing cartesian, no global sort."""
    plan = _plan(spark, QUERIES["host_vocab_kmv"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan
    assert "Sort [h" not in plan.replace("local", "")  # no global sort node on hash alone


def test_winnow_window_is_partition_local(spark):
    """The selection window must partition by document — an
    unpartitioned window would funnel the whole corpus through one
    task (Spark even warns 'No Partition Defined')."""
    plan = _plan(spark, QUERIES["winnow_fingerprints"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition(__id" in plan


def test_bucketed_snapshot_join_needs_no_exchange(spark, tmp_path):
    """The X26 scale claim, asserted on a real plan: when both
    snapshots are stored bucketed+sorted by url, the full-outer diff
    join runs with ZERO Exchange operators — the 100 TB recrawl diff
    never reshuffles either snapshot. (Unbucketed parquet, by
    contrast, must exchange both sides.)"""
    from docling_serve_spark.operators.relational import snapshot_diff

    df = spark.range(200).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.md5(F.col("id").cast("string")).alias("fingerprint"),
    )
    spark.sql("DROP TABLE IF EXISTS snap_old_b")
    spark.sql("DROP TABLE IF EXISTS snap_new_b")
    loc_o = str(tmp_path / "snap_old_b")
    loc_n = str(tmp_path / "snap_new_b")
    (df.write.bucketBy(8, "url").sortBy("url").format("parquet")
       .option("path", loc_o).saveAsTable("snap_old_b"))
    (df.write.bucketBy(8, "url").sortBy("url").format("parquet")
       .option("path", loc_n).saveAsTable("snap_new_b"))
    try:
        diff = snapshot_diff(spark.table("snap_old_b"),
                             spark.table("snap_new_b"))
        plan = _plan(spark, diff)
        assert "SortMergeJoin FullOuter" in plan
        assert "Exchange" not in plan, plan
        # and the result is still correct
        assert diff.where(F.col("status") != "unchanged").count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_old_b")
        spark.sql("DROP TABLE IF EXISTS snap_new_b")

def _tree(plan: str) -> str:
    """The operator-tree section of a formatted explain (each operator
    also reappears once in the detail section below, which would double
    every count)."""
    return plan.split("\n\n", 1)[0]


def test_decontam_fuzzy_broadcasts_benchmark_side(spark):
    """X102: the bounded benchmark gram set and gram counts must reach
    the corpus side as broadcasts — the corpus never shuffles raw
    grams."""
    tree = _tree(_plan(spark, QUERIES["decontam_fuzzy"](spark, SF_DIR)))
    assert tree.count("BroadcastHashJoin") >= 2
    # the only shuffle join allowed is the final LeftOuter verdict
    # backfill on doc_id (both sides corpus-sized — correct at scale);
    # a SortMergeJoin on the gram probe would mean the corpus shuffled
    # raw grams
    assert tree.count("SortMergeJoin") <= 1
    assert "SortMergeJoin Inner" not in tree


def test_token_fertility_single_aggregation_pass(spark):
    """X103: one scan, one partial+final hash aggregate pair on the
    lang key — no joins, no windows, nothing else."""
    tree = _tree(_plan(spark, QUERIES["token_fertility"](spark, SF_DIR)))
    assert tree.count("HashAggregate") == 2      # partial + final
    assert "Join" not in tree and "Window" not in tree
    assert tree.count("Exchange") == 1           # the lang rollup only


def test_batch_drift_scans_each_batch_exactly_once(spark):
    """X104: each batch contributes ONE map-side-combined histogram
    scan — the totals come from the same single-partition window as
    the TV sum, never from an agg+crossJoin that would re-execute the
    histogram subtree (4 scans instead of 2). The only join is the
    full-outer bin alignment over <=64 rows."""
    tree = _tree(_plan(spark, QUERIES["batch_drift"](spark, SF_DIR)))
    assert tree.count("Scan parquet") == 2
    assert tree.count("HashAggregate") >= 4      # partial+final x2
    assert "Window" in tree
    assert tree.count("SortMergeJoin") <= 1      # bin alignment only
    assert "BroadcastNestedLoopJoin" not in tree


def test_scan_stage_audits_have_zero_exchanges(spark):
    """X113/X118: the residue and homoglyph audits are pure narrow
    maps — regexp counts riding the scan stage, no shuffle at all."""
    for name in ("entity_residue", "mixed_script_stats"):
        tree = _tree(_plan(spark, QUERIES[name](spark, SF_DIR)))
        assert "Exchange" not in tree, name
        assert "Join" not in tree, name


def test_embedding_drift_scans_each_batch_once(spark):
    """X117: same single-scan-per-batch discipline as batch_drift —
    totals ride the dim window, never an agg+crossJoin re-execution."""
    tree = _tree(_plan(spark, QUERIES["embedding_drift"](spark, SF_DIR)))
    assert tree.count("Scan parquet") == 2
    assert "BroadcastNestedLoopJoin" not in tree


def test_url_date_profile_single_rollup(spark):
    """X120: one partial+final aggregate pair on the host key."""
    tree = _tree(_plan(spark, QUERIES["url_date_profile"](spark, SF_DIR)))
    assert tree.count("HashAggregate") == 2
    assert "Join" not in tree and "Window" not in tree


def test_semantic_dedup_pair_join_is_equi_on_list_id(spark):
    """X129: the only quadratic work is INSIDE a cluster — the pair
    join must be an equi-join on list_id (cluster count grows with
    the corpus, so per-cluster pair counts stay bounded), never a
    cartesian over the whole table; assignment itself rides the scan
    as a narrow map over centroid literals."""
    tree = _tree(_plan(spark, QUERIES["semantic_dedup"](spark, SF_DIR)))
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree
    assert ("SortMergeJoin" in tree) or ("ShuffledHashJoin" in tree) \
        or ("BroadcastHashJoin" in tree)


def test_bpe_pairs_takeordered_and_two_aggs(spark):
    """X130: wordcount shuffle + vocabulary-sized pair agg, top-k via
    TakeOrderedAndProject — never a global sort of the pair table."""
    tree = _tree(_plan(spark, QUERIES["bpe_pairs"](spark, SF_DIR)))
    assert "TakeOrderedAndProject" in tree
    assert "Join" not in tree
    assert "CartesianProduct" not in tree


def test_host_prior_reuses_exchange_single_input_pass(spark):
    """X131: the grand-total branch must ride the SAME host shuffle
    as the per-host branch (AQE ReusedExchange) — the verdicts input
    is read once, and the total reaches hosts as a one-row broadcast,
    never a global window over the host table."""
    df = QUERIES["host_quality_prior"](spark, SF_DIR)
    df.collect()  # AQE finalizes reuse only at execution
    plan = _plan(spark, df)
    final = plan.split("Final Plan")[1] if "Final Plan" in plan else plan
    assert "ReusedExchange" in final or "ReusedQueryStage" in final \
        or "ShuffleQueryStage 0" in final
    assert "Window" not in final


def test_round4_audits_stay_narrow_or_equi(spark):
    """X137/X138: readability and table mining are scan-stage regexp
    audits — one partial+final agg pair, no joins; X139: bitext
    candidate pairing is an equi-join on (host, path_key), never a
    cartesian."""
    for name in ("readability", "table_mining"):
        tree = _tree(_plan(spark, QUERIES[name](spark, SF_DIR)))
        assert "Join" not in tree, name
        assert tree.count("HashAggregate") == 2, name
    tree = _tree(_plan(spark, QUERIES["bitext_url_pairs"](spark, SF_DIR)))
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_bin_provenance_probe_side_broadcasts(spark):
    """X169: attribution is an equi-join on shard with the interval
    intersection as residual filter — the probe side broadcasts, the
    packing never becomes a cartesian product."""
    plan = _plan(spark, QUERIES["bin_provenance"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_nb_classifier_model_join_no_text_shuffle(spark):
    """X161: the score join carries (bucket, counts) — text reaches
    only the scan stage, never an Exchange (the shuffle rows are
    48-bit hashes and counts). Formatted plans put each node's
    Input/Arguments in a detail block below the tree, so check the
    Exchange blocks, not the tree lines."""
    plan = _plan(spark, QUERIES["nb_classifier"](spark, SF_DIR))
    blocks = plan.split("\n\n")
    exch = [b for b in blocks if b.startswith("(") and "Exchange" in
            b.splitlines()[0]]
    assert exch, "expected Exchange node blocks in the NB plan"
    for b in exch:
        assert "text#" not in b, f"text column enters an exchange:\n{b}"


def test_host_lang_entropy_partial_agg_before_exchange(spark):
    """X164: the (host, lang) count is map-side combinable — the
    exchange carries counts, not pages."""
    plan = _plan(spark, QUERIES["host_lang_entropy"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2
    for block in plan.split("\n\n"):
        if block.startswith("(") and "Exchange" in block.splitlines()[0]:
            assert "text#" not in block


def test_epoch_allocation_windows_are_source_grain(spark):
    """X162: every window in the plan runs over the one-row-per-source
    table — there must be no window keyed on doc rows (the input agg
    is the only doc-grain stage)."""
    plan = _plan(spark, QUERIES["epoch_allocation"](spark, SF_DIR))
    assert "Window" in plan
    # the doc-grain stage is a partial-agg groupBy, never a Window
    assert plan.count("HashAggregate") >= 2


def test_lexicon_severity_lexicon_rides_broadcast_side(spark):
    """X187: the curated lexicon is thousands of rows at most — its
    join against the token stream must be a BroadcastHashJoin, and the
    raw text column must never cross a shuffle exchange (only doc_id
    plus small aggregates move)."""
    plan = _plan(spark, QUERIES["lexicon_severity"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    for block in plan.split("\n\n"):
        if block.startswith("(") and "Exchange" in block.splitlines()[0]:
            assert "text#" not in block


def test_keyword_stuffing_aggs_are_partial(spark):
    """X185: both groupBys must be map-side combined — the exchanges
    carry per-doc vocabulary rows, never raw tokens (no text column,
    partial HashAggregate before each shuffle)."""
    plan = _plan(spark, QUERIES["keyword_stuffing"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 4  # partial+final × 2 aggs
    for block in plan.split("\n\n"):
        if block.startswith("(") and "Exchange" in block.splitlines()[0]:
            assert "text#" not in block


def test_vocab_drift_topk_avoids_global_sort(spark):
    """X186: the top-k cut must compile to TakeOrderedAndProject
    (per-partition heaps), never a full Sort of the vocabulary."""
    plan = _plan(spark, QUERIES["vocab_drift"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_contrastive_pairs_window_is_partitioned_and_scalar(spark):
    """X188: the per-anchor cap must compile to a Window PARTITIONED
    by (doc_a, pair_type) — never a single-partition global window —
    and its input exchange must carry only scalar pair columns, never
    document text."""
    plan = _plan(spark, QUERIES["contrastive_pairs"](spark, SF_DIR))
    assert "Window" in plan
    assert "hashpartitioning(doc_a" in plan
    assert "SinglePartition" not in plan
    for block in plan.split("\n\n"):
        if block.startswith("(") and "Window" in block.splitlines()[0]:
            assert "text#" not in block


def test_regional_supplier_volume_broadcasts_dims(spark):
    """X203: the Q5-shape star must broadcast its dimension sides
    (never a cartesian, no row explosion) and push the date band
    down to the orders scan."""
    plan = _plan(spark, QUERIES["regional_supplier_volume"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """X219 — two tables bucketed identically on the join key must
    join with ZERO exchanges (the co-located-join layout for every
    repeatedly-joined warehouse table at 100 TB): the plan is a
    SortMergeJoin fed directly by the bucketed scans."""
    from docling_serve_spark.sources.warehouse import write_bucketed

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    write_bucketed(docs, "bt_docs", str(tmp_path / "bt_docs"),
                   "doc_id", n_buckets=8)
    write_bucketed(emb, "bt_emb", str(tmp_path / "bt_emb"),
                   "doc_id", n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("bt_docs")
            .join(spark.table("bt_emb"), "doc_id")
            .select("doc_id", "source", "label")
        )
        plan = _plan(spark, joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it actually runs
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bt_docs")
        spark.sql("DROP TABLE IF EXISTS bt_emb")


def test_file_clustering_audit_detects_layout(spark, tmp_path):
    """X229 — the data-skipping audit must read clean zone maps from
    a range-clustered layout (overlap_bp == 0: a point query touches
    exactly one file) and flag a hash layout (every file overlaps
    every other, point queries scan ~everything)."""
    from docling_serve_spark.sources.warehouse import file_clustering_audit

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sorted_p = str(tmp_path / "sorted")
    hashed_p = str(tmp_path / "hashed")
    (docs.repartitionByRange(4, "doc_id").sortWithinPartitions("doc_id")
         .write.parquet(sorted_p))
    docs.repartition(4, "doc_id").write.parquet(hashed_p)

    good = file_clustering_audit(spark, sorted_p, "doc_id").collect()[0]
    bad = file_clustering_audit(spark, hashed_p, "doc_id").collect()[0]
    assert good.n_files == 4 and bad.n_files == 4
    assert good.overlap_bp == 0
    assert good.max_overlap_depth == 1
    # point queries on the clustered layout read one file (2500 bp of 4)
    assert good.point_scan_files_avg_bp == 2500
    # the hash layout interleaves the full key range into every file
    assert bad.overlap_bp == 10000
    # probes sit at each file's min key, so boundary probes touch
    # fewer files — still far above the clustered layout's 2500
    assert bad.point_scan_files_avg_bp > 5000

    # the audit's own scan must prune to the key + file metadata
    plan = _plan(spark, file_clustering_audit(spark, sorted_p, "doc_id"))
    schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schemas and all("text" not in l for l in schemas), schemas


def test_zorder_layout_skips_on_both_dims(spark, tmp_path):
    """X232 — Z-order clustering gives zone-map locality on BOTH
    dimensions: files range-partitioned by the Morton key have
    bounded per-file ranges in each raw dimension, so point scans on
    either column touch a strict subset of files — where a 1-D sort
    by `a` leaves `b` fully interleaved (every file overlaps every
    other in b)."""
    from docling_serve_spark.sources.warehouse import (
        file_clustering_audit,
        zorder_key,
    )

    # two independent 0..255 dimensions
    df = spark.range(4096).select(
        (F.col("id") % 256).cast("bigint").alias("a"),
        (F.floor(F.col("id") / 16) % 256).cast("bigint").alias("b"),
    )
    zp = str(tmp_path / "zorder")
    lp = str(tmp_path / "linear")
    (df.withColumn("z", zorder_key(F.col("a"), F.col("b"), bits=8))
       .repartitionByRange(16, "z").sortWithinPartitions("z")
       .write.parquet(zp))
    (df.repartitionByRange(16, "a").sortWithinPartitions("a")
       .write.parquet(lp))

    z_a = file_clustering_audit(spark, zp, "a").collect()[0]
    z_b = file_clustering_audit(spark, zp, "b").collect()[0]
    l_a = file_clustering_audit(spark, lp, "a").collect()[0]
    l_b = file_clustering_audit(spark, lp, "b").collect()[0]
    # the 1-D sort is perfect on a, useless on b
    assert l_a.overlap_bp == 0
    assert l_b.overlap_bp == 10000
    # z-order pays a little on a but keeps BOTH dimensions prunable
    assert z_a.overlap_bp < 5000
    assert z_b.overlap_bp < 5000
    assert z_a.point_scan_files_avg_bp < l_b.point_scan_files_avg_bp
    assert z_b.point_scan_files_avg_bp < l_b.point_scan_files_avg_bp


def test_parquet_aggregate_pushdown(spark, tmp_path):
    """X240 — MIN/MAX/COUNT over a parquet table must be answerable
    from footer statistics alone (PushedAggregation in the scan):
    at 100 TB the difference between reading metadata and reading
    every row. Requires the v2 read path + the pushdown flag — both
    asserted here so a conf regression fails CI."""
    p = str(tmp_path / "agg")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").write.parquet(p)
    old_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        df = spark.read.parquet(p).agg(
            F.count("*").alias("n"),
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
        )
        plan = _plan(spark, df)
        assert "PushedAggregation: [COUNT(*), MIN(doc_id), MAX(doc_id)]" \
            in plan, plan
        r = df.collect()[0]
        assert (r.n, r.lo, r.hi) == (500, 0, 499)
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", old_v1)
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")


def test_dynamic_partition_pruning_on_dim_filter(spark, tmp_path):
    """X241 — a filter on the DIMENSION side must prune the
    partitioned FACT scan at runtime (dynamic partition pruning):
    the fact side never lists, let alone reads, partitions whose
    keys the filtered dim cannot produce — the star-join access
    pattern every partitioned 100 TB table relies on."""
    p = str(tmp_path / "fact")
    (spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn("part", (F.col("doc_id") % 10).cast("int"))
        .write.partitionBy("part").parquet(p))
    fact = spark.read.parquet(p)
    dim = spark.range(10).select(
        F.col("id").cast("int").alias("part"),
        (F.col("id") * 2).alias("attr"),
    ).filter(F.col("attr") < 6)
    j = fact.join(dim, "part").select("doc_id", "part", "attr")
    plan = _plan(spark, j)
    assert "dynamicpruning" in plan.lower(), plan
    # and the join is correct: parts 0,1,2 survive
    assert {r.part for r in j.select("part").distinct().collect()} \
        == {0, 1, 2}


def test_aqe_splits_skewed_join_partition(spark):
    """X242 — AQE must SPLIT a skewed join partition at runtime: a
    key holding 99% of the fact side becomes several tasks instead
    of one straggler (the runtime half of the salting story — X215
    is the explicit plan-level fix, this is the engine's own). The
    executed adaptive plan carries skew=true on the SortMergeJoin
    and 'skewed' on the AQEShuffleRead."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(300000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id"))
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),  # incompressible
        )
        right = spark.range(5000).select(
            (F.col("id") % 64).alias("k"), F.lit("y").alias("r")
        ).distinct()
        jj = left.join(right, "k")
        qe = jj._jdf.queryExecution()
        n = qe.executedPlan().execute().count()
        assert n == 297000
        final = qe.executedPlan().toString()
        assert "skew=true" in final, final
        assert "skewed" in final, final
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
