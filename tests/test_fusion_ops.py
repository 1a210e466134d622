"""Semantic unit tests for the round-5 fusion/propagation wave
(X206–X211): RRF hybrid fusion, source-PMI template mining, label
propagation, stylometric delta, recency-decay weights, and cohort
retention. (Cross-engine value parity vs DuckDB is covered by
test_oracle_parity.py; these check the operator semantics on
hand-computable inputs.)"""

import math

from pyspark.sql import Row, functions as F

from docling_serve_spark.operators import relational, sampling, textstats, webgraph
from docling_serve_spark.operators.retrieval import rrf_fuse


# ------------------------------------------------------------------ #
# rrf_fuse (X206)
# ------------------------------------------------------------------ #

def _ranked(spark, pairs):
    return spark.createDataFrame([Row(doc_id=d, rank=r) for d, r in pairs])


def test_rrf_hand_computed(spark):
    lex = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    sem = _ranked(spark, [(2, 1), (4, 2)])
    rows = {r.doc_id: r for r in rrf_fuse(lex, sem, k=10, c=60).collect()}
    # doc 2 appears in both lists: 1e6//62 + 1e6//61
    assert rows[2].rrf_micro == 1_000_000 // 62 + 1_000_000 // 61
    assert rows[2].lex_rank == 2 and rows[2].sem_rank == 1
    # doc 4 is sem-only; its lex_rank is NULL and lex contributes 0
    assert rows[4].lex_rank is None
    assert rows[4].rrf_micro == 1_000_000 // 62
    # doc 2 (both lists) outranks every single-list doc
    assert rows[2].rank == 1


def test_rrf_tie_breaks_by_ascending_id(spark):
    # docs 7 and 9 get identical contributions -> id order decides
    lex = _ranked(spark, [(9, 1), (7, 2)])
    sem = _ranked(spark, [(7, 1), (9, 2)])
    out = rrf_fuse(lex, sem, k=10).collect()
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] == [7, 9]


def test_rrf_truncates_to_k(spark):
    lex = _ranked(spark, [(i, i) for i in range(1, 8)])
    sem = _ranked(spark, [(i + 100, i) for i in range(1, 8)])
    assert rrf_fuse(lex, sem, k=5).count() == 5


# ------------------------------------------------------------------ #
# source_token_pmi (X207)
# ------------------------------------------------------------------ #

def test_pmi_concentrated_token_scores_high(spark):
    # 'footer' appears in every doc of source A and nowhere else;
    # 'common' appears in every doc of both sources (PMI == 0).
    rows = []
    for i in range(6):
        rows.append(Row(doc_id=i, source="A", text="footer common x"))
    for i in range(6, 12):
        rows.append(Row(doc_id=i, source="B", text="common y z"))
    docs = spark.createDataFrame(rows)
    out = {(r.source, r.term): r
           for r in textstats.source_token_pmi(docs, min_docs=5, k=5).collect()}
    # P(footer|A)=1, P(footer)=1/2 -> pmi = ln(2)
    assert out[("A", "footer")].pmi_micro == round(math.log(2) * 1_000_000)
    # corpus-wide token has zero PMI in both sources
    assert out[("A", "common")].pmi_micro == 0
    assert out[("B", "common")].pmi_micro == 0
    # presence counting: repeated token in one doc counts once
    assert out[("A", "footer")].n_docs_ts == 6


def test_pmi_support_filter(spark):
    rows = [Row(doc_id=i, source="A", text="rare" if i == 0 else "base")
            for i in range(10)]
    out = textstats.source_token_pmi(
        spark.createDataFrame(rows), min_docs=5, k=5
    ).collect()
    assert all(r.term != "rare" for r in out)


# ------------------------------------------------------------------ #
# label_propagation (X208)
# ------------------------------------------------------------------ #

def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _seeds(spark, pairs):
    return spark.createDataFrame([Row(host=h, label=l) for h, l in pairs])


def test_label_prop_spreads_and_clamps(spark):
    # a - b - c chain; a seeded 'news'. One round labels b, two label c.
    edges = _edges(spark, [("a", "b"), ("b", "c")])
    seeds = _seeds(spark, [("a", "news")])
    one = {r.host: r.label
           for r in webgraph.label_propagation(edges, seeds, 1).collect()}
    assert one == {"a": "news", "b": "news"}
    two = {r.host: r.label
           for r in webgraph.label_propagation(edges, seeds, 2).collect()}
    assert two == {"a": "news", "b": "news", "c": "news"}


def test_label_prop_plurality_and_tie_break(spark):
    # x has two 'shop' neighbours and one 'news' -> plurality 'shop';
    # y has one of each -> tie broken by ascending label ('news').
    edges = _edges(spark, [("s1", "x"), ("s2", "x"), ("n1", "x"),
                           ("s1", "y"), ("n1", "y")])
    seeds = _seeds(spark, [("s1", "shop"), ("s2", "shop"), ("n1", "news")])
    out = {r.host: r.label
           for r in webgraph.label_propagation(edges, seeds, 1).collect()}
    assert out["x"] == "shop"
    assert out["y"] == "news"


def test_label_prop_seed_never_overwritten(spark):
    # seed 'a' is surrounded by 'shop' voters but stays 'news'
    edges = _edges(spark, [("s1", "a"), ("s2", "a")])
    seeds = _seeds(spark, [("a", "news"), ("s1", "shop"), ("s2", "shop")])
    out = {r.host: (r.label, r.is_seed)
           for r in webgraph.label_propagation(edges, seeds, 2).collect()}
    assert out["a"] == ("news", True)


# ------------------------------------------------------------------ #
# stylometry_delta (X209)
# ------------------------------------------------------------------ #

def test_stylometry_outlier_ranks_first(spark):
    base = "the cat sat on the mat with a dog in a hat"
    rows = [Row(doc_id=i, text=base) for i in range(9)]
    rows.append(Row(doc_id=99, text="the " * 30))  # all function words
    out = textstats.stylometry_delta(spark.createDataFrame(rows), k=3).collect()
    assert out[0].doc_id == 99
    assert out[0].delta > out[1].delta


def test_stylometry_skips_empty_docs(spark):
    rows = [Row(doc_id=0, text="the quick brown fox"),
            Row(doc_id=1, text=""), Row(doc_id=2, text=None),
            Row(doc_id=3, text="of mice and men")]
    out = textstats.stylometry_delta(spark.createDataFrame(rows), k=10).collect()
    assert sorted(r.doc_id for r in out) == [0, 3]


# ------------------------------------------------------------------ #
# recency_weights (X210)
# ------------------------------------------------------------------ #

def test_recency_weights_decay_and_shares(spark):
    rows = [Row(doc_id=0, source="A", age_days=0),
            Row(doc_id=1, source="A", age_days=30),
            Row(doc_id=2, source="B", age_days=0)]
    out = {r.doc_id: r for r in
           sampling.recency_weights(spark.createDataFrame(rows)).collect()}
    assert out[0].weight_micro == 1_000_000
    assert out[1].weight_micro == round(math.exp(-1.0) * 1_000_000)
    # singleton group normalizes to the full million ppm
    assert out[2].share_ppm == 1_000_000
    # shares within a group never exceed the budget (floor division)
    assert out[0].share_ppm + out[1].share_ppm <= 1_000_000
    w0, w1 = out[0].weight_micro, out[1].weight_micro
    assert out[0].share_ppm == 1_000_000 * w0 // (w0 + w1)


# ------------------------------------------------------------------ #
# cohort_retention (X211)
# ------------------------------------------------------------------ #

def test_cohort_retention_hand_computed(spark):
    rows = [
        # user 1: first in week of 2026-01-05 (Mon), active weeks 0 and 2
        Row(user_id=1, ts="2026-01-06 10:00:00"),
        Row(user_id=1, ts="2026-01-20 09:00:00"),
        # user 2: same cohort, active only week 0 (two events, one user)
        Row(user_id=2, ts="2026-01-05 08:00:00"),
        Row(user_id=2, ts="2026-01-07 23:00:00"),
    ]
    ev = spark.createDataFrame(rows).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {(str(r.cohort_week), r.week_offset): r.n_users
           for r in relational.cohort_retention(ev).collect()}
    assert out[("2026-01-05", 0)] == 2
    assert out[("2026-01-05", 2)] == 1
    assert len(out) == 2


# ------------------------------------------------------------------ #
# key_skew_audit (X212)
# ------------------------------------------------------------------ #

def test_skew_audit_hand_computed(spark):
    # keys: a x 6, b x 2, c x 1, d x 1 -> counts sorted [1, 1, 2, 6]
    rows = [Row(key=k) for k in "aaaaaa" "bb" "c" "d"]
    r = relational.key_skew_audit(spark.createDataFrame(rows)).collect()[0]
    assert r.n_rows == 10 and r.n_keys == 4
    assert r.top_share_ppm == 600_000
    # ceil-rank order stats over [1, 1, 2, 6]
    assert r.p50_bucket == 1 and r.p90_bucket == 6 and r.p99_bucket == 6
    # B = 1*1 + 2*1 + 3*2 + 4*6 = 33; G = (2*33 - 5*10) / (4*10) = 0.4
    assert r.gini_ppm == 400_000


def test_skew_audit_uniform_keys_gini_zero(spark):
    rows = [Row(key=f"k{i % 5}") for i in range(20)]
    r = relational.key_skew_audit(spark.createDataFrame(rows)).collect()[0]
    assert r.gini_ppm == 0
    assert r.top_share_ppm == 200_000
    assert r.p50_bucket == r.p99_bucket == 4


# ------------------------------------------------------------------ #
# weighted_sample (X213)
# ------------------------------------------------------------------ #

def test_weighted_sample_deterministic_and_bounded(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=(i % 7) * 100) for i in range(200)]
    )
    a = sampling.weighted_sample(docs, k=20).collect()
    b = sampling.weighted_sample(docs, k=20).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert len(a) == 20
    # zero weights clamp to 1, never crash or divide by zero
    assert all(r.weight >= 1 for r in a)
    # keys are ln(u)/w <= 0 and sorted descending
    keys = [r.key_nano for r in a]
    assert keys == sorted(keys, reverse=True)
    assert all(k <= 0 for k in keys)


def test_weighted_sample_prefers_heavy_rows(spark):
    # one row carries 10^6 x the weight of the rest -> its key
    # ln(u)/w is ~10^6 closer to zero; it must be drawn first.
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=1) for i in range(50)]
        + [Row(doc_id=99, n_chars=1_000_000)]
    )
    top = sampling.weighted_sample(docs, k=1).collect()[0]
    assert top.doc_id == 99


# ------------------------------------------------------------------ #
# event_funnel (X214)
# ------------------------------------------------------------------ #

def _events(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, event_type=t, ts=ts) for u, t, ts in rows]
    ).select("user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))


def test_event_funnel_strict_ordering(spark):
    ev = _events(spark, [
        # user 1 completes the funnel in order
        (1, "view", "2026-01-01 10:00:00"),
        (1, "click", "2026-01-01 11:00:00"),
        (1, "purchase", "2026-01-01 12:00:00"),
        # user 2 clicks BEFORE viewing -> stops at step 1
        (2, "click", "2026-01-02 09:00:00"),
        (2, "view", "2026-01-02 10:00:00"),
        # user 3: click simultaneous with view -> strict '>' excludes
        (3, "view", "2026-01-03 10:00:00"),
        (3, "click", "2026-01-03 10:00:00"),
    ])
    r = relational.event_funnel(ev).collect()[0]
    assert (r.n_step1, r.n_step2, r.n_step3) == (3, 1, 1)
    assert r.conv12_ppm == 1_000_000 // 3
    assert r.conv23_ppm == 1_000_000


def test_event_funnel_first_touch_anchor(spark):
    # user's FIRST view anchors the funnel: a click between the two
    # views counts (it follows the first view).
    ev = _events(spark, [
        (1, "view", "2026-01-01 10:00:00"),
        (1, "click", "2026-01-01 10:30:00"),
        (1, "view", "2026-01-01 11:00:00"),
    ])
    r = relational.event_funnel(ev).collect()[0]
    assert (r.n_step1, r.n_step2, r.n_step3) == (1, 1, 0)


# ------------------------------------------------------------------ #
# salted_counts (X215)
# ------------------------------------------------------------------ #

def test_salted_counts_equals_plain_groupby(spark):
    rows = [Row(k="hot" if i % 4 != 3 else f"cold{i}", rid=i)
            for i in range(100)]
    df = spark.createDataFrame(rows)
    salted = {r.key: r.n_rows for r in
              relational.salted_counts(df, "k", F.col("rid"), 8).collect()}
    plain = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert salted == plain
    assert salted["hot"] == 75


# ------------------------------------------------------------------ #
# rendezvous_shard / rendezvous_stability (X216)
# ------------------------------------------------------------------ #

def test_hrw_movers_only_go_to_new_shard(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(500)])
    r = sampling.rendezvous_stability(docs, n_shards=8).collect()[0]
    assert r.n_changed_within == 0          # the HRW guarantee
    assert r.n_docs == 500
    # moved share is in the neighborhood of 1/9 (binomial n=500)
    assert 0.04 < r.n_moved / 500 < 0.20
    assert r.expected_ppm == 111_111


def test_hrw_assignment_is_stable_and_covering(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(300)])
    out = docs.select(
        "doc_id", sampling.rendezvous_shard(F.col("doc_id"), 4).alias("s")
    ).collect()
    again = docs.select(
        "doc_id", sampling.rendezvous_shard(F.col("doc_id"), 4).alias("s")
    ).collect()
    assert {r.doc_id: r.s for r in out} == {r.doc_id: r.s for r in again}
    assert {r.s for r in out} == {0, 1, 2, 3}


# ------------------------------------------------------------------ #
# proximity_topk (X217)
# ------------------------------------------------------------------ #

def test_proximity_window_semantics(spark):
    from docling_serve_spark.operators.retrieval import proximity_topk

    docs = spark.createDataFrame([
        # both terms within 2 of the anchor 'alpha'
        Row(doc_id=1, text="alpha beta gamma x y"),
        # gamma is 5 tokens from alpha -> outside window 2
        Row(doc_id=2, text="alpha beta x y z gamma"),
        # reordered still matches (proximity, not phrase)
        Row(doc_id=3, text="gamma beta alpha"),
        # missing gamma -> inner join drops it
        Row(doc_id=4, text="alpha beta alpha beta"),
    ])
    out = {r.doc_id: r.n_matches for r in
           proximity_topk(docs, ("alpha", "beta", "gamma"),
                          window=2, k=10).collect()}
    assert out == {1: 1, 3: 1}


def test_proximity_counts_each_qualifying_anchor(spark):
    from docling_serve_spark.operators.retrieval import proximity_topk

    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b a b a b"),  # anchors at 0,2,4 all near b
    ])
    out = proximity_topk(docs, ("a", "b"), window=1, k=10).collect()
    assert out[0].n_matches == 3


# ------------------------------------------------------------------ #
# hll_distinct (X218)
# ------------------------------------------------------------------ #

def _items(spark, rows):
    return spark.createDataFrame([Row(grp=g, it=t) for g, t in rows])


def test_hll_small_group_linear_counting_is_tight(spark):
    from docling_serve_spark.operators.sketches import hll_distinct

    rows = [("g", f"tok{i}") for i in range(10)] * 3  # dups ignored
    out = hll_distinct(_items(spark, rows), "grp", "it").collect()[0]
    assert out.exact_distinct == 10
    # linear counting at n << m is within a few percent
    assert abs(out.hll_est - 10) / 10 < 0.15
    assert out.v_zero_regs > 0


def test_hll_register_maxima_merge(spark):
    """The mergeability witness: HLL(A ∪ B) == element-wise register
    max — here proven at the result level: the sketch over the union
    equals the sketch over the same rows split into two halves and
    unioned (register max is what the groupBy computes either way)."""
    from docling_serve_spark.operators.sketches import hll_distinct

    a = [("g", f"x{i}") for i in range(400)]
    b = [("g", f"y{i}") for i in range(400)]
    whole = hll_distinct(_items(spark, a + b), "grp", "it").collect()[0]
    split = hll_distinct(
        _items(spark, a).unionByName(_items(spark, b)), "grp", "it"
    ).collect()[0]
    assert whole.hll_est == split.hll_est
    assert whole.n_regs == split.n_regs
    # 64 registers -> ~13% standard error; 800 distincts
    assert abs(whole.hll_est - 800) / 800 < 0.4


# ------------------------------------------------------------------ #
# design_effect (X220)
# ------------------------------------------------------------------ #

def test_deff_homogeneous_clusters_inflate(spark):
    # every host internally constant, hosts differ -> icc ~ 1,
    # deff ~ mean cluster size
    rows = [Row(host=f"h{g}", n_chars=1000 * (g + 1))
            for g in range(10) for _ in range(20)]
    r = textstats.design_effect(spark.createDataFrame(rows)).collect()[0]
    assert r.icc > 0.95
    assert r.deff > 15.0
    assert r.mean_group_size == 20.0


def test_deff_identical_distribution_no_inflation(spark):
    # the metric varies pseudo-randomly WITHIN hosts with no
    # host-level component -> icc ~ 0, deff stays near 1 (far from
    # the homogeneous case's ~20)
    rows = [Row(host=f"h{g}", n_chars=1000 + ((g * 97 + i * 37) % 500))
            for g in range(10) for i in range(20)]
    r = textstats.design_effect(spark.createDataFrame(rows)).collect()[0]
    assert abs(r.icc) < 0.15
    assert 0.0 <= r.deff < 3.0


# ------------------------------------------------------------------ #
# lone_late_supplier semantics (X222) — the Q21 correlation pair
# ------------------------------------------------------------------ #

def test_lone_late_supplier_double_correlation(spark):
    from docling_serve_spark.queries import (
        q_lone_late_supplier,
    )
    import datetime as dt

    base = dt.date(2024, 1, 1)
    orders = spark.createDataFrame(
        [Row(o_orderkey=k, o_orderdate=base) for k in (1, 2, 3, 4)]
    )
    late, ok = base + dt.timedelta(days=90), base + dt.timedelta(days=10)
    li = spark.createDataFrame([
        # order 1: two suppliers, ONLY s=10 late -> counts for 10
        Row(l_orderkey=1, l_suppkey=10, l_shipdate=late),
        Row(l_orderkey=1, l_suppkey=11, l_shipdate=ok),
        # order 2: two suppliers, BOTH late -> counts for neither
        Row(l_orderkey=2, l_suppkey=10, l_shipdate=late),
        Row(l_orderkey=2, l_suppkey=11, l_shipdate=late),
        # order 3: single supplier late -> no other participant, skip
        Row(l_orderkey=3, l_suppkey=10, l_shipdate=late),
        # order 4: s=10 has one late and one on-time line -> still late
        Row(l_orderkey=4, l_suppkey=10, l_shipdate=late),
        Row(l_orderkey=4, l_suppkey=10, l_shipdate=ok),
        Row(l_orderkey=4, l_suppkey=12, l_shipdate=ok),
    ])
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        orders.write.parquet(f"{d}/orders.parquet")
        li.write.parquet(f"{d}/lineitem.parquet")
        out = {r.s_suppkey: r.n_waits
               for r in q_lone_late_supplier(spark, d).collect()}
    assert out == {10: 2}   # orders 1 and 4 only


# ------------------------------------------------------------------ #
# neighborhood_function (X225)
# ------------------------------------------------------------------ #

def test_neighborhood_function_chain(spark):
    # a -> b -> c: exact ball pairs r1 = 5 (a:{a,b}, b:{b,c}, c:{c}),
    # r2 = 6 (a reaches c). m=16 registers at n<=3 distincts run the
    # linear-counting branch -> tight estimates.
    edges = _edges(spark, [("a", "b"), ("b", "c")])
    out = {r.r: r.est_pairs_micro
           for r in webgraph.neighborhood_function(edges, rounds=2).collect()}
    assert abs(out[1] / 1e6 - 5) / 5 < 0.15
    assert abs(out[2] / 1e6 - 6) / 6 < 0.15
    assert out[2] >= out[1]  # balls only grow


# ------------------------------------------------------------------ #
# jaccard_prefix_join (X226)
# ------------------------------------------------------------------ #

def test_prefix_join_hand_computed(spark):
    from docling_serve_spark.operators.dedup import jaccard_prefix_join

    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e"),
        Row(doc_id=2, text="a b c d x"),       # J=4/6 >= 3/5
        Row(doc_id=3, text="p q r s t u"),     # disjoint
        Row(doc_id=4, text="a b c d e f g h i j"),  # J(1,4)=1/2 < 3/5
    ])
    out = [(r.doc_id_a, r.doc_id_b, r.inter, r.jaccard_bp)
           for r in jaccard_prefix_join(docs, 3, 5).collect()]
    assert out == [(1, 2, 4, 6666)]


def test_prefix_join_duplicate_tokens_are_set_semantics(spark):
    from docling_serve_spark.operators.dedup import jaccard_prefix_join

    docs = spark.createDataFrame([
        Row(doc_id=1, text="a a a b b c"),   # set {a,b,c}
        Row(doc_id=2, text="c b a"),         # same set -> J=1
    ])
    out = jaccard_prefix_join(docs, 3, 5).collect()
    assert len(out) == 1
    assert out[0].jaccard_bp == 10000
    assert out[0].n_a == 3 and out[0].n_b == 3


# ------------------------------------------------------------------ #
# epoch_shuffle_audit (X227)
# ------------------------------------------------------------------ #

def test_epoch_shuffle_bijection_and_decorrelation(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(800)])
    r = sampling.epoch_shuffle_audit(docs, n_shards=8).collect()[0]
    assert r.bijection_ok
    assert r.n_docs == 800 and r.n_shards == 8
    # footrule near the random expectation (within +-40%)
    assert 6000 < r.footrule_ratio_bp < 14000


# ------------------------------------------------------------------ #
# doremi_weights (X230)
# ------------------------------------------------------------------ #

def test_doremi_upweights_hard_domain(spark):
    from docling_serve_spark.operators.langmodel import doremi_weights

    # ref-like domain A (same distribution as the reference slice)
    # vs domain B full of trigrams the model never saw -> B's loss
    # exceeds A's -> B gets the larger share
    rows = [Row(doc_id=i, source="A", text="the cat sat on the mat here")
            for i in range(10)]
    rows += [Row(doc_id=100 + i, source="B", text="zq xv qj vx jz qx zv")
             for i in range(10)]
    docs = spark.createDataFrame(rows)
    ref = docs.filter(F.col("source") == "A")
    out = {r.source: r for r in doremi_weights(docs, ref).collect()}
    assert out["B"].loss_micro > out["A"].loss_micro
    assert out["B"].excess_micro > 0 and out["A"].excess_micro == 0
    assert out["B"].share_ppm > out["A"].share_ppm
    # shares are a (floored) distribution
    assert out["A"].share_ppm + out["B"].share_ppm <= 1_000_000


# ------------------------------------------------------------------ #
# harmonic_centrality (X231)
# ------------------------------------------------------------------ #

def test_harmonic_centrality_star_center_wins(spark):
    # star: center -> every leaf AND every leaf -> center; the center
    # reaches all leaves at distance 1, leaves reach each other at 2
    leaves = [f"l{i}" for i in range(8)]
    edges = _edges(spark, [("c", l) for l in leaves]
                   + [(l, "c") for l in leaves])
    out = webgraph.harmonic_centrality(edges, rounds=2, k=3).collect()
    assert out[0].node == "c"
    assert out[0].rank == 1
    assert out[0].harmonic_micro > out[1].harmonic_micro


# ------------------------------------------------------------------ #
# review-fix guards
# ------------------------------------------------------------------ #

def test_deff_degenerate_inputs_yield_null_not_nan(spark):
    # one doc per host: n == k, MSW undefined -> NULL, never NaN
    one_per = spark.createDataFrame(
        [Row(host=f"h{i}", n_chars=100 + i) for i in range(6)]
    )
    r = textstats.design_effect(one_per).collect()[0]
    assert r.icc is None and r.deff is None
    # single host: k == 1, MSB undefined -> NULL
    single = spark.createDataFrame(
        [Row(host="h0", n_chars=100 + i) for i in range(6)]
    )
    r = textstats.design_effect(single).collect()[0]
    assert r.icc is None and r.deff is None


def test_hrw_min_load_sees_empty_shards(spark):
    # 3 docs over 8 shards: at least one shard MUST be empty
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(3)])
    r = sampling.rendezvous_stability(docs, n_shards=8).collect()[0]
    assert r.min_load == 0
    assert r.max_load >= 1


def test_proximity_rejects_repeated_terms(spark):
    import pytest as _pytest

    from docling_serve_spark.operators.retrieval import proximity_topk

    docs = spark.createDataFrame([Row(doc_id=1, text="alpha beta")])
    with _pytest.raises(ValueError, match="distinct"):
        proximity_topk(docs, ("alpha", "alpha"), window=2)


def test_zorder_rejects_sign_bit_widths(spark):
    import pytest as _pytest

    from docling_serve_spark.sources.warehouse import zorder_key

    with _pytest.raises(ValueError, match="31"):
        zorder_key(F.col("a"), F.col("b"), bits=32)


def test_prefix_join_twin_ids_never_collide(spark):
    # negative twin ids are disjoint from ANY real id space
    from docling_serve_spark.queries import q_prefix_jaccard_join

    out = q_prefix_jaccard_join(spark, "/root/testdata/sf0.001")
    ids = {r.doc_id_a for r in out.collect()} | {
        r.doc_id_b for r in out.collect()
    }
    twins = {i for i in ids if i < 0}
    bases = {i for i in ids if i >= 0}
    assert twins and bases
    assert not (set(-i - 1 for i in twins) & twins)


# ------------------------------------------------------------------ #
# exact_kth_bisect (X238)
# ------------------------------------------------------------------ #

def test_kth_bisect_matches_sorted_reference(spark):
    vals = [7, -3, 0, 42, 42, 5, -3, 9, 1000000, -50]
    df = spark.createDataFrame([Row(v=x) for x in vals])
    ref = sorted(vals)
    for k in (1, 3, 5, len(vals)):
        got, n = relational.exact_kth_bisect(df, F.col("v"), k)
        assert (got, n) == (ref[k - 1], len(vals))


def test_kth_bisect_rejects_bad_k(spark):
    import pytest as _pytest

    df = spark.createDataFrame([Row(v=1)])
    with _pytest.raises(ValueError):
        relational.exact_kth_bisect(df, F.col("v"), 2)


# ------------------------------------------------------------------ #
# typo_host_pairs (X239)
# ------------------------------------------------------------------ #

def test_typo_pairs_hand_computed(spark):
    from docling_serve_spark.operators.urltools import typo_host_pairs

    hosts = spark.createDataFrame([Row(host=h) for h in [
        "example.com",
        "exampl.com",    # deletion: distance 1
        "exomple.com",   # substitution: distance 1
        "exampel.com",   # transposition: distance 2 -> excluded
        "other.org",
    ]])
    got = {(r.host_a, r.host_b) for r in typo_host_pairs(hosts).collect()}
    assert got == {
        # '.' < 'e', so exampl.com sorts before example.com
        ("exampl.com", "example.com"),
        ("example.com", "exomple.com"),
        # exampel -> exampl is itself one deletion (the trailing 'e'
        # before 'l'), so the two typo variants pair up too
        ("exampel.com", "exampl.com"),
        # exampel.com vs example.com is a transposition = distance 2,
        # correctly absent; exampl vs exomple is distance 2, absent
    }


def test_typo_pairs_duplicates_collapse(spark):
    from docling_serve_spark.operators.urltools import typo_host_pairs

    hosts = spark.createDataFrame(
        [Row(host="a.com")] * 5 + [Row(host="b.com")] * 5
    )
    # distance("a.com","b.com") == 1 (substitution); dup rows collapse
    got = typo_host_pairs(hosts).collect()
    assert len(got) == 1
