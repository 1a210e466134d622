"""Property-based certification of the round-5 exactness claims:
the prefix-filtered similarity join finds EXACTLY the brute-force
pair set on random corpora, and HRW re-sharding moves rows ONLY to
the new shard. Spark round-trips are expensive, so each property
batches many random documents into ONE Spark job per example and
keeps example counts small — breadth comes from corpus size, not
example count."""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from docling_serve_spark.operators import sampling
from docling_serve_spark.operators.dedup import jaccard_prefix_join

# small vocabulary forces heavy set overlap — the adversarial regime
# for prefix filtering (ties in df order, shared rare tokens)
_VOCAB = [f"w{i}" for i in range(12)]

_doc = st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=8)
_corpus = st.lists(_doc, min_size=2, max_size=24)


def _brute_pairs(docsets, t_num=3, t_den=5):
    out = set()
    for i in range(len(docsets)):
        for j in range(i + 1, len(docsets)):
            a, b = docsets[i], docsets[j]
            inter = len(a & b)
            if t_den * inter >= t_num * (len(a) + len(b) - inter):
                out.add((i, j))
    return out


@settings(max_examples=12, deadline=None)
@given(_corpus)
def test_prefix_join_is_lossless_on_random_corpora(spark, docs):
    docsets = [set(d) for d in docs]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(d)) for i, d in enumerate(docs)]
    )
    got = {(r.doc_id_a, r.doc_id_b)
           for r in jaccard_prefix_join(df, 3, 5).collect()}
    assert got == _brute_pairs(docsets)


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=2, max_value=12),
       st.integers(min_value=0, max_value=10_000))
def test_hrw_growth_only_moves_to_new_shard(spark, n_shards, offset):
    docs = spark.createDataFrame(
        [Row(doc_id=offset + i) for i in range(120)]
    )
    r = sampling.rendezvous_stability(docs, n_shards=n_shards).collect()[0]
    assert r.n_changed_within == 0
    assert r.n_moved + 0 <= r.n_docs
    assert r.expected_ppm == 1_000_000 // (n_shards + 1)


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=400),
              st.integers(min_value=0, max_value=2000)),
    min_size=1, max_size=40,
))
def test_recency_weights_match_reference(spark, rows):
    """weight_micro and share_ppm reproduce the Python reference
    exactly (integer discipline end-to-end)."""
    df = spark.createDataFrame(
        [Row(doc_id=i, source=f"s{age % 3}", age_days=age)
         for i, (age, _) in enumerate(rows)]
    )
    out = {r.doc_id: r for r in sampling.recency_weights(df).collect()}
    ref_w = {i: round(math.exp(-(age / 30.0)) * 1_000_000)
             for i, (age, _) in enumerate(rows)}
    totals = {}
    for i, (age, _) in enumerate(rows):
        totals.setdefault(f"s{age % 3}", 0)
        totals[f"s{age % 3}"] += ref_w[i]
    for i, (age, _) in enumerate(rows):
        assert out[i].weight_micro == ref_w[i]
        assert out[i].share_ppm == (
            1_000_000 * ref_w[i] // max(totals[f"s{age % 3}"], 1)
        )
