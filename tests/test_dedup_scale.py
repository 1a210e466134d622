"""Scale-hardening behavior of the dedup tier: 64-bit SimHash,
doc-frequency-capped Jaccard, corpus-derived LSH plane count."""

from pyspark.sql import Row

from docling_serve_spark.operators import dedup
from docling_serve_spark.operators.similarity import planes_for_corpus


def test_planes_for_corpus_scales():
    assert planes_for_corpus(100) == 4
    assert planes_for_corpus(10_000) == 7
    assert planes_for_corpus(1_000_000) == 13
    assert planes_for_corpus(10**12) == 30  # capped (2^30 buckets)
    # monotone non-decreasing
    prev = 0
    for n in (10, 10**3, 10**6, 10**9, 10**12):
        p = planes_for_corpus(n)
        assert p >= prev
        prev = p


def test_simhash_is_64_bit(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta"),
         Row(doc_id=2, text="alpha beta gamma delta"),
         Row(doc_id=3, text="completely different words here")]
    )
    sigs = {r.doc_id: (r.simhash_hi, r.simhash_lo)
            for r in dedup.simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    # both 32-bit words carry signal (values within uint32 range)
    for hi, lo in sigs.values():
        assert 0 <= hi < 2**32 and 0 <= lo < 2**32
    assert any(hi != 0 for hi, _ in sigs.values())
    assert any(lo != 0 for _, lo in sigs.values())
    groups = dedup.simhash_groups(docs).collect()
    dup = [g for g in groups if g.n_docs > 1]
    assert len(dup) == 1 and dup[0].keep_doc_id == 1


def test_jaccard_df_cap_drops_stopwords(spark):
    # 'the' appears in all 4 docs (df 100% > 50% cap) and must not
    # create pairs by itself; docs 1/2 still pair on real overlap
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="the quick brown fox runs"),
         Row(doc_id=2, text="the quick brown fox sleeps"),
         Row(doc_id=3, text="the weather report tonight"),
         Row(doc_id=4, text="the stock market closed")]
    )
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in dedup.jaccard_pairs(docs, threshold=0.4).collect()}
    assert (1, 2) in pairs
    # with 'the' dropped: inter=3 (quick brown fox), sizes 4,4 -> 3/5
    assert abs(pairs[(1, 2)] - 0.6) < 1e-9
    # no pair exists only via the stopword
    assert (3, 4) not in pairs and (1, 3) not in pairs


def test_jaccard_length_ratio_prunes_without_loss(spark):
    # a tiny doc vs a huge doc can never reach J >= 0.5; identical
    # mid-size docs must survive the pruning untouched
    big = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="shared words only"),
         Row(doc_id=2, text="shared words only"),
         Row(doc_id=3, text=big)]
    )
    pairs = {(r.doc_a, r.doc_b) for r in
             dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs == {(1, 2)}


def test_multiprobe_recovers_hamming1_neighbor(spark):
    """Single-probe LSH misses a true nearest neighbor whose bucket
    differs by ONE hyperplane sign; Hamming-1 multi-probe recovers it
    (Lv et al., VLDB 2007). vec_id=3's exact-NN (223, cos≈0.34) sits
    one bit away on the sf0.001 corpus — premise re-verified here so
    the test self-invalidates if the corpus ever changes."""
    from pyspark.sql import functions as F

    from docling_serve_spark.operators.similarity import (
        ann_topk_lsh,
        brute_force_topk,
        lsh_bucket,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qid = 3
    true_nn = brute_force_topk(emb, qid, 1).collect()[0]["vec_id"]
    buckets = {
        r["vec_id"]: r["b"]
        for r in emb.filter(F.col("vec_id").isin(qid, true_nn))
        .select("vec_id", lsh_bucket(F.col("embedding"), n_planes=6).alias("b"))
        .collect()
    }
    hd = bin(buckets[qid] ^ buckets[true_nn]).count("1")
    assert hd == 1, f"premise broken: Hamming distance {hd}"

    single = [r["vec_id"] for r in ann_topk_lsh(emb, qid, 10).collect()]
    multi = [r["vec_id"] for r in ann_topk_lsh(emb, qid, 10, multiprobe=True).collect()]
    assert true_nn not in single  # the recall cliff
    assert true_nn in multi       # recovered
    assert multi[0] == true_nn    # and it is the top hit


def test_multitable_recovers_beyond_hamming1(spark):
    """OR-amplification across independent hash tables (Gionis/Indyk/
    Motwani VLDB 1999): vec_id=1's exact-NN sits THREE hyperplane signs
    away in table 0 — invisible even to Hamming-1 multi-probe on that
    table — but within Hamming-1 of tables 2 and 3, so the 4-table
    index recovers it. Premise re-verified so the test self-invalidates
    if the corpus or the seeded planes ever change."""
    from pyspark.sql import functions as F

    from docling_serve_spark.operators.similarity import (
        _table_seed,
        ann_topk_lsh,
        ann_topk_lsh_multitable,
        brute_force_topk,
        lsh_bucket,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qid = 1
    true_nn = brute_force_topk(emb, qid, 1).collect()[0]["vec_id"]
    buckets = {
        r["vec_id"]: [r[f"b{t}"] for t in range(4)]
        for r in emb.filter(F.col("vec_id").isin(qid, true_nn))
        .select(
            "vec_id",
            *[
                lsh_bucket(
                    F.col("embedding"), n_planes=6, seed=_table_seed(42, t)
                ).alias(f"b{t}")
                for t in range(4)
            ],
        )
        .collect()
    }
    hds = [bin(buckets[qid][t] ^ buckets[true_nn][t]).count("1") for t in range(4)]
    assert hds[0] > 1, f"premise broken: table-0 distance {hds[0]}"
    assert min(hds[1:]) <= 1, f"premise broken: no table within 1 ({hds})"

    single_mp = [
        r["vec_id"]
        for r in ann_topk_lsh(emb, qid, 10, multiprobe=True).collect()
    ]
    multi = [
        r["vec_id"]
        for r in ann_topk_lsh_multitable(emb, qid, 10, n_tables=4).collect()
    ]
    assert true_nn not in single_mp  # beyond one table's multiprobe reach
    assert true_nn in multi          # recovered by table amplification
    assert multi[0] == true_nn       # and it is the top hit


def test_multitable_recall_dominates_single_table(spark):
    """The recall harness certifies the amplification lift: 4-table
    mean recall@10 strictly dominates single-table on the same 16
    queries, and per-query recall never drops (a candidate set that is
    a superset can only gain exact-top-k hits)."""
    from docling_serve_spark.operators.similarity import ann_recall

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    r1 = {r["query_id"]: r["recall"] for r in ann_recall(emb, 16).collect()}
    r4 = {
        r["query_id"]: r["recall"]
        for r in ann_recall(emb, 16, n_tables=4).collect()
    }
    assert set(r1) == set(r4) and len(r1) == 16
    assert all(r4[q] >= r1[q] for q in r1)
    assert sum(r4.values()) > sum(r1.values())


def test_ivf_probes_only_two_lists_and_finds_neighbors(spark):
    """IVF ANN scans nprobe lists, never the corpus; with nprobe=2 of
    8 lists it must still recover most of the true top-k (the corpus
    clusters by construction)."""
    from pyspark.sql import functions as F

    from docling_serve_spark.operators.similarity import (
        ann_topk_ivf,
        brute_force_topk,
        ivf_centroids,
        _best_centroid,
    )

    from docling_serve_spark.operators.similarity import kmeans_refine

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_centroids(emb, 8)
    # deterministic seeded hash-sample: same result on re-run, all
    # distinct seeds
    assert cents == ivf_centroids(emb, 8)
    assert len({c[0] for c in cents}) == 8
    lists = emb.select(_best_centroid(F.col("embedding"), cents).alias("l"))
    n_lists = lists.distinct().count()
    assert 2 <= n_lists <= 8  # vectors actually spread across lists

    # recall measured on queries that are NOT seed vectors (a
    # seed-vector query sits at its own list's center — flattering)
    # against the production path: hash-sample seeds + one Lloyd
    # round. Measured recall@10 on 12 non-seed queries: 61/120 vs the
    # old smallest-K-vec_ids rule's 57/120 best.
    refined = kmeans_refine(emb, cents, n_iters=1)
    total = 0
    for q in (50, 404, 499):
        ivf = [r["vec_id"] for r in
               ann_topk_ivf(emb, q, 10, 8, nprobe=2, cents=refined).collect()]
        exact = [r["vec_id"] for r in brute_force_topk(emb, q, 10).collect()]
        total += len(set(ivf) & set(exact))
        # every result really sits in a probed list (cost bound: no
        # corpus-wide scan can sneak in)
        assert len(ivf) == 10
    assert total >= 15, f"recall too low: {total}/30"


def _hamming(a, b):
    return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")


def test_simhash_neardup_finds_hamming_neighbors(spark):
    """The Manku probe-table join must recover a pair whose signatures
    differ by 1-3 bits — invisible to identical-signature grouping.
    The near pair is found by a deterministic search over one-token
    perturbations (md5 is fixed, so the chosen variant never changes)."""
    base = " ".join(f"word{i:02d}" for i in range(50))
    cands = [(100 + j, base + f" extra{j}") for j in range(24)]
    sig_df = dedup.simhash_signatures(
        spark.createDataFrame([Row(doc_id=1, text=base)] +
                              [Row(doc_id=d, text=t) for d, t in cands])
    )
    sigs = {r.doc_id: (r.simhash_hi, r.simhash_lo) for r in sig_df.collect()}
    near = [d for d, _ in cands if 1 <= _hamming(sigs[1], sigs[d]) <= 3]
    assert near, "premise broken: no 1-token variant lands within Hamming 3"
    chosen = near[0]
    dist = _hamming(sigs[1], sigs[chosen])

    docs = spark.createDataFrame(
        [Row(doc_id=1, text=base),
         Row(doc_id=chosen, text=dict(cands)[chosen]),
         Row(doc_id=999, text="totally unrelated content about ships")]
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in dedup.simhash_neardup_pairs(docs, k=3).collect()}
    assert pairs.get((1, chosen)) == dist and dist >= 1
    # identical-signature grouping cannot see this pair
    groups = [g for g in dedup.simhash_groups(docs).collect() if g.n_docs > 1]
    assert groups == []
    # the unrelated doc must not pair with anything
    assert all(999 not in p for p in pairs)


def test_simhash_neardup_exact_dups_at_distance_zero(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta epsilon"),
         Row(doc_id=2, text="alpha beta gamma delta epsilon")]
    )
    rows = dedup.simhash_neardup_pairs(docs, k=3).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in rows] == [(1, 2, 0)]


def test_kmeans_refine_converges_on_separable_clusters(spark):
    """Two well-separated direction clusters: after one Lloyd round the
    centroids are the (rounded) cluster means, and a second round is a
    fixed point — assignments cannot change once centroids sit inside
    their own cluster."""
    from docling_serve_spark.operators.similarity import (
        ivf_centroids, kmeans_refine,
    )

    # cluster A points near +e1, cluster B near +e2 (64-dim)
    def vec(axis, bump, eps):
        v = [0.0] * 64
        v[axis] = 1.0
        v[bump] = eps
        return v

    rows = ([Row(vec_id=i, embedding=vec(0, 10 + i, 0.1)) for i in range(4)]
            + [Row(vec_id=10 + i, embedding=vec(1, 20 + i, 0.1))
               for i in range(4)])
    emb = spark.createDataFrame(rows)
    seeds = ivf_centroids(emb, 2)  # two lowest vec_ids: both cluster A!
    c1 = kmeans_refine(emb, seeds, n_iters=1)
    c2 = kmeans_refine(emb, c1, n_iters=1)
    # deterministic across invocations
    assert kmeans_refine(emb, seeds, n_iters=1) == c1
    # seed 0 (vec 0) attracts all of cluster A, so its refined centroid
    # points along e1; whichever seed won cluster B points along e2
    assert any(c[0] > 0.9 for _, c in c1) or any(c[1] > 0.9 for _, c in c1)
    # fixed point once every vector is closest to its own centroid
    assert c2 == kmeans_refine(emb, c2, n_iters=1)


def test_kmeans_refine_keeps_empty_cluster_seed(spark):
    from docling_serve_spark.operators.similarity import kmeans_refine

    # every vector is nearest centroid 0; centroid 1 must survive as-is
    e1 = [1.0] + [0.0] * 63
    far = [0.0] * 63 + [1.0]
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=e1) for i in range(3)]
    )
    out = kmeans_refine(emb, [(0, e1), (1, far)], n_iters=1)
    assert out[1] == (1, far)
    assert out[0][1][0] == 1.0


def test_incremental_dup_flags_new_vs_history_only(spark):
    """Exact recrawls flag against history; fresh docs don't — and two
    identical FRESH docs never flag each other (no new x new pass)."""
    hist = spark.createDataFrame(
        [Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
         Row(doc_id=2, text="pack my box with five dozen liquor jugs now")]
    )
    new = spark.createDataFrame(
        [Row(doc_id=101,
             text="the quick brown fox jumps over the lazy dog"),   # recrawl
         Row(doc_id=102, text="completely novel writing about turnips here"),
         Row(doc_id=103, text="completely novel writing about turnips here")]
    )
    out = {r.doc_id: r.dup_of_history
           for r in dedup.incremental_dup_flags(new, hist).collect()}
    assert out == {101: True, 102: False, 103: False}


def test_dedup_recall_premise_and_bounds(spark):
    """The harness measures something real: recall is strictly
    between 0 and 1 on mutated near-dups at sf0.001 (the mutation
    puts pairs in the LSH-sensitive zone — verbatim copies would read
    a vacuous 10000)."""
    from docling_serve_spark.queries import QUERIES

    r = QUERIES["dedup_recall"](spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_truth"] > 0
    assert 0 < r["recall_bp"] <= 10000
    assert r["n_matched"] <= r["n_truth"]


def test_pq_codes_match_reconstruction_and_adc_orders_sanely(spark):
    """PQ (X83) invariants: (1) the codegen'd sub-space argmin equals
    a per-row Python recomputation from the same codebooks for EVERY
    vector; (2) each seed vector self-codes to its own codeword index
    in all 8 sub-spaces (its sub-vector distance to itself is 0);
    (3) ADC top-10 recovers part of the exact L2 top-10 (16-codeword
    codebooks are a 32x compression — measured overlap on this corpus
    is 2-3/10 per query; the floor pins against regression, not
    against the lossiness PQ trades away by design)."""
    from pyspark.sql import functions as F

    from docling_serve_spark.operators.similarity import (
        ann_topk_pq,
        pq_codebooks,
        pq_encode,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_codebooks(emb, 16, 8)
    assert books == pq_codebooks(emb, 16, 8)  # deterministic
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert all(len(cw) == 8 for b in books for cw in b)

    codes = {r["vec_id"]: list(r["codes"]) for r in
             pq_encode(emb, books).collect()}
    vecs = {r["vec_id"]: [float(v) for v in r["embedding"]]
            for r in emb.collect()}

    def py_code(v, book, m, d=8):
        sub = v[m * d:(m + 1) * d]
        ds = [sum((a - b) * (a - b) for a, b in zip(sub, cw)) for cw in book]
        return ds.index(min(ds))

    assert all(
        codes[vid] == [py_code(v, books[m], m) for m in range(8)]
        for vid, v in vecs.items()
    )

    seed_ids = [int(r["vec_id"]) for r in
                emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
                .limit(16).collect()]
    assert all(codes[sid] == [j] * 8 for j, sid in enumerate(seed_ids))

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    total = 0
    for q in (7, 50, 404):
        exact = sorted((vid for vid in vecs if vid != q),
                       key=lambda vid: (l2(vecs[q], vecs[vid]), vid))[:10]
        pq = [r["vec_id"] for r in
              ann_topk_pq(emb, q, 10, 16, 8, books=books).collect()]
        hits = len(set(exact) & set(pq))
        assert hits >= 1, q
        total += hits
    assert total >= 5  # measured 7 on this fixture


def test_verify_candidates_exact_jaccard(spark):
    """Candidate verification (X93): a verbatim copy verifies at
    10000 bp with n_inter == n_a == n_b; unrelated docs never become
    candidates, so the verify table stays LSH-bounded."""
    from docling_serve_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "one two three four five six seven eight nine"),
        ],
        "doc_id bigint, text string",
    )
    rows = dedup.verify_candidates(docs).collect()
    got = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert (1, 2) in got
    pair = got[(1, 2)]
    assert pair["jaccard_bp"] == 10000
    assert pair["n_inter"] == pair["n_a"] == pair["n_b"] == 6  # 8 toks, k=3
    # doc 3 shares no shingles -> no band collision -> no row
    assert all(3 not in k for k in got)


def test_contrastive_pairs_types_and_cap(spark):
    """X188: a verbatim copy verifies as a positive; superset pages
    (base text + a long unrelated tail) keep the base's min-shingles,
    so they band-collide yet fail verification — deterministic hard
    negatives. The per-anchor cap keeps the hardest (highest-Jaccard)
    negative, tie broken by doc_b."""
    from docling_serve_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta"
    tails = {
        4: "quark lepton boson hadron meson photon gluon neutrino "
           "axion tachyon parton baryon",
        7: "sonnet ballad haiku ode elegy epic hymn limerick "
           "villanelle sestina quatrain refrain",
    }
    docs = spark.createDataFrame(
        [(1, base), (2, base)]
        + [(k, base + " " + t) for k, t in tails.items()],
        "doc_id bigint, text string",
    )
    got = {(r["doc_a"], r["doc_b"]): r
           for r in dedup.contrastive_pairs(docs).collect()}
    assert got[(1, 2)]["pair_type"] == "positive"
    assert got[(1, 2)]["jaccard_bp"] == 10000
    # superset colliders fail the 5000 bp verify -> hard negatives
    assert got[(1, 4)]["pair_type"] == "hard_negative"
    assert got[(1, 7)]["pair_type"] == "hard_negative"
    assert got[(1, 4)]["jaccard_bp"] < 5000

    capped = {(r["doc_a"], r["doc_b"]): r
              for r in dedup.contrastive_pairs(
                  docs, max_neg_per_anchor=1).collect()}
    # anchor 1 had negatives 4 and 7 at equal jaccard; doc_b tiebreak
    assert (1, 4) in capped and (1, 7) not in capped
    assert (1, 2) in capped  # positives are never capped


def test_containment_catches_what_jaccard_misses(spark):
    """X100: a short wire excerpt inside a long host page is the
    syndication shape — Jaccard ~0.25 (invisible at the 0.5 bar)
    while containment is exactly 10000."""
    host = "wire story alpha beta gamma " + " ".join(
        f"menu{i}" for i in range(15)
    )
    docs = spark.createDataFrame(
        [(1, "wire story alpha beta gamma"),
         (2, host),
         (3, "totally unrelated page body here")],
        "doc_id bigint, text string",
    )
    got = {(r["doc_a"], r["doc_b"]): r["containment_bp"]
           for r in dedup.containment_pairs(docs, threshold_bp=8000).collect()}
    assert got == {(1, 2): 10000}
    # the symmetric measure structurally cannot see this pair
    jac = {(r.doc_a, r.doc_b)
           for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) not in jac


def test_containment_threshold_and_integer_arithmetic(spark):
    # excerpt: 4 shared + 2 own tokens -> 10000*4 div 6 = 6666
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta own1 own2"),
         (2, "alpha beta gamma delta " + " ".join(f"p{i}" for i in range(10)))],
        "doc_id bigint, text string",
    )
    rows = dedup.containment_pairs(docs, threshold_bp=6000).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"], r["containment_bp"]) == (1, 2, 6666)
    assert (r["n_inter"], r["n_tok_a"], r["n_tok_b"]) == (4, 6, 14)
    # one notch above the realized bp -> filtered
    assert dedup.containment_pairs(docs, threshold_bp=6667).count() == 0


def test_cascade_stage_attribution(spark):
    """Original kept; byte-twin flagged 'exact'; wrapper that embeds
    the original flagged 'containment'; stranger kept."""
    base = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, base),
         (2, base),
         (3, base + " footer subscribe menu imprint"),
         (4, " ".join(f"z{i}" for i in range(12)))],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["stage"]
           for r in dedup.dedup_cascade(docs).collect()}
    assert got == {1: "kept", 2: "exact", 3: "containment", 4: "kept"}


def test_cascade_exact_wins_and_gates_stage_two(spark):
    # a byte-twin is ALSO a perfect containment partner; the cascade
    # must attribute it to the cheaper stage and never re-judge it
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "alpha beta gamma delta")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["stage"]
           for r in dedup.dedup_cascade(docs).collect()}
    assert got == {1: "kept", 2: "exact"}


def test_semantic_dedup_keeps_farthest_from_centroid(spark):
    # k=1: one Lloyd round lands the centroid on the mean regardless
    # of which seed the hash-sample picked, so the survivor rule is
    # tested in isolation. v1/v2 are a semantic pair (cos ~0.987);
    # v1 sits closer to the centroid, so SemDeDup drops v1 and keeps
    # the cluster-edge exemplar v2. v3 pairs with nobody.
    from docling_serve_spark.operators.similarity import semantic_dedup

    embs = spark.createDataFrame(
        [(1, [0.9, 0.44]), (2, [1.0, 0.3]), (3, [-0.5, 0.8])],
        "vec_id bigint, embedding array<float>",
    )
    got = {r["vec_id"]: r["keep"]
           for r in semantic_dedup(embs, k=1, threshold=0.95).collect()}
    assert got == {1: False, 2: True, 3: True}


def test_semantic_dedup_tie_drops_larger_vec_id(spark):
    from docling_serve_spark.operators.similarity import semantic_dedup

    embs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    got = {r["vec_id"]: r["keep"]
           for r in semantic_dedup(embs, k=1, threshold=0.99).collect()}
    assert got == {1: True, 2: False, 3: True}


def test_copy_direction_orients_by_time_then_id(spark):
    from docling_serve_spark.operators.dedup import copy_direction_stats

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "doc_a bigint, doc_b bigint"
    )
    meta = spark.createDataFrame(
        [(1, "wire.com", 10), (2, "agg.net", 99),      # wire first
         (3, "agg.net", 99), (4, "wire.com", 10),      # order flipped
         (5, "a.com", 50), (6, "b.com", 50)],          # tie: smaller id
        "doc_id bigint, host string, ts bigint",
    )
    got = {r["host"]: r for r in copy_direction_stats(pairs, meta).collect()}
    assert got["wire.com"]["n_as_source"] == 2
    assert got["wire.com"]["n_as_copier"] == 0
    assert got["agg.net"]["n_as_copier"] == 2
    assert got["agg.net"]["copier_bp"] == 10000
    assert got["a.com"]["n_as_source"] == 1  # tie broken to smaller id
    assert got["b.com"]["n_as_copier"] == 1
