"""Semantic unit tests for the corpus-pipeline operators added in
round 3: Gopher-style n-gram repetition stats, passage-level exact
dedup, and URL canonicalization / host aggregation. (Cross-engine
value parity vs DuckDB is covered by test_oracle_parity.py; these
check the operator semantics on hand-computable inputs.)"""

import pytest
from pyspark.sql import Row, functions as F

from docling_serve_spark.operators import (
    decontam,
    dedup,
    normalize,
    pii,
    relational,
    sampling,
    textstats,
    urltools,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


# ------------------------------------------------------------------ #
# ngram_repetition
# ------------------------------------------------------------------ #

def test_ngram_repetition_hand_computed(spark):
    # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b]
    #   counts: "a b"=3, "b a"=2 -> n=5, top=3, dup=5
    df = textstats.ngram_repetition(
        _docs(spark, [(1, "a b a b a b"), (2, "one two three four five six seven")])
    )
    got = {r["doc_id"]: r.asDict() for r in df.collect()}
    rep = got[1]
    assert rep["n_grams"] == 5
    assert rep["top_ngram_frac"] == pytest.approx(0.6)
    assert rep["dup_ngram_frac"] == pytest.approx(1.0)
    assert rep["repetitive"] is True
    clean = got[2]
    assert clean["n_grams"] == 6
    assert clean["top_ngram_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert clean["dup_ngram_frac"] == 0.0
    assert clean["repetitive"] is False


def test_ngram_repetition_short_docs_absent(spark):
    df = textstats.ngram_repetition(
        _docs(spark, [(1, "single"), (2, ""), (3, "  "), (4, "two tokens")])
    )
    assert [r["doc_id"] for r in df.collect()] == [4]


def test_ngram_repetition_threshold_is_integer_exact(spark):
    # exactly at the 0.20 boundary: top=1 of 5 -> 1*5 > 5 is False
    df = textstats.ngram_repetition(_docs(spark, [(1, "v w x y z q")]))
    row = df.collect()[0]
    assert row["top_ngram_frac"] == pytest.approx(0.2)
    assert row["repetitive"] is False


# ------------------------------------------------------------------ #
# passage dedup
# ------------------------------------------------------------------ #

def test_passage_windows_shape(spark):
    text = " ".join(f"t{i}" for i in range(17))  # 17 tokens, w=8 -> 8/8/1
    df = _docs(spark, [(1, text)]).select(
        dedup.passage_windows(F.col("text"), w=8).alias("p")
    )
    [ps] = [r["p"] for r in df.collect()]
    assert len(ps) == 3
    assert ps[0] == " ".join(f"t{i}" for i in range(8))
    assert ps[1] == " ".join(f"t{i}" for i in range(8, 16))
    assert ps[2] == "t16"


def test_passage_dup_groups_cross_doc(spark):
    shared = " ".join(f"s{i}" for i in range(8))
    docs = _docs(
        spark,
        [
            (1, shared + " " + " ".join(f"a{i}" for i in range(8))),
            (2, shared + " " + " ".join(f"b{i}" for i in range(8))),
            (3, " ".join(f"c{i}" for i in range(8))),
        ],
    )
    got = dedup.passage_dup_groups(docs, w=8).collect()
    assert len(got) == 1  # only the shared leading passage
    assert got[0]["n_docs"] == 2
    assert got[0]["n_occurrences"] == 2
    assert got[0]["keep_doc_id"] == 1


def test_passage_dup_groups_counts_within_doc_occurrences(spark):
    p = " ".join(f"s{i}" for i in range(8))
    docs = _docs(spark, [(1, p + " " + p), (2, p)])
    [g] = dedup.passage_dup_groups(docs, w=8).collect()
    assert g["n_docs"] == 2
    assert g["n_occurrences"] == 3


def test_passage_scrub_removes_cross_doc_passages(spark):
    shared = " ".join(f"s{i}" for i in range(8))
    a_tail = " ".join(f"a{i}" for i in range(8))
    b_tail = " ".join(f"b{i}" for i in range(8))
    solo = " ".join(f"c{i}" for i in range(8))
    docs = _docs(
        spark,
        [(1, shared + " " + a_tail), (2, shared + " " + b_tail), (3, solo)],
    )
    got = {r["doc_id"]: r for r in dedup.passage_scrub(docs, w=8).collect()}
    # the shared passage vanishes from BOTH docs; private tails survive
    assert got[1]["scrubbed_text"] == a_tail
    assert got[2]["scrubbed_text"] == b_tail
    assert got[3]["scrubbed_text"] == solo
    assert (got[1]["n_kept"], got[1]["n_dropped"]) == (1, 1)
    assert (got[3]["n_kept"], got[3]["n_dropped"]) == (1, 0)


def test_passage_scrub_within_doc_repeat_survives(spark):
    # occurring twice in ONE doc is repetition (X14's concern), not
    # cross-doc duplication — the scrub only drops n_docs > 1 passages
    p = " ".join(f"s{i}" for i in range(8))
    docs = _docs(spark, [(1, p + " " + p)])
    [r] = dedup.passage_scrub(docs, w=8).collect()
    assert r["scrubbed_text"] == p + " " + p
    assert (r["n_kept"], r["n_dropped"]) == (2, 0)


def test_passage_scrub_fully_duplicated_doc_empties(spark):
    p = " ".join(f"s{i}" for i in range(8))
    docs = _docs(spark, [(1, p), (2, p)])
    rows = {r["doc_id"]: r for r in dedup.passage_scrub(docs, w=8).collect()}
    assert rows[1]["scrubbed_text"] == "" and rows[2]["scrubbed_text"] == ""
    assert rows[1]["n_dropped"] == 1 and rows[1]["n_kept"] == 0


# ------------------------------------------------------------------ #
# URL canonicalization / host stats
# ------------------------------------------------------------------ #

# ------------------------------------------------------------------ #
# PII redaction
# ------------------------------------------------------------------ #

def test_redact_pii_all_three_classes(spark):
    text = "mail a.b+c@sub.example.co or +1 (555) 010-1234 from 192.168.0.1 ok"
    df = spark.createDataFrame([Row(t=text)]).select(
        pii.redact_pii(F.col("t")).alias("clean")
    )
    [clean] = [r["clean"] for r in df.collect()]
    assert clean == "mail <EMAIL> or <PHONE> from <IP> ok"


def test_pii_counts_order_no_double_count(spark):
    # the email's digits must not also count as a phone; the phone's
    # digits must not count as an IP
    rows = [Row(doc_id=1, text="x user123@h.io y +49 123 456 7890 z 8.8.8.8")]
    [r] = pii.with_pii_redaction(spark.createDataFrame(rows)).collect()
    assert (r["n_emails"], r["n_phones"], r["n_ipv4"]) == (1, 1, 1)
    assert r["had_pii"] is True


def test_pii_clean_doc_untouched(spark):
    rows = [Row(doc_id=1, text="no personal data here at all")]
    [r] = pii.with_pii_redaction(spark.createDataFrame(rows)).collect()
    assert r["had_pii"] is False
    assert (r["n_emails"], r["n_phones"], r["n_ipv4"]) == (0, 0, 0)


# ------------------------------------------------------------------ #
# corpus filter chain
# ------------------------------------------------------------------ #

def test_filter_chain_reasons_first_match_wins(spark):
    long_clean = " ".join(
        f"word{i} thing{i} item{i}" for i in range(30)
    )  # long, varied, alpha-heavy -> keep
    docs = _docs(
        spark,
        [
            (1, "tiny doc"),                       # too_short
            (2, " ".join(["spam ham"] * 40)),      # repetitive (and long)
            (3, long_clean),                       # keep
            # >=10 distinct tokens (no repeated bigram) but almost no
            # letters and short overall -> low_quality, not repetitive
            (4, " ".join(f"?{i}!" for i in range(12))),
        ],
    )
    got = {r["doc_id"]: r for r in textstats.corpus_filter_chain(docs).collect()}
    assert got[1]["reason"] == "too_short" and got[1]["keep"] is False
    assert got[2]["reason"] == "repetitive"
    assert got[3]["reason"] == "keep" and got[3]["keep"] is True
    assert got[4]["reason"] == "low_quality"


# ------------------------------------------------------------------ #
# decontamination
# ------------------------------------------------------------------ #

def test_decontam_flags_overlap_and_short_docs(spark):
    bench_passage = "the quick brown fox jumps over the lazy dog tonight"
    docs = _docs(
        spark,
        [
            (1, f"intro text then {bench_passage} then an outro here"),
            (2, "a completely different document about maritime law zz"),
            (3, "too short"),  # < k tokens: trivially clean
        ],
    )
    bench = spark.createDataFrame([Row(text=bench_passage)])
    got = {
        r["doc_id"]: r
        for r in decontam.contamination_flags(docs, bench, k=6).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1]["contaminated"] is True and got[1]["n_gram_hits"] >= 1
    assert got[2]["contaminated"] is False and got[2]["n_gram_hits"] == 0
    assert got[3]["contaminated"] is False


def test_decontam_counts_each_occurrence(spark):
    passage = "one two three four five six"
    docs = _docs(spark, [(1, f"{passage} filler {passage}")])
    bench = spark.createDataFrame([Row(text=passage)])
    [r] = decontam.contamination_flags(docs, bench, k=6).collect()
    assert r["n_gram_hits"] == 2  # the 6-gram appears twice


def test_contamination_ratio_catches_edited_leak(spark):
    """X102: one edited word kills every 6-gram (exact pass: clean)
    but only half the 3-grams — the fuzzy ratio still flags it."""
    question = "which color is the sky at noon today"
    edited = "which color is the sea at noon today"
    docs = _docs(
        spark,
        [
            (1, f"intro words then {edited} plus closing remarks"),
            (2, f"filler sentence containing {question} verbatim inside"),
            (3, "entirely unrelated maritime law document zz yy xx"),
        ],
    )
    bench = spark.createDataFrame([Row(bench_id=10, text=question)])
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in decontam.contamination_flags(docs, bench, k=6).collect()
    }
    assert exact == {1: False, 2: True, 3: False}
    got = {
        r["doc_id"]: r
        for r in decontam.contamination_ratio(
            docs, bench, threshold_bp=5000
        ).collect()
    }
    # edited leak: 3 of 6 bench 3-grams survive -> exactly 5000 bp
    assert got[1]["max_containment_bp"] == 5000
    assert got[1]["contaminated"] is True and got[1]["n_bench_hits"] == 1
    # verbatim leak: full containment
    assert got[2]["max_containment_bp"] == 10000
    assert got[3]["contaminated"] is False
    assert got[3]["max_containment_bp"] == 0


def test_contamination_ratio_denominator_is_bench_side(spark):
    # a long document wholly containing a short entry is 100% leakage
    # of that entry, never diluted by the document's own size
    entry = "alpha beta gamma delta"
    long_doc = entry + " " + " ".join(f"pad{i}" for i in range(60))
    docs = _docs(spark, [(1, long_doc)])
    bench = spark.createDataFrame([Row(bench_id=1, text=entry)])
    [r] = decontam.contamination_ratio(docs, bench).collect()
    assert r["max_containment_bp"] == 10000 and r["n_bench_hits"] == 1


# ------------------------------------------------------------------ #
# domain-mix sampling / sequence packing
# ------------------------------------------------------------------ #

def test_domain_mix_boundaries_and_determinism(spark):
    pages = spark.createDataFrame(
        [Row(doc_id=i, host=h) for i, h in enumerate(
            ["keep.all"] * 5 + ["drop.all"] * 5 + ["no.spec"] * 5
        )]
    )
    rates = spark.createDataFrame(
        [("keep.all", 1000000), ("drop.all", 0)], "host string, keep_ppm long"
    )
    out = sampling.domain_mix_sample(pages, rates)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(rows[i]["kept"] for i in range(5))           # ppm=1e6: all
    assert not any(rows[i]["kept"] for i in range(5, 15))   # 0 / absent
    assert rows[12]["keep_ppm"] == 0                        # absent -> 0
    again = {r["doc_id"]: r["kept"]
             for r in sampling.domain_mix_sample(pages, rates).collect()}
    assert again == {i: r["kept"] for i, r in rows.items()}


def test_pack_sequences_hand_computed(spark):
    # one shard (n_shards=1): token counts 3,4,2 with seq_len 5 ->
    # starts 0,3,7 -> bins 0,0,1, offsets 0,3,2
    docs = _docs(spark, [(0, "a b c"), (1, "d e f g"), (2, "h i")])
    got = {
        r["doc_id"]: r
        for r in sampling.pack_sequences(docs, seq_len=5, n_shards=1).collect()
    }
    assert (got[0]["bin_id"], got[0]["offset_in_bin"]) == (0, 0)
    assert (got[1]["bin_id"], got[1]["offset_in_bin"]) == (0, 3)
    assert (got[2]["bin_id"], got[2]["offset_in_bin"]) == (1, 2)
    assert all(r["shard"] == 0 for r in got.values())


# ------------------------------------------------------------------ #
# composed mixture pipeline
# ------------------------------------------------------------------ #

def test_mixture_gates_compose(spark):
    from docling_serve_spark.operators import corpus

    good = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(20))
    bench_passage = "secret eval question about the seven moons here"
    docs = _docs(
        spark,
        [
            (1, good),                              # survives everything
            (2, good),                              # exact dup of 1 -> loses
            (3, "too short"),                       # filter gate
            (4, f"{good} {bench_passage} tail"),    # decontam gate
            (5, good + " unique tail token"),       # host with ppm=0 -> mix gate
        ],
    )
    bench = spark.createDataFrame([Row(text=bench_passage)])
    hosts = spark.createDataFrame(
        [Row(doc_id=i, host="drop.host" if i == 5 else "keep.host")
         for i in range(1, 6)]
    )
    rates = spark.createDataFrame(
        [("keep.host", 1000000), ("drop.host", 0)],
        "host string, keep_ppm long",
    )
    flags = {
        r["doc_id"]: r
        for r in corpus.gate_flags(docs, bench, hosts, rates).collect()
    }
    assert flags[1]["keep_filter"] and flags[1]["is_winner"] \
        and flags[1]["clean"] and flags[1]["mix_kept"]
    assert not flags[2]["is_winner"]           # dup: min-doc_id wins
    assert not flags[3]["keep_filter"]
    assert not flags[4]["clean"]
    assert not flags[5]["mix_kept"]

    [funnel] = corpus.mixture_funnel(docs, bench, hosts, rates).collect()
    assert funnel["n_input"] == 5
    assert funnel["n_after_mix"] == 1

    packed = corpus.build_training_mixture(
        docs, bench, hosts, rates, seq_len=16, n_shards=1
    ).collect()
    assert [r["doc_id"] for r in packed] == [1]
    assert packed[0]["bin_id"] == 0 and packed[0]["offset_in_bin"] == 0


def test_canonical_url_collapses_variants(spark):
    urls = [
        "HTTPS://www.Example.com/Path/?q=1#frag",
        "http://example.com/path/",
        "example.com/path",
    ]
    df = spark.createDataFrame([Row(url=u) for u in urls]).select(
        urltools.canonical_url(F.col("url")).alias("c")
    )
    assert {r["c"] for r in df.collect()} == {"example.com/path"}


def test_host_stats_aggregates_by_canonical_host(spark):
    rows = [
        Row(doc_id=1, url="https://www.a.com/x", n_chars=10, lang="en"),
        Row(doc_id=2, url="http://a.com/y?z=1", n_chars=20, lang="fr"),
        Row(doc_id=3, url="https://b.com/", n_chars=5, lang="en"),
    ]
    got = {
        r["host"]: r.asDict()
        for r in urltools.host_stats(spark.createDataFrame(rows)).collect()
    }
    assert got["a.com"]["n_pages"] == 2
    assert got["a.com"]["total_chars"] == 30
    assert got["a.com"]["n_langs"] == 2
    assert got["a.com"]["first_doc_id"] == 1
    assert got["b.com"]["n_pages"] == 1


# ------------------------------------------------------------------ #
# host_quota / token_budget_select
# ------------------------------------------------------------------ #

_KNUTH, _U32 = 2654435761, 2**32


def _pri(doc_id):
    return (doc_id * _KNUTH) % _U32


def test_host_quota_matches_unsalted_reference(spark):
    # one mega-host (60 pages) + 10 small hosts (2 pages each): the
    # salted two-phase top-N must equal the plain per-host top-N.
    rows = [Row(doc_id=i, host="mega") for i in range(60)]
    rows += [Row(doc_id=100 + i, host=f"h{i % 10}") for i in range(20)]
    got = {
        (r["host"], r["doc_id"]): r["host_rank"]
        for r in sampling.host_quota(
            spark.createDataFrame(rows), max_per_host=3, n_salts=4
        ).collect()
    }
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r.doc_id)
    want = {}
    for host, ids in by_host.items():
        for rank, d in enumerate(
            sorted(ids, key=lambda d: (_pri(d), d))[:3], start=1
        ):
            want[(host, d)] = rank
    assert got == want


def test_host_quota_caps_and_is_deterministic(spark):
    rows = [Row(doc_id=i, host=f"h{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows)
    a = sorted(map(tuple, sampling.host_quota(df, max_per_host=5).collect()))
    b = sorted(map(tuple, sampling.host_quota(df, max_per_host=5).collect()))
    assert a == b
    counts = {}
    for _, host, rank in a:
        counts[host] = counts.get(host, 0) + 1
        assert 1 <= rank <= 5
    assert all(v == 5 for v in counts.values())


def test_token_budget_matches_global_cumsum(spark):
    texts = {i: " ".join(["w"] * (i % 7 + 1)) for i in range(50)}
    df = _docs(spark, list(texts.items()))
    got = {r["doc_id"]: r for r in
           sampling.token_budget_select(df, budget_tokens=60,
                                        n_buckets=8).collect()}
    cum = 0
    for d in sorted(texts, key=lambda d: (_pri(d), d)):
        n = d % 7 + 1
        cum += n
        assert got[d]["n_tokens"] == n
        assert got[d]["cum_tokens"] == cum, f"doc {d}"
        assert got[d]["kept"] == (cum <= 60)
    assert 0 < sum(r["kept"] for r in got.values()) < len(texts)


def test_token_budget_boundary_doc_dropped_not_truncated(spark):
    # build a budget that lands mid-document: the crossing doc is
    # dropped (kept=False) even though part of it would fit.
    df = _docs(spark, [(i, "a b c d") for i in range(10)])  # 4 tokens each
    got = sorted(
        sampling.token_budget_select(df, budget_tokens=10).collect(),
        key=lambda r: r["cum_tokens"],
    )
    assert [r["kept"] for r in got] == [True, True] + [False] * 8
    assert got[2]["cum_tokens"] == 12  # crossed 10 -> dropped whole


# ------------------------------------------------------------------ #
# blocklist_filter
# ------------------------------------------------------------------ #

def test_host_suffixes_shape(spark):
    df = spark.createDataFrame(
        [Row(host="a.b.example.com"), Row(host="example.com"),
         Row(host="localhost")]
    ).select("host", urltools.host_suffixes(F.col("host")).alias("s"))
    got = {r["host"]: r["s"] for r in df.collect()}
    assert got["a.b.example.com"] == [
        "a.b.example.com", "b.example.com", "example.com"
    ]
    assert got["example.com"] == ["example.com"]
    assert got["localhost"] == []  # never block a bare label/TLD


def test_blocklist_filter_exact_subdomain_and_tie(spark):
    pages = spark.createDataFrame(
        [Row(doc_id=1, host="bad.com"),          # exact
         Row(doc_id=2, host="cdn.bad.com"),      # subdomain
         Row(doc_id=3, host="notbad.com"),       # substring is NOT a match
         Row(doc_id=4, host="a.bad.com"),        # two list hits -> min wins
         Row(doc_id=5, host="clean.org")]
    )
    bl = spark.createDataFrame(
        [("bad.com",), ("a.bad.com",)], "domain string"
    )
    got = {r["doc_id"]: r for r in
           urltools.blocklist_filter(pages, bl).collect()}
    assert got[1]["blocked"] and got[1]["matched_domain"] == "bad.com"
    assert got[2]["blocked"] and got[2]["matched_domain"] == "bad.com"
    assert not got[3]["blocked"] and got[3]["matched_domain"] is None
    assert got[4]["blocked"] and got[4]["matched_domain"] == "a.bad.com"
    assert not got[5]["blocked"]


def test_extract_outlinks_routes_every_href_class(spark):
    """Relative/mailto/self-host targets drop; absolute externals keep
    multiplicity; uppercase HREF matches; malformed UTF-8 elsewhere in
    the page doesn't kill the row."""
    from docling_serve_spark.operators import webgraph

    html = (
        b'<a href="/rel">r</a>'
        b'<a href="mailto:x@y.z">m</a>'
        b'<a href="https://www.me.com/self">s</a>'
        b'<a HREF="https://Ext.net/a">1</a>'
        b'<a href="http://ext.net/b?q=1">2</a>'
        b'<a href="https://other.org/">3</a>'
        b"\xff\xfe junk bytes"
    )
    pages = spark.createDataFrame(
        [("http://me.com/page", bytearray(html))], "url string, html binary"
    )
    got = {(r["src_host"], r["dst_host"]): r["n_links"]
           for r in webgraph.extract_outlinks(pages).collect()}
    assert got == {("me.com", "ext.net"): 2, ("me.com", "other.org"): 1}


def test_extract_anchor_texts_branches_and_topk(spark):
    """Text anchors normalize (case/whitespace); image-wrapped, empty,
    relative, mailto, and same-host anchors drop; top-k keeps the k
    most-linked anchors per dst host with (n_links desc, anchor asc)
    tie-break."""
    from docling_serve_spark.operators import webgraph

    html = (
        b'<a href="/rel">local</a>'
        b'<a href="mailto:x@y.z">mail</a>'
        b'<a href="https://me.com/self">me</a>'
        b'<a HREF="https://ext.net/a">Read   MORE</a>'
        b'<a href="https://ext.net/b"> read more </a>'
        b'<a href="https://ext.net/c">beta</a>'
        b'<a href="https://ext.net/d">alpha</a>'
        b'<a href="https://ext.net/e">gamma</a>'
        b'<a href="https://ext.net/img"><img src="i.png"></a>'
        b'<a href="https://ext.net/empty"></a>'
    )
    pages = spark.createDataFrame(
        [("http://me.com/page", bytearray(html))], "url string, html binary"
    )
    rows = webgraph.extract_anchor_texts(pages, k=3).collect()
    got = {r["anchor"]: r for r in rows}
    # 'read more' wins (2 links, case+whitespace folded); the single-
    # link anchors tie and resolve alphabetically: alpha, beta kept,
    # gamma dropped by k=3
    assert set(got) == {"read more", "alpha", "beta"}
    assert got["read more"]["n_links"] == 2
    assert got["read more"]["rank"] == 1
    assert got["alpha"]["rank"] == 2 and got["beta"]["rank"] == 3
    assert all(r["dst_host"] == "ext.net" and r["n_src_hosts"] == 1
               for r in rows)


def test_bm25_topk_hand_computed(spark):
    """Exact micro-nat BM25 scores on a 3-doc corpus, checked against
    hand-evaluated integer arithmetic (idf_micro = round(1e6*ln(1.6))
    = 470004; contribution = idf*tf*44L div (20Ltf + 6L + 18*dl*N))."""
    from docling_serve_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple cherry"),
         (3, "banana banana banana")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in
            bm25_topk(docs, ["apple", "banana"], k=3).collect()}
    # d1: apple tf=2 dl=3 -> 330882816//530 = 624307;
    #     banana tf=1     -> 165441408//370 = 447138
    assert rows[1]["score_micro"] == 624307 + 447138
    assert rows[1]["rank"] == 1 and rows[1]["n_terms_matched"] == 2
    # d3: banana tf=3 dl=3 -> 496324224//690 = 719310
    assert rows[3]["score_micro"] == 719310 and rows[3]["rank"] == 2
    # d2: apple tf=1 dl=2 -> 165441408//316 = 523548
    assert rows[2]["score_micro"] == 523548 and rows[2]["rank"] == 3
    assert rows[2]["n_terms_matched"] == 1


def test_host_pagerank_hand_computed_and_dedup(spark):
    """One damped round on A->B, A->C, B->C, C->A (hand-computed in
    nano-units, including the floor-division steps); duplicate edges
    and self-loops must not change the result."""
    from docling_serve_spark.operators import webgraph

    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"),
         ("A", "B"),   # duplicate edge: deduped
         ("B", "B")],  # self-loop: dropped
        "src string, dst string",
    )
    got = {r["host"]: r for r in
           webgraph.host_pagerank(edges, iterations=1).collect()}
    # r0 = 10^9 // 3; base = 3*10^9 // 60 = 50_000_000
    # s(A)=333333333 (from C/1), s(B)=166666666 (A/2),
    # s(C)=166666666+333333333=499999999
    assert got["A"]["rank_nano"] == 50_000_000 + (17 * 333333333) // 20
    assert got["B"]["rank_nano"] == 50_000_000 + (17 * 166666666) // 20
    assert got["C"]["rank_nano"] == 50_000_000 + (17 * 499999999) // 20
    assert got["C"]["rank_nano"] > got["A"]["rank_nano"] > got["B"]["rank_nano"]
    assert got["A"]["out_degree"] == 2 and got["C"]["in_degree"] == 2
    # a pure sink (in-edges only) still gets base + damped mass
    sink = spark.createDataFrame(
        [("A", "B")], "src string, dst string"
    )
    got2 = {r["host"]: r for r in
            webgraph.host_pagerank(sink, iterations=2).collect()}
    assert got2["B"]["out_degree"] == 0 and got2["B"]["rank_nano"] > 0


def test_robots_filter_longest_match_semantics(spark):
    """RFC 9309 longest-match: longer allow overrides shorter disallow
    and vice versa; an exact length tie resolves to allow; a host with
    no matching rule (or no rules at all) is allowed."""
    pages = spark.createDataFrame(
        [Row(doc_id=1, url="https://www.s.com/private/x"),
         Row(doc_id=2, url="https://s.com/private/pub/x"),
         Row(doc_id=3, url="http://s.com/open/x"),
         Row(doc_id=4, url="https://s.com/tie/x"),
         Row(doc_id=5, url="https://other.com/private/x"),
         Row(doc_id=6, url="https://s.com/allowed/secret/x")]
    )
    rules = spark.createDataFrame(
        [("s.com", "disallow", "/private/"),
         ("s.com", "allow", "/private/pub/"),
         ("s.com", "allow", "/tie/"),
         ("s.com", "disallow", "/tie/"),           # tie -> allow
         ("s.com", "allow", "/allowed/"),
         ("s.com", "disallow", "/allowed/secret/")],  # longer disallow wins
        "host string, rule string, path_prefix string",
    )
    got = {r["doc_id"]: r for r in
           urltools.robots_filter(pages, rules).collect()}
    assert not got[1]["crawl_allowed"]
    assert got[2]["crawl_allowed"]       # longer allow overrides
    assert got[2]["matched_prefix"] == "/private/pub/"
    assert got[3]["crawl_allowed"] and got[3]["matched_rule"] is None
    assert got[4]["crawl_allowed"]       # tie resolves to allow
    assert got[5]["crawl_allowed"]       # no rules for this host
    assert not got[6]["crawl_allowed"]   # longer disallow wins
    # canonicalization: www./scheme stripped before host keying
    assert got[1]["host"] == "s.com" and got[1]["path"] == "/private/x"


def test_robots_filter_rfc9309_wildcards(spark):
    """§2.2.3: '*' spans any octets, trailing '$' anchors the end,
    regex metacharacters in rules stay literal, and wildcard rules
    compete on raw rule length."""
    pages = spark.createDataFrame(
        [Row(doc_id=1, url="https://s.com/a/download.pdf"),
         Row(doc_id=2, url="https://s.com/a/download.pdf.html"),
         Row(doc_id=3, url="https://s.com/cgi/x/session1"),
         Row(doc_id=4, url="https://s.com/x.y"),
         Row(doc_id=5, url="https://s.com/xAy"),
         Row(doc_id=6, url="https://s.com/cgi/pub/session2")]
    )
    rules = spark.createDataFrame(
        [("s.com", "disallow", "/*.pdf$"),
         ("s.com", "disallow", "/cgi/*session"),
         ("s.com", "allow", "/cgi/pub*session"),   # longer wildcard rule
         ("s.com", "disallow", "/x.y")],
        "host string, rule string, path_prefix string",
    )
    got = {r["doc_id"]: r for r in
           urltools.robots_filter(pages, rules).collect()}
    assert not got[1]["crawl_allowed"]            # $ anchors: .pdf end
    assert got[2]["crawl_allowed"]                # .pdf.html not anchored
    assert not got[3]["crawl_allowed"]            # * spans segments
    assert got[6]["crawl_allowed"]                # longer allow wins
    assert not got[4]["crawl_allowed"]            # '.' literal: /x.y hit
    assert got[5]["crawl_allowed"]                # '.' not a regex dot


# ------------------------------------------------------------------ #
# snapshot_diff
# ------------------------------------------------------------------ #

def test_snapshot_diff_all_four_states(spark):
    old = spark.createDataFrame(
        [("a", "f1"), ("b", "f2"), ("c", "f3")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("b", "f2"), ("c", "f3x"), ("d", "f4")], "url string, fingerprint string"
    )
    got = {r["url"]: r for r in relational.snapshot_diff(old, new).collect()}
    assert got["a"]["status"] == "removed" and got["a"]["new_fp"] is None
    assert got["b"]["status"] == "unchanged"
    assert got["c"]["status"] == "changed" and got["c"]["old_fp"] == "f3"
    assert got["d"]["status"] == "added" and got["d"]["old_fp"] is None
    assert len(got) == 4


# ------------------------------------------------------------------ #
# normalize_corpus
# ------------------------------------------------------------------ #

def test_normalize_corpus_nfc_fold_and_cleanup(spark):
    rows = [
        (1, "Crème  brûlée"),      # NFD -> NFC + collapse
        (2, "\x01\x02hello\tworld\n"),                 # controls + ws
        (3, "École naïve"),                  # already NFC
        (4, "مرحبا"),         # Arabic passthrough
        (5, "  "),                                     # blank -> empty
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in normalize.normalize_corpus(df).collect()}
    assert got[1]["norm_text"] == "Crème brûlée"
    assert got[1]["folded_text"] == "Creme brulee"
    assert got[1]["changed"]
    assert got[2]["norm_text"] == "hello world" and got[2]["changed"]
    assert got[3]["norm_text"] == "École naïve"
    assert got[3]["folded_text"] == "Ecole naive"
    assert not got[3]["changed"]
    assert got[4]["norm_text"] == got[4]["folded_text"] == rows[3][1]
    assert got[5]["norm_text"] == "" and got[5]["changed"]


def test_normalize_corpus_keeps_other_columns_and_fp(spark):
    df = spark.createDataFrame(
        [(1, "en", "à b")], "doc_id bigint, lang string, text string"
    )
    out = normalize.normalize_corpus(df)
    assert set(out.columns) == {
        "doc_id", "lang", "norm_text", "folded_text", "changed", "norm_fp"
    }
    row = out.collect()[0]
    assert row["lang"] == "en" and row["norm_text"] == "à b"
    import hashlib
    assert row["norm_fp"] == hashlib.md5("à b".encode()).hexdigest()


# ------------------------------------------------------------------ #
# split_assign
# ------------------------------------------------------------------ #

def test_split_assign_host_variants_same_split(spark):
    # scheme/www/query/slash variants of one site must agree
    urls = [
        (1, "https://www.Example.com/a"),
        (2, "http://example.com/b?q=1"),
        (3, "HTTPS://EXAMPLE.COM/c/"),
        (4, "http://other.net/x"),
    ]
    df = spark.createDataFrame(urls, "doc_id bigint, url string")
    got = {r["doc_id"]: r for r in sampling.split_assign(df).collect()}
    assert got[1]["host"] == got[2]["host"] == got[3]["host"] == "example.com"
    assert got[1]["split"] == got[2]["split"] == got[3]["split"]
    assert got[1]["split_bucket"] == got[2]["split_bucket"]


def test_split_assign_salt_versions_splits(spark):
    # a different salt is a different (still deterministic) assignment
    df = spark.createDataFrame(
        [(i, f"http://site{i}.com/") for i in range(200)],
        "doc_id bigint, url string",
    )
    a = {r["doc_id"]: r["split"] for r in sampling.split_assign(df, salt="a").collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.split_assign(df, salt="b").collect()}
    a2 = {r["doc_id"]: r["split"] for r in sampling.split_assign(df, salt="a").collect()}
    assert a == a2
    assert a != b
    # boundaries honored: default 5%/5% leaves the bulk in train
    from collections import Counter
    c = Counter(a.values())
    assert c["train"] > c.get("val", 0) and c["train"] > c.get("test", 0)


def test_split_assign_md5_hash48_matches_python(spark):
    import hashlib
    df = spark.createDataFrame([("example.com/split-v1",)], "s string")
    [got] = df.select(sampling.md5_hash48(F.col("s")).alias("h")).collect()
    want = int(hashlib.md5(b"example.com/split-v1").hexdigest()[:12], 16)
    assert got["h"] == want


# ------------------------------------------------------------------ #
# host_top_terms
# ------------------------------------------------------------------ #

def test_host_top_terms_hand_computed(spark):
    import math
    rows = [
        ("a.com", "apple apple banana shared"),
        ("b.com", "banana cherry shared shared"),
    ]
    df = spark.createDataFrame(rows, "host string, text string")
    got = {
        (r["host"], r["term"]): r
        for r in textstats.host_top_terms(df, k=3).collect()
    }
    # a.com: apple tf=2 df=1 -> rank 1; banana tf=1 df=2 vs shared tf=1 df=2
    #   -> tie broken by term asc: banana rank 2, shared rank 3
    a = got[("a.com", "apple")]
    assert (a["tf"], a["df"], a["term_rank"]) == (2, 1, 1)
    assert a["tfidf"] == round(2 * (math.log(3 / 2) + 1), 6)
    assert got[("a.com", "banana")]["term_rank"] == 2
    assert got[("a.com", "shared")]["term_rank"] == 3
    # b.com: shared tf=2 df=2 rank 1 (tf wins over rarity),
    #   cherry tf=1 df=1 rank 2 (rarer than banana), banana rank 3
    assert got[("b.com", "shared")]["term_rank"] == 1
    assert got[("b.com", "cherry")]["term_rank"] == 2
    assert got[("b.com", "banana")]["term_rank"] == 3


def test_host_top_terms_min_len_and_tokenization(spark):
    df = spark.createDataFrame(
        [("h.com", "Foo-BAR! ab foo99bar xyz")], "host string, text string"
    )
    got = {r["term"] for r in textstats.host_top_terms(df, k=10).collect()}
    # 'ab' too short; 'foo99bar' splits into foo/bar; case folded
    assert got == {"foo", "bar", "xyz"}


# ------------------------------------------------------------------ #
# charlm_score
# ------------------------------------------------------------------ #

def test_charlm_score_hand_computed(spark):
    import math
    from docling_serve_spark.operators import langmodel
    # model from "abab": trigrams aba, bab; prefixes ab=1, ba=1; V=2
    ref = spark.createDataFrame([(0, "abab")], "doc_id bigint, text string")
    docs = spark.createDataFrame(
        [(1, "aba"), (2, "abc"), (3, "xyz"), (4, "ab")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in langmodel.charlm_score(docs, ref).collect()}
    # seen trigram: p = (1+1)/(1+2)
    assert got[1]["sum_logprob_micro"] == math.floor(math.log(2 / 3) * 1e6)
    # unseen trigram, seen prefix: p = 1/(1+2)
    assert got[2]["sum_logprob_micro"] == math.floor(math.log(1 / 3) * 1e6)
    # unseen prefix: p = 1/V = 1/2
    assert got[3]["sum_logprob_micro"] == math.floor(math.log(1 / 2) * 1e6)
    assert 4 not in got  # too short to score
    assert got[1]["n_trigrams"] == 1
    assert got[1]["avg_logprob"] == round(got[1]["sum_logprob_micro"] / 1e6, 6)


def test_charlm_score_prefers_in_distribution_text(spark):
    from docling_serve_spark.operators import langmodel
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog and runs on")
         for i in range(5)],
        "doc_id bigint, text string",
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox runs"), (2, "zzqx jjkk wwvv qqpp zz")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["avg_logprob"]
           for r in langmodel.charlm_score(docs, ref).collect()}
    assert got[1] > got[2]  # in-distribution text scores closer to 0


def test_dsir_weights_prefer_target_distribution(spark):
    """DSIR log-ratio: a document sharing the target slice's bigrams
    outweighs one made of background-only bigrams, and n_features
    counts bigram occurrences (len(words)-1 per doc)."""
    from docling_serve_spark.operators import langmodel

    target = "the quick brown fox jumps over the lazy dog"
    rows = [(i, target) for i in range(4)] + [
        (10, "the quick brown fox"),       # in-distribution
        (11, "zz qq ww vv kk jj"),          # background-only
        (12, "purple monkey dishwasher"),   # background-only
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    ref = docs.filter(F.col("doc_id") < 4)
    got = {r["doc_id"]: r for r in langmodel.dsir_weights(docs, ref).collect()}
    assert got[10]["n_features"] == 3  # 4 words -> 3 bigrams
    assert got[10]["avg_weight"] > got[11]["avg_weight"]
    assert got[10]["avg_weight"] > got[12]["avg_weight"]
    # single-word docs have no bigram features and produce no row
    one = spark.createDataFrame(
        [(0, "word")], "doc_id bigint, text string"
    )
    assert langmodel.dsir_weights(one, one).count() == 0


def test_perplexity_buckets_terciles_per_language(spark):
    """CCNet head/middle/tail: per-language tercile sizes follow the
    integer rule (|head| = floor(n/3)), every head score >= every tail
    score within a language, and languages cut independently."""
    from docling_serve_spark.operators import langmodel

    ref = spark.createDataFrame(
        [(i + 100, "the quick brown fox jumps over the lazy dog", "en")
         for i in range(3)],
        "doc_id bigint, text string, lang string",
    )
    rows = [
        # en: 7 docs with varying closeness to the reference
        (1, "the quick brown fox jumps", "en"),
        (2, "the quick brown dog", "en"),
        (3, "quick brown fox over dog", "en"),
        (4, "lazy dog jumps over", "en"),
        (5, "zz qq xx vv kk jj pp", "en"),
        (6, "xqzj wvkp zzzz yyyy", "en"),
        (7, "mmnn oopp qqrr ssdd", "en"),
        # de: 4 docs, cut independently of en
        (8, "the quick brown fox", "de"),
        (9, "quick dog jumps", "de"),
        (10, "zzz xxx yyy www", "de"),
        (11, "qqq kkk jjj ppp", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = langmodel.perplexity_buckets(docs, ref).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    en = by_lang["en"]
    # n=7: head = floor(7/3) = 2, middle = floor(14/3)-2 = 2, tail = 3
    sizes = {b: sum(1 for r in en if r["bucket"] == b)
             for b in ("head", "middle", "tail")}
    assert sizes == {"head": 2, "middle": 2, "tail": 3}
    assert min(
        r["avg_logprob"] for r in en if r["bucket"] == "head"
    ) >= max(r["avg_logprob"] for r in en if r["bucket"] == "tail")
    # n=4: head=1, middle=1, tail=2 — independent of the en cut
    de_sizes = {b: sum(1 for r in by_lang["de"] if r["bucket"] == b)
                for b in ("head", "middle", "tail")}
    assert de_sizes == {"head": 1, "middle": 1, "tail": 2}


# ------------------------------------------------------------------ #
# boilerplate_scrub
# ------------------------------------------------------------------ #

def test_boilerplate_scrub_host_scoped(spark):
    from docling_serve_spark.operators import corpus
    rows = [
        (1, "a.com", "NAV\nbody one\nNAV2"),
        (2, "a.com", "NAV\nbody two\nNAV2"),
        (3, "a.com", "NAV\nbody three\nunique footer"),
        # same NAV line on b.com but it's b.com's ONLY page -> kept
        (4, "b.com", "NAV\nsolo body"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, host string, text string")
    got = {r["doc_id"]: r for r in corpus.boilerplate_scrub(df).collect()}
    # NAV on 3/3 pages of a.com -> dropped; NAV2 on 2/3 (>=50%) -> dropped
    assert got[1]["clean_text"] == "body one"
    assert got[2]["clean_text"] == "body two"
    assert got[3]["clean_text"] == "body three\nunique footer"
    assert (got[1]["n_lines_kept"], got[1]["n_lines_dropped"]) == (1, 2)
    # host-scoped: b.com's single page keeps everything (min_pages=2)
    assert got[4]["clean_text"] == "NAV\nsolo body"
    assert got[4]["n_lines_dropped"] == 0


def test_boilerplate_scrub_fully_boiler_doc_empties(spark):
    from docling_serve_spark.operators import corpus
    df = spark.createDataFrame(
        [(1, "h.com", "SAME"), (2, "h.com", "SAME")],
        "doc_id bigint, host string, text string",
    )
    got = {r["doc_id"]: r for r in corpus.boilerplate_scrub(df).collect()}
    assert got[1]["clean_text"] == "" and got[1]["n_lines_kept"] == 0


def test_boilerplate_scrub_threshold_boundary_exact(spark):
    from docling_serve_spark.operators import corpus
    # line on exactly 2 of 4 pages: 2*10000 >= 5000*4 -> dropped (>=)
    rows = [
        (1, "h.com", "HALF\nu1"), (2, "h.com", "HALF\nu2"),
        (3, "h.com", "u3"), (4, "h.com", "u4"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, host string, text string")
    got = {r["doc_id"]: r for r in corpus.boilerplate_scrub(df).collect()}
    assert got[1]["clean_text"] == "u1" and got[1]["n_lines_dropped"] == 1


def test_charlm_score_max_chars_cap(spark):
    from docling_serve_spark.operators import langmodel
    ref = spark.createDataFrame([(0, "abcdefgh")], "doc_id bigint, text string")
    docs = spark.createDataFrame([(1, "abcdefgh")], "doc_id bigint, text string")
    full = langmodel.charlm_score(docs, ref).collect()[0]
    capped = langmodel.charlm_score(docs, ref, max_chars=5).collect()[0]
    assert full["n_trigrams"] == 6
    assert capped["n_trigrams"] == 3  # only the 5-char prefix scored
    # capped model+doc agree: all prefix trigrams seen -> same per-tri score
    assert capped["sum_logprob_micro"] > full["sum_logprob_micro"] * 3 // 6 - 10**6


# ------------------------------------------------------------------ #
# substring_dup_spans
# ------------------------------------------------------------------ #

def test_substring_dup_spans_hand_computed(spark):
    shared = " ".join(f"s{i}" for i in range(10))   # 10 shared tokens
    a_mid = " ".join(f"a{i}" for i in range(6))
    rows = [
        (1, shared + " " + a_mid + " " + shared),   # spans at both ends
        (2, shared),                                # whole doc duplicated
        (3, " ".join(f"u{i}" for i in range(12))),  # unique -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {}
    for r in dedup.substring_dup_spans(df, w=8).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_no"], r["tok_start"], r["tok_end"], r["n_windows"])
        )
    for v in got.values():
        v.sort()
    # doc 1: 26 tokens; dup windows at pos 1..3 (head) and 17..19 (tail)
    assert got[1] == [(1, 1, 10, 3), (2, 17, 26, 3)]
    # doc 2: windows 1..3 all duplicated -> one span covering all 10
    assert got[2] == [(1, 1, 10, 3)]
    assert 3 not in got


def test_substring_dup_spans_adjacent_windows_merge(spark):
    # two docs share tokens 1..9 only (9 tokens -> windows at pos 1,2)
    shared = " ".join(f"s{i}" for i in range(9))
    df = spark.createDataFrame(
        [(1, shared + " x1 x2"), (2, shared + " y1 y2")],
        "doc_id bigint, text string",
    )
    got = dedup.substring_dup_spans(df, w=8).collect()
    by_doc = {r["doc_id"]: r for r in got}
    assert len(got) == 2  # one merged span per doc, not two
    assert (by_doc[1]["tok_start"], by_doc[1]["tok_end"]) == (1, 9)


def test_substring_dup_spans_short_docs_skipped(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id bigint, text string"
    )
    assert dedup.substring_dup_spans(df, w=8).count() == 0


# ------------------------------------------------------------------ #
# canonical_select
# ------------------------------------------------------------------ #

def test_canonical_select_longest_wins_ties_by_id(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
        "doc_id bigint, component bigint",
    )
    docs = spark.createDataFrame(
        [(1, "short"), (2, "the longest text"), (3, "mid text"),
         (4, "same size"), (5, "Same Size")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in dedup.canonical_select(comps, docs).collect()}
    assert got[2]["is_canonical"] and not got[1]["is_canonical"]
    assert not got[3]["is_canonical"]
    # equal lengths -> smallest doc_id wins
    assert got[4]["is_canonical"] and not got[5]["is_canonical"]
    assert sum(r["is_canonical"] for r in got.values()) == 2


# ------------------------------------------------------------------ #
# frontier_select
# ------------------------------------------------------------------ #

def test_frontier_select_gates_caps_and_priority(spark):
    """Robots-disallowed and `removed` candidates never enter the
    batch; priority = status_weight x (rank_nano + 1) so a changed
    page on an important host outranks an added page on a weak one;
    an unranked host scores weight x 1; the per-host cap truncates;
    the batch cut keeps the global top-N."""
    from docling_serve_spark.operators.frontier import frontier_select

    candidates = spark.createDataFrame(
        [
            ("https://big/p1", "big", "changed", True),    # 3*(1000+1)=3003
            ("https://big/p2", "big", "added", True),      # 4*1001=4004
            ("https://big/p3", "big", "unchanged", True),  # 1001 -> capped out
            ("https://big/p4", "big", "added", False),     # disallowed
            ("https://big/p5", "big", "removed", True),    # removed
            ("https://small/p6", "small", "added", True),  # 4*(10+1)=44
            ("https://never/p7", "never", "added", True),  # 4*(0+1)=4
            ("https://never/p8", "never", "unchanged", True),  # 1 -> batch cut
        ],
        "url string, host string, status string, crawl_allowed boolean",
    )
    ranks = spark.createDataFrame(
        [("big", 1000), ("small", 10)], "host string, rank_nano bigint"
    )
    rows = frontier_select(candidates, ranks, batch_size=4, per_host_cap=2)
    got = {r["url"]: r for r in rows.collect()}
    assert set(got) == {"https://big/p2", "https://big/p1",
                        "https://small/p6", "https://never/p7"}
    assert got["https://big/p2"]["priority_nano"] == 4004
    assert got["https://big/p2"]["rank"] == 1
    assert got["https://big/p1"]["priority_nano"] == 3003
    assert got["https://small/p6"]["priority_nano"] == 44
    assert got["https://never/p7"]["priority_nano"] == 4
    assert got["https://never/p7"]["rank"] == 4
    assert got["https://big/p1"]["host_pos"] == 2


# ------------------------------------------------------------------ #
# page_meta
# ------------------------------------------------------------------ #

def test_extract_page_meta_orders_junk_and_empties(spark):
    """Both attribute orders parse; missing fields come back as empty
    strings (never null); binary junk html yields the empty row, not
    a task failure; whitespace collapses; noindex is case-folded."""
    from docling_serve_spark.operators.pagemeta import extract_page_meta

    rows_in = [
        ("u1", b'<head><title>A  Fine\n Page </title>'
               b'<meta content="the desc" name="description">'
               b'<link href="https://c/x" rel="canonical">'
               b'<META CONTENT="NoIndex" NAME="robots">'
               b'</head><h1>a</h1><h1 class="x">b</h1>'),
        ("u2", b"<html><body>no head fields</body></html>"),
        ("u3", b"\x00\xff\xfe garbage \x80 bytes"),
    ]
    pages = spark.createDataFrame(
        [(u, bytearray(h)) for u, h in rows_in], "url string, html binary"
    )
    got = {r["url"]: r for r in extract_page_meta(pages).collect()}
    r1 = got["u1"]
    assert r1["title"] == "A Fine Page"
    assert r1["meta_description"] == "the desc"
    assert r1["canonical"] == "https://c/x"
    assert r1["noindex"] is True
    assert r1["n_h1"] == 2
    for u in ("u2", "u3"):
        r = got[u]
        assert r["title"] == "" and r["meta_description"] == ""
        assert r["canonical"] == "" and r["noindex"] is False
        assert r["n_h1"] == 0


def test_extract_page_meta_unquoted_attribute_values(spark):
    """HTML5-legal unquoted attribute values parse in both orders; an
    unquoted value stops at whitespace/'>'; quoted values keep
    priority (a double-quoted value with spaces is never re-captured
    by the unquoted pattern); a noindex opt-out in unquoted form is
    honored; 'description-like' keys do not false-match."""
    from docling_serve_spark.operators.pagemeta import extract_page_meta

    rows_in = [
        ("u1", b"<head><meta name=description content=short-desc>"
               b"<link rel=canonical href=https://c/unq>"
               b"<meta name=robots content=NOINDEX></head>"),
        ("u2", b"<head><meta content=rev-uq name=description></head>"),
        ("u3", b'<head><meta name=description content="two words">'
               b"</head>"),
        ("u4", b"<head><meta name=description-x content=notme></head>"),
    ]
    pages = spark.createDataFrame(
        [(u, bytearray(h)) for u, h in rows_in], "url string, html binary"
    )
    got = {r["url"]: r for r in extract_page_meta(pages).collect()}
    assert got["u1"]["meta_description"] == "short-desc"
    assert got["u1"]["canonical"] == "https://c/unq"
    assert got["u1"]["noindex"] is True
    assert got["u2"]["meta_description"] == "rev-uq"
    assert got["u3"]["meta_description"] == "two words"
    assert got["u4"]["meta_description"] == ""


# ------------------------------------------------------------------ #
# detect_url_templates
# ------------------------------------------------------------------ #

def test_detect_url_templates_collapse_distinct_and_trap(spark):
    """Digit runs collapse to one template; duplicate urls count once;
    the trap verdict is a distinct-url threshold; depth counts path
    segments; sample_url is the lexicographic min."""
    from docling_serve_spark.operators import urltools

    urls = (
        [f"https://trap.com/cal/2024/{m}/5" for m in range(1, 13)]
        + ["https://trap.com/cal/2024/1/5"]          # dup url: counts once
        + ["https://ok.com/about", "http://www.ok.com/about"]  # canon dup
        + [f"https://ok.com/post/{i}" for i in range(3)]
    )
    pages = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = urltools.detect_url_templates(pages, trap_threshold=10).collect()
    got = {(r["host"], r["path_template"]): r for r in rows}
    cal = got[("trap.com", "/cal/N/N/N")]
    assert cal["n_urls"] == 12 and cal["is_trap"] and cal["depth"] == 4
    assert cal["sample_url"] == "https://trap.com/cal/2024/1/5"
    # http://www. and https:// variants canonicalize to one host, but
    # the raw urls stay distinct
    about = got[("ok.com", "/about")]
    assert about["n_urls"] == 2 and not about["is_trap"]
    assert got[("ok.com", "/post/N")]["n_urls"] == 3
    assert not got[("ok.com", "/post/N")]["is_trap"]


# ------------------------------------------------------------------ #
# detect_mirrors
# ------------------------------------------------------------------ #

def test_detect_mirrors_containment_cap_and_min_shared(spark):
    """Full replica flags; partial overlap below the containment
    threshold reports but does not flag; a small host fully contained
    in a big one flags; single-fp overlaps drop (min_shared); a
    ubiquitous fingerprint past the df-cap creates no pairs."""
    from docling_serve_spark.operators.mirrors import detect_mirrors

    rows = []
    rows += [("a.com", f"f{i}") for i in range(10)]
    rows += [("a-mirror.net", f"f{i}") for i in range(10)]   # full replica
    rows += [("big.org", f"f{i}") for i in range(5)]         # 5 shared
    rows += [("big.org", f"g{i}") for i in range(45)]        # +45 own
    rows += [("tiny.io", "f0"), ("tiny.io", "f1")]           # contained
    rows += [("once.co", "f3"), ("once.co", "z9")]           # 1 shared
    rows += [(f"junk{i}.x", "EMPTY") for i in range(20)]     # df-capped
    rows += [(f"junk{i}.x", "E2") for i in range(20)]
    pages = spark.createDataFrame(rows, "host string, fingerprint string")
    got = {(r["src"], r["dst"]): r
           for r in detect_mirrors(pages, max_hosts_per_fp=16).collect()}
    full = got[("a-mirror.net", "a.com")]
    assert full["n_shared"] == 10 and full["is_mirror"]
    partial = got[("a.com", "big.org")]
    assert partial["n_shared"] == 5 and not partial["is_mirror"]
    contained = got[("a.com", "tiny.io")]
    assert contained["n_shared"] == 2 and contained["is_mirror"]
    assert ("a.com", "once.co") not in got          # min_shared
    assert not any("junk" in s or "junk" in d for s, d in got)  # df-cap
    # big.org<->a-mirror.net and big.org<->tiny.io share via f0-f4 too
    assert got[("a-mirror.net", "big.org")]["n_shared"] == 5
    assert got[("big.org", "tiny.io")]["is_mirror"]


# ------------------------------------------------------------------ #
# reciprocal_link_stats
# ------------------------------------------------------------------ #

def test_reciprocal_link_stats_hand_computed(spark):
    """a<->b mutual pair (100% but out_degree 1: min-degree gate),
    farm f0/f1/f2 fully mutual (is_farm), c with 1 of 3 reciprocated
    (3333 bp), duplicate edges and self-loops ignored."""
    from docling_serve_spark.operators import webgraph

    edges = [("a", "b"), ("b", "a"), ("a", "b"),          # dup edge
             ("f0", "f1"), ("f1", "f0"), ("f0", "f2"), ("f2", "f0"),
             ("f1", "f2"), ("f2", "f1"),
             ("c", "f0"), ("c", "d"), ("c", "e"), ("f0", "c"),
             ("e", "e")]                                   # self-loop
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["host"]: r for r in
           webgraph.reciprocal_link_stats(df).collect()}
    assert got["a"]["out_degree"] == 1 and got["a"]["reciprocal_bp"] == 10000
    assert got["a"]["is_farm"] is False                    # min degree
    for f in ("f0", "f1", "f2"):
        assert got[f]["is_farm"] is True
        assert got[f]["n_reciprocal"] == got[f]["out_degree"]
    assert got["f0"]["out_degree"] == 3                    # f1, f2, c
    c = got["c"]
    assert (c["out_degree"], c["n_reciprocal"], c["reciprocal_bp"]) == (3, 1, 3333)
    assert c["is_farm"] is False
    assert "e" not in got or got["e"]["out_degree"] == 0   # self-loop only



# ------------------------------------------------------------------ #
# mojibake_stats
# ------------------------------------------------------------------ #

def test_mojibake_stats_hand_computed(spark):
    """Each signature class counts independently; the per-10k rate is
    integer floor; empty docs clamp the denominator; clean text
    (including legitimate accented Latin NOT preceded by \u00c3/\u00c2)
    never flags."""
    from docling_serve_spark.operators.normalize import mojibake_stats

    damaged = "caf\u00c3\u00a9 don\u00e2\u20ac\u2122t \u00ef\u00bf\u00bd end"
    clean = "caf\u00e9 r\u00e9sum\u00e9 na\u00efve stra\u00dfe"
    docs = spark.createDataFrame(
        [(1, damaged), (2, clean), (3, ""), (4, "\ufffd")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in mojibake_stats(docs).collect()}
    d = got[1]
    assert (d["n_two_byte"], d["n_three_byte"], d["n_replacement"]) == (1, 1, 1)
    assert d["n_chars"] == len(damaged)
    assert d["mojibake_per_10k"] == 10000 * 3 // len(damaged)
    assert d["is_mojibake"]
    c = got[2]
    assert (c["n_two_byte"], c["n_three_byte"], c["n_replacement"]) == (0, 0, 0)
    assert not c["is_mojibake"]
    assert got[3]["n_chars"] == 0 and not got[3]["is_mojibake"]
    # a bare replacement char in a 1-char doc: rate 10000, flags
    assert got[4]["n_replacement"] == 1 and got[4]["is_mojibake"]


# ------------------------------------------------------------------ #
# resolve_redirects
# ------------------------------------------------------------------ #

def test_resolve_redirects_chains_loops_and_dirty_src(spark):
    """Straight chains resolve with hop counts; a cycle exhausts the
    budget and reports terminated=False; a src with two outgoing hops
    deterministically takes the min target; over-long chains cap."""
    from docling_serve_spark.operators import urltools

    edges = [("a", "b"), ("b", "c"),            # 2-hop chain
             ("x", "y"), ("y", "x"),            # 2-cycle
             ("d", "q"), ("d", "m"),            # dirty: min 'm' wins
             ("l1", "l2"), ("l2", "l3"), ("l3", "l4"), ("l4", "l5")]
    df = spark.createDataFrame(edges, "src_url string, dst_url string")
    got = {r["src_url"]: r for r in
           urltools.resolve_redirects(df, max_hops=3).collect()}
    assert got["a"]["final_url"] == "c" and got["a"]["n_hops"] == 2
    assert got["a"]["terminated"] is True
    assert got["x"]["n_hops"] == 3 and got["x"]["terminated"] is False
    assert got["x"]["final_url"] == "y"         # x->y->x->y: 3 hops
    assert got["d"]["final_url"] == "m" and got["d"]["n_hops"] == 1
    # l1 walks 3 hops to l4, which still has an outgoing hop
    assert got["l1"]["final_url"] == "l4" and got["l1"]["n_hops"] == 3
    assert got["l1"]["terminated"] is False
    assert got["l2"]["final_url"] == "l5" and got["l2"]["terminated"] is True


# ------------------------------------------------------------------ #
# corpus_datasheet
# ------------------------------------------------------------------ #

def test_corpus_datasheet_rollup_grains(spark):
    """One pass yields all three grains; the '<all>' marker rows sum
    their children; empty docs count zero tokens; mean is integer."""
    from docling_serve_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "a b c", "en", "s1"), (2, "d e", "en", "s1"),
         (3, "f", "en", "s2"), (4, "", "de", "s1"),
         (5, "g h i j", "de", "s1")],
        "doc_id bigint, text string, lang string, source string",
    )
    rows = {(r["lang"], r["source"]): r
            for r in textstats.corpus_datasheet(docs).collect()}
    assert rows[("en", "s1")]["n_docs"] == 2
    assert rows[("en", "s1")]["n_tokens"] == 5
    assert rows[("en", "s1")]["mean_tokens"] == 2      # 5 div 2
    assert rows[("en", "<all>")]["n_tokens"] == 6
    assert rows[("de", "<all>")]["n_docs"] == 2
    assert rows[("de", "<all>")]["n_tokens"] == 4      # empty doc = 0
    total = rows[("<all>", "<all>")]
    assert total["n_docs"] == 5 and total["n_tokens"] == 10
    assert len(rows) == 3 + 2 + 1                      # pairs+langs+total


# ------------------------------------------------------------------ #
# parked_page_stats
# ------------------------------------------------------------------ #

def test_parked_page_stats_signals(spark):
    """Registrar phrase flags at any density (case/whitespace
    tolerant); dense link farms flag only past the anchor-count gate;
    articles stay clean; junk bytes yield a clean zero row."""
    from docling_serve_spark.operators.pagemeta import parked_page_stats

    farm = "<body>" + "".join(
        f'<a href="u{k}">sponsored entry {k}</a>' for k in range(6)
    ) + "<p>ad</p></body>"
    tiny_farm = '<body><a href="u">all link text here</a></body>'
    lander = "<body><p>this DOMAIN\n is   for SALE</p>lots of plain " \
             "registrar prose making density low " * 3 + "</body>"
    article = "<body><p>" + "prose word " * 50 + '</p><a href="n">next</a></body>'
    pages = spark.createDataFrame(
        [("farm", bytearray(farm.encode())),
         ("tiny", bytearray(tiny_farm.encode())),
         ("lander", bytearray(lander.encode())),
         ("article", bytearray(article.encode())),
         ("junk", bytearray(b"\xff\xfe\x00garbage"))],
        "url string, html binary",
    )
    got = {r["url"]: r for r in parked_page_stats(pages).collect()}
    assert got["farm"]["is_parked"] and not got["farm"]["has_parked_phrase"]
    assert got["farm"]["n_anchors"] == 6
    # density 10000 but only one anchor: the min-anchor gate holds
    assert got["tiny"]["link_density_bp"] == 10000
    assert not got["tiny"]["is_parked"]
    assert got["lander"]["has_parked_phrase"] and got["lander"]["is_parked"]
    assert not got["article"]["is_parked"]
    assert got["article"]["link_density_bp"] < 2000
    j = got["junk"]
    assert not j["is_parked"] and j["n_anchors"] == 0


# ------------------------------------------------------------------ #
# extract_hreflang
# ------------------------------------------------------------------ #

def test_extract_hreflang_orders_dupes_and_drops(spark):
    """Attribute order never matters; hreflang lowercases; duplicate
    declarations collapse; stylesheet/rss links and hreflang-less or
    href-less alternates drop; junk bytes yield nothing."""
    from docling_serve_spark.operators.pagemeta import extract_hreflang

    html = (
        b'<link rel="alternate" hreflang="EN" href="https://e/en">'
        b'<link href="https://e/de" hreflang="de" rel="alternate">'
        b'<link rel="alternate" hreflang="en" href="https://e/en">'
        b'<link rel="alternate" hreflang="fr">'
        b'<link rel="alternate" href="https://e/feed">'
        b'<link rel="stylesheet" href="https://e/s.css">'
    )
    pages = spark.createDataFrame(
        [("p", bytearray(html)), ("junk", bytearray(b"\x00\xff<link"))],
        "url string, html binary",
    )
    got = sorted((r["src_url"], r["hreflang"], r["alt_url"])
                 for r in extract_hreflang(pages).collect())
    assert got == [("p", "de", "https://e/de"), ("p", "en", "https://e/en")]


# ------------------------------------------------------------------ #
# schedule_fetches
# ------------------------------------------------------------------ #

def test_schedule_fetches_politeness_invariants(spark):
    """All of a host's urls land on one fetcher; per-host spacing uses
    the override delay when present, the default otherwise; sequence
    follows (priority desc, url) order."""
    from docling_serve_spark.operators.frontier import schedule_fetches

    batch = spark.createDataFrame(
        [("u1", "slow.com", 900), ("u2", "slow.com", 500),
         ("u3", "slow.com", 500),                 # tie -> url order
         ("u4", "fast.org", 100)],
        "url string, host string, priority_nano bigint",
    )
    delays = spark.createDataFrame([("slow.com", 7000)],
                                   "host string, delay_ms bigint")
    rows = schedule_fetches(batch, n_fetchers=4, delays=delays).collect()
    got = {r["url"]: r for r in rows}
    assert [got[u]["fetch_seq"] for u in ("u1", "u2", "u3")] == [0, 1, 2]
    assert got["u3"]["fetch_at_ms"] == 2 * 7000
    assert got["u4"]["fetch_at_ms"] == 0
    fetchers = {r["host"]: set() for r in rows}
    for r in rows:
        fetchers[r["host"]].add(r["fetcher"])
    assert all(len(v) == 1 for v in fetchers.values())
    assert all(0 <= r["fetcher"] < 4 for r in rows)


# ------------------------------------------------------------------ #
# line_repetition (Gopher dup line / paragraph fractions)
# ------------------------------------------------------------------ #

def test_line_repetition_hand_computed(spark):
    """Duplicated lines count ALL their occurrences (Dolma
    convention); paragraph split is a blank line; char denominators
    exclude the separators; a clean doc reports zeros."""
    from docling_serve_spark.operators.textstats import line_repetition

    # doc 1: lines = [aa, bb, aa, '', cc] -> dup 'aa' cnt 2 of 5 lines
    #        paras = ['aa\nbb\naa', 'cc'] -> no dup para
    rep = "aa\nbb\naa\n\ncc"
    # doc 2: paras = [xx, xx, yy] -> dup para 2 of 3; lines include
    #        two blank separators (dup) plus xx twice
    para_rep = "xx\n\nxx\n\nyy"
    clean = "one\ntwo\n\nthree"
    docs = spark.createDataFrame(
        [(1, rep), (2, para_rep), (3, clean)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in line_repetition(docs).collect()}

    d = got[1]
    assert (d["n_lines"], d["n_paras"]) == (5, 2)
    assert d["dup_line_frac_bp"] == 10000 * 2 // 5       # 'aa' twice
    assert d["dup_line_char_frac_bp"] == 10000 * 4 // 8  # 4 of 8 chars
    assert d["dup_para_frac_bp"] == 0
    assert d["is_repetitive"]                            # 4000 > 3000

    p = got[2]
    # lines = [xx, '', xx, '', yy]: xx twice + '' twice -> 4 of 5
    assert (p["n_lines"], p["n_paras"]) == (5, 3)
    assert p["dup_line_frac_bp"] == 10000 * 4 // 5
    assert p["dup_para_frac_bp"] == 10000 * 2 // 3
    assert p["dup_para_char_frac_bp"] == 10000 * 4 // 6
    assert p["is_repetitive"]

    c = got[3]
    assert (c["n_lines"], c["n_paras"]) == (4, 2)
    assert c["dup_line_frac_bp"] == 0 and c["dup_para_frac_bp"] == 0
    assert not c["is_repetitive"]


# ------------------------------------------------------------------ #
# surt_key / cdx_index
# ------------------------------------------------------------------ #

def test_surt_key_hand_computed(spark):
    """SURT rules: host reversed + comma-joined, www./default-port
    strip, query sorted, fragment dropped, bare host gets '/'; a
    non-default port survives."""
    from pyspark.sql import functions as F
    from docling_serve_spark.operators.urltools import surt_key

    cases = [
        ("https://WWW.news.Example.com:443/A/b?b=2&a=1#x",
         "com,example,news)/a/b?a=1&b=2"),
        ("http://example.com", "com,example)/"),
        ("https://example.com:8080/p", "com,example:8080)/p"),
        ("http://a.b.c/x?z=1", "c,b,a)/x?z=1"),
        ("https://example.com/?", "com,example)/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(surt_key(F.col("url"))).collect()]
    assert got == [want for _, want in cases]


def test_cdx_index_digest_and_length(spark):
    """Digest is SHA-256 of the payload BYTES and length its octet
    count — multi-byte payloads must not be counted in chars."""
    import hashlib
    from docling_serve_spark.operators.urltools import cdx_index

    payload = "arabic محرك".encode("utf-8")
    df = spark.createDataFrame(
        [("https://e.com/p", "2024-01-02 03:04:05", payload)],
        "url string, ts string, html binary",
    ).selectExpr("url", "CAST(ts AS TIMESTAMP) AS warc_ts", "html")
    r = cdx_index(df).collect()[0]
    assert r["urlkey"] == "com,e)/p"
    assert r["ts14"] == "20240102030405"
    assert r["digest"] == hashlib.sha256(payload).hexdigest()
    assert r["length"] == len(payload)
    assert r["mime"] == "text/html"
    assert r["status"] == 200


# ------------------------------------------------------------------ #
# sitemap_urls / revisit_stats
# ------------------------------------------------------------------ #

def test_sitemap_urls_hand_computed(spark):
    """<loc> entries trim their padding; non-sitemap pages emit
    nothing; a sitemapindex root also counts; already_crawled comes
    from the page url set; a url in two sitemaps counts both."""
    from docling_serve_spark.operators.urltools import sitemap_urls

    sm1 = (b'<?xml version="1.0"?><urlset xmlns="x">'
           b"<url><loc> https://e.com/a </loc></url>"
           b"<url><loc>https://e.com/new</loc></url></urlset>")
    sm2 = (b'<sitemapindex xmlns="x">'
           b"<sitemap><loc>https://e.com/new</loc></sitemap>"
           b"</sitemapindex>")
    page = b"<html><body>href loc nothing</body></html>"
    pages = spark.createDataFrame(
        [("https://e.com/a", page), ("https://e.com/sm1", sm1),
         ("https://e.com/sm2", sm2)],
        "url string, html binary",
    )
    got = {r["loc_url"]: r for r in sitemap_urls(pages).collect()}
    assert set(got) == {"https://e.com/a", "https://e.com/new"}
    a = got["https://e.com/a"]
    assert a["n_sitemaps"] == 1 and a["already_crawled"]
    n = got["https://e.com/new"]
    assert n["n_sitemaps"] == 2 and not n["already_crawled"]


def test_revisit_stats_hand_computed(spark):
    """3 captures over 2 payloads -> 1 revisit at 3333 bp; an
    all-unique key reports zero; first_ts is the earliest capture."""
    from docling_serve_spark.operators.urltools import revisit_stats

    rows = [
        ("k1", "20240101000000", "d1"),
        ("k1", "20240201000000", "d1"),
        ("k1", "20240301000000", "d2"),
        ("k2", "20240105000000", "da"),
        ("k2", "20240106000000", "db"),
    ]
    caps = spark.createDataFrame(rows, "urlkey string, ts14 string, digest string")
    got = {r["urlkey"]: r for r in revisit_stats(caps).collect()}
    k1 = got["k1"]
    assert (k1["n_captures"], k1["n_unique"], k1["n_revisits"]) == (3, 2, 1)
    assert k1["revisit_rate_bp"] == 10000 * 1 // 3
    assert k1["first_ts"] == "20240101000000"
    k2 = got["k2"]
    assert k2["n_revisits"] == 0 and k2["revisit_rate_bp"] == 0


# ------------------------------------------------------------------ #
# c4_clean (C4 line-level cleaning pass)
# ------------------------------------------------------------------ #

def test_c4_clean_hand_computed(spark):
    """Every C4 rule on a hand-built page: terminal-punctuation and
    5-word line gates, javascript/policy drops, lorem-ipsum / brace /
    bad-word page flags, and the 3-sentence page gate on CLEANED
    text."""
    from docling_serve_spark.operators.corpus import c4_clean

    good = "this is a perfectly fine sentence with many words."
    page1 = "\n".join([
        good,
        "short line.",                                   # <5 words
        "no terminal punctuation here at all",           # no punct
        "please enable javascript to view this page.",   # js
        "we updated our privacy policy as of today.",    # policy
        'he said "five words or more suffice."',         # kept (quote end)
        "another quite acceptable closing sentence here.",  # kept
    ])
    page2 = good + "\nlorem ipsum dolor sit amet etc etc."      # flag
    page3 = good + "\nvar x = { nested: 1 };"                   # brace
    page4 = good + "\nthis mentions darnheck and stops there."  # bad word
    docs = spark.createDataFrame(
        [(1, page1), (2, page2), (3, page3), (4, page4)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in
           c4_clean(docs, bad_words=("darnheck",)).collect()}

    p1 = got[1]
    assert p1["n_lines_kept"] == 3 and p1["n_lines_dropped"] == 4
    assert p1["clean_text"].splitlines() == [
        good,
        'he said "five words or more suffice."',
        "another quite acceptable closing sentence here.",
    ]
    assert p1["n_sentences"] == 3 and p1["keep_page"]

    assert got[2]["has_lorem_ipsum"] and not got[2]["keep_page"]
    assert got[3]["has_brace"] and not got[3]["keep_page"]
    assert got[4]["has_bad_word"] and not got[4]["keep_page"]
    # page 4's bad-word line ends in '.' so it is KEPT as a line —
    # the bad-word rule is a page-level drop, exactly as in C4
    assert got[4]["n_lines_kept"] == 2


# ------------------------------------------------------------------ #
# gopher_quality (document-shape rules)
# ------------------------------------------------------------------ #

def test_gopher_quality_hand_computed(spark):
    """One violation per rule, in the table's precedence order; a
    plain prose doc keeps."""
    from docling_serve_spark.operators.textstats import gopher_quality

    prose = ("the quick brown fox jumps over the lazy dog and that "
             "sentence has to be long enough with plenty of ordinary "
             "words to clear the fifty word floor so we simply keep "
             "adding more text until the counter is comfortably past "
             "it with room to spare for everyone involved here today")
    bullets = "• one two three four five six\n" * 12
    hashy = "# wording thereof andsuch " * 25
    numeric = "12345 67890 999 the of " * 25
    nostop = "zebra quokka wombat numbat dingo " * 12
    docs = spark.createDataFrame(
        [(1, prose), (2, "too short"), (3, bullets), (4, hashy),
         (5, numeric), (6, nostop), (7, "")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert got[1]["keep"] and got[1]["reason"] == "keep"
    assert got[1]["n_words"] == len(prose.split())
    assert got[2]["reason"] == "word_count"
    assert got[3]["reason"] == "bullet_lines"
    assert got[4]["reason"] == "symbol_ratio"
    assert got[5]["reason"] == "alpha_words"
    assert got[6]["reason"] == "stop_words"
    assert got[7]["reason"] == "word_count" and got[7]["n_words"] == 0


# ------------------------------------------------------------------ #
# temporal_split (time-based split, host quarantine)
# ------------------------------------------------------------------ #

def test_temporal_split_hand_computed(spark):
    """A host wholly before the cutoff is train, wholly after is
    eval, straddling is quarantined from BOTH sides; a capture AT
    the cutoff counts as after (>= boundary)."""
    from docling_serve_spark.operators.sampling import temporal_split

    rows = [
        ("https://old.example/a", "2024-01-01 00:00:00"),
        ("https://old.example/b", "2024-03-31 23:59:59"),
        ("https://new.example/a", "2024-04-01 00:00:00"),   # boundary
        ("https://new.example/b", "2024-06-01 00:00:00"),
        ("https://span.example/a", "2024-02-01 00:00:00"),
        ("https://span.example/b", "2024-05-01 00:00:00"),
    ]
    pages = spark.createDataFrame(rows, "url string, ts string").selectExpr(
        "url", "CAST(ts AS TIMESTAMP) AS warc_ts"
    )
    got = {r["url"]: r for r in
           temporal_split(pages, "2024-04-01 00:00:00").collect()}
    assert got["https://old.example/a"]["split"] == "train"
    assert got["https://old.example/b"]["split"] == "train"
    assert got["https://new.example/a"]["split"] == "eval"
    assert got["https://new.example/b"]["split"] == "eval"
    for u in ("https://span.example/a", "https://span.example/b"):
        assert got[u]["host_split"] == "spanning"
        assert got[u]["split"] == "quarantine"


# ------------------------------------------------------------------ #
# bitext_align_scores
# ------------------------------------------------------------------ #

def test_bitext_align_scores_hand_computed(spark):
    """Shared numerals score full Jaccard, disjoint score 0, a 2x+
    length gap breaks the band, and numeral-free pairs pass the
    numeral test vacuously."""
    from docling_serve_spark.operators.bitext import bitext_align_scores

    rows = [
        ("p1", "meeting on 2024-03-15 room 42 confirmed ok",
               "réunion le 15 03 2024 salle 42 confirmée oui"),
        ("p2", "totals were 17 and 99 this year",
               "les totaux étaient 12 et 34 cette année"),
        ("p3", "a" * 100 + " 7", "b" * 30 + " 7"),
        ("p4", "no digits here at all", "aucun chiffre ici du tout"),
    ]
    pairs = spark.createDataFrame(
        rows, "pid string, text_a string, text_b string"
    )
    got = {r["pid"]: r for r in bitext_align_scores(pairs).collect()}
    assert got["p1"]["num_jaccard_bp"] == 10000   # {2024,03,15,42} both
    assert got["p1"]["plausible"]
    assert got["p2"]["num_jaccard_bp"] == 0 and not got["p2"]["plausible"]
    assert not got["p3"]["len_ok"] and not got["p3"]["plausible"]
    assert got["p4"]["num_jaccard_bp"] == 10000   # vacuous
    assert got["p4"]["plausible"]
    assert got["p4"]["n_nums_a"] == 0


# ------------------------------------------------------------------ #
# shard_manifest
# ------------------------------------------------------------------ #

def test_shard_manifest_hand_computed(spark):
    """Counts/envelope per shard; the fingerprint is order-
    independent (same rows shuffled -> same fp) and changes when a
    doc is dropped (the integrity role)."""
    from docling_serve_spark.operators.sampling import shard_manifest

    rows = [
        (0, 0, 100, 0, 0), (2, 0, 50, 0, 100), (4, 0, 30, 1, 22),
        (1, 1, 10, 0, 0),
    ]
    schema = "doc_id bigint, shard bigint, n_tokens bigint, " \
             "bin_id bigint, offset_in_bin bigint"
    packed = spark.createDataFrame(rows, schema)
    got = {r["shard"]: r for r in shard_manifest(packed).collect()}
    s0 = got[0]
    assert (s0["n_docs"], s0["n_tokens"], s0["n_bins"]) == (3, 180, 2)
    assert (s0["min_doc_id"], s0["max_doc_id"]) == (0, 4)

    shuffled = spark.createDataFrame(list(reversed(rows)), schema)
    got2 = {r["shard"]: r for r in shard_manifest(shuffled).collect()}
    assert got2[0]["fingerprint"] == s0["fingerprint"]

    dropped = spark.createDataFrame(rows[1:], schema)
    got3 = {r["shard"]: r for r in shard_manifest(dropped).collect()}
    assert got3[0]["fingerprint"] != s0["fingerprint"]


# ------------------------------------------------------------------ #
# lang_mismatch (declared-vs-detected audit)
# ------------------------------------------------------------------ #

def test_lang_mismatch_hand_computed(spark):
    """Confident disagreement counts, undetectable docs inflate
    neither side, Arabic-range detection overrides stopwords."""
    from docling_serve_spark.operators.textstats import lang_mismatch

    rows = [
        ("en", "the cat and the dog of the house"),      # en == en
        ("fr", "the cat and the dog of the house"),      # en != fr
        ("fr", "le chat et la maison des gens"),         # fr == fr
        ("de", "zzz qqq xxx"),                           # undetectable
        ("en", "محرك البحث عن المستندات الكبيرة جدا"),   # ar != en
    ]
    docs = spark.createDataFrame(rows, "lang string, text string")
    got = {r["lang"]: r for r in lang_mismatch(docs).collect()}
    en = got["en"]
    assert (en["n_docs"], en["n_detectable"], en["n_mismatch"]) == (2, 2, 1)
    assert en["mismatch_bp"] == 5000
    fr = got["fr"]
    assert (fr["n_detectable"], fr["n_mismatch"]) == (2, 1)
    de = got["de"]
    assert (de["n_detectable"], de["n_mismatch"]) == (0, 0)
    assert de["mismatch_bp"] == 0


# ------------------------------------------------------------------ #
# robots_sitemaps / dup_cluster_stats
# ------------------------------------------------------------------ #

def test_robots_sitemaps_hand_computed(spark):
    """Case-insensitive key, leading whitespace, duplicates collapse,
    'sitemap' mentioned mid-line does NOT match (anchored ^)."""
    from docling_serve_spark.operators.urltools import robots_sitemaps

    body = ("User-agent: *\nDisallow: /x\n"
            "Sitemap: https://a.com/s1.xml\n"
            "  SITEMAP: https://a.com/s2.xml\n"
            "sitemap: https://a.com/s1.xml\n"
            "# our sitemap: https://a.com/not-this.xml is documented\n")
    r = spark.createDataFrame(
        [("a.com", body), ("b.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    got = {(x["host"], x["sitemap_url"]) for x in robots_sitemaps(r).collect()}
    assert got == {("a.com", "https://a.com/s1.xml"),
                   ("a.com", "https://a.com/s2.xml")}


def test_dup_cluster_stats_hand_computed(spark):
    """Histogram over component sizes; n_removable = size-1 per
    cluster."""
    from docling_serve_spark.operators.dedup import dup_cluster_stats

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20)],
        "doc_id bigint, component bigint",
    )
    got = {r["cluster_size"]: r for r in dup_cluster_stats(comps).collect()}
    assert got[3]["n_clusters"] == 1 and got[3]["n_removable"] == 2
    assert got[2]["n_clusters"] == 2
    assert got[2]["n_docs"] == 4 and got[2]["n_removable"] == 2


# ------------------------------------------------------------------ #
# chunk_documents (retrieval windows with overlap)
# ------------------------------------------------------------------ #

def test_chunk_documents_hand_computed(spark):
    """Window/overlap arithmetic: exact coverage with no pure-overlap
    final window; short docs yield one chunk; empty docs none;
    adjacent chunks share exactly `overlap` tokens."""
    from docling_serve_spark.operators.sampling import chunk_documents

    words = [f"w{i}" for i in range(100)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b c"), (3, "")],
        "doc_id bigint, text string",
    )
    out = chunk_documents(docs, chunk_tokens=64, overlap=16)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # n=100, chunk=64, stride=48 -> 2 windows: [0:64], [48:100]
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1)}
    c0, c1 = rows[(1, 0)], rows[(1, 1)]
    assert c0["n_chunk_tokens"] == 64 and c1["n_chunk_tokens"] == 52
    assert c0["chunk_text"].split()[:2] == ["w0", "w1"]
    assert c1["chunk_text"].split()[0] == "w48"
    assert c1["chunk_text"].split()[-1] == "w99"
    # overlap: last 16 of c0 == first 16 of c1
    assert c0["chunk_text"].split()[-16:] == c1["chunk_text"].split()[:16]
    assert rows[(2, 0)]["n_chunk_tokens"] == 3
    assert not [k for k in rows if k[0] == 3]
    # exactly-covered boundary: n = chunk + stride emits 2, not 3
    docs2 = spark.createDataFrame(
        [(9, " ".join(f"x{i}" for i in range(112)))],
        "doc_id bigint, text string",
    )
    out2 = chunk_documents(docs2, chunk_tokens=64, overlap=16).collect()
    assert len(out2) == 2


# ------------------------------------------------------------------ #
# vocab_topk (tokenizer word table)
# ------------------------------------------------------------------ #

def test_vocab_topk_hand_computed(spark):
    """Counts, doc frequencies, min_count cut, and the deterministic
    (count desc, word asc) tie-break."""
    from docling_serve_spark.operators.textstats import vocab_topk

    docs = spark.createDataFrame(
        [(1, "apple banana apple cherry"),
         (2, "banana apple banana"),
         (3, "cherry date")],
        "doc_id bigint, text string",
    )
    rows = vocab_topk(docs, k=3, min_count=2).collect()
    assert [(r["rank"], r["word"], r["n_occurrences"], r["n_docs"])
            for r in rows] == [
        (1, "apple", 3, 2),      # tie 3-3 broken by word asc
        (2, "banana", 3, 2),
        (3, "cherry", 2, 2),
    ]                            # 'date' cut by min_count


# ------------------------------------------------------------------ #
# robots_crawl_delays
# ------------------------------------------------------------------ #

def test_robots_crawl_delays_hand_computed(spark):
    """Decimal seconds parse to exact ms without floats, several
    directives take the max, hostile values cap, delay-less hosts
    are absent; composes into schedule_fetches as the delays table."""
    from docling_serve_spark.operators.urltools import robots_crawl_delays

    rows = [
        ("a.com", "User-agent: *\nCrawl-delay: 2\n"
                  "User-agent: x\ncrawl-delay: 0.5\n"),
        ("b.com", "User-agent: *\nCrawl-delay: 1.25\n"),
        ("c.com", "User-agent: *\nCRAWL-DELAY: 86400\n"),
        ("d.com", "User-agent: *\nDisallow: /\n"),
        ("e.com", "User-agent: *\ncrawl-delay: 0.5399\n"),
    ]
    r = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {x["host"]: x["delay_ms"]
           for x in robots_crawl_delays(r).collect()}
    assert got == {"a.com": 2000, "b.com": 1250,
                   "c.com": 60000, "e.com": 539}


def test_sitemap_urls_decodes_xml_entities(spark):
    """Query-param URLs arrive as &amp;-escaped in sitemap XML; the
    decoded URL must match the crawled set."""
    from docling_serve_spark.operators.urltools import sitemap_urls

    sm = (b'<urlset xmlns="x"><url>'
          b"<loc>https://e.com/p?a=1&amp;b=2</loc></url></urlset>")
    pages = spark.createDataFrame(
        [("https://e.com/p?a=1&b=2", b"<html>x</html>"),
         ("https://e.com/sm", sm)],
        "url string, html binary",
    )
    got = {r["loc_url"]: r for r in sitemap_urls(pages).collect()}
    assert set(got) == {"https://e.com/p?a=1&b=2"}
    assert got["https://e.com/p?a=1&b=2"]["already_crawled"]


# ------------------------------------------------------------------ #
# collocations (phrase mining)
# ------------------------------------------------------------------ #

def test_collocations_hand_computed(spark):
    """The discounted phrase score promotes a fixed pair over a
    frequent-but-independent pair; sub-min_count pairs are cut."""
    from docling_serve_spark.operators.textstats import collocations

    # 'new york' always adjacent (6x); 'the cat' adjacent 6x but both
    # words frequent elsewhere
    doc = ("new york " * 6 + "the cat " * 6
           + "the dog the bird the fish cat dog bird fish ")
    docs = spark.createDataFrame([(1, doc)], "doc_id bigint, text string")
    rows = collocations(docs, k=10, min_count=5, delta=2).collect()
    got = {r["bigram"]: r for r in rows}
    assert "new york" in got
    ny, tc = got["new york"], got.get("the cat")
    assert ny["n_bigram"] == 6 and ny["n_first"] == 6 and ny["n_second"] == 6
    n_total = len(doc.split())
    assert ny["score_bp"] == (10000 * (6 - 2) * n_total) // (6 * 6)
    assert rows[0]["bigram"] == "new york" and rows[0]["rank"] == 1
    if tc is not None:    # 'the'x9, 'cat'x7 -> much lower score
        assert tc["score_bp"] < ny["score_bp"]


# ------------------------------------------------------------------ #
# source_scorecard
# ------------------------------------------------------------------ #

def test_source_scorecard_hand_computed(spark):
    """Within-source dup counting (same fp in ANOTHER source doesn't
    count), keep rate from the verdicts join, bigint-div rates."""
    from docling_serve_spark.operators.corpus import source_scorecard

    docs = spark.createDataFrame(
        [(1, "same body text here", "a"),
         (2, "same body text here", "a"),      # dup within a
         (3, "unique text one two", "a"),
         (4, "same body text here", "b"),      # same fp, other source
         (5, "other vendor content", "b")],
        "doc_id bigint, text string, source string",
    )
    verdicts = spark.createDataFrame(
        [(1, True), (2, True), (3, False), (4, True), (5, True)],
        "doc_id bigint, keep boolean",
    )
    got = {r["source"]: r for r in
           source_scorecard(docs, verdicts).collect()}
    a = got["a"]
    assert (a["n_docs"], a["n_dup_docs"], a["n_keep"]) == (3, 2, 2)
    assert a["dup_rate_bp"] == 10000 * 2 // 3
    assert a["keep_rate_bp"] == 10000 * 2 // 3
    b = got["b"]
    assert b["n_dup_docs"] == 0 and b["keep_rate_bp"] == 10000


# ------------------------------------------------------------------ #
# host_health
# ------------------------------------------------------------------ #

def test_host_health_hand_computed(spark):
    """Rollup of the real X44/X51 extractors per host: noindex and
    parked rates in bp, mean h1 as an integer centi-count."""
    from docling_serve_spark.operators.pagemeta import host_health

    def page(url, noindex=False, parked=False, h1=0):
        html = ("<html><head><title>t</title>"
                + ('<meta name="robots" content="noindex">' if noindex else "")
                + "</head><body>" + "<h1>H</h1>" * h1
                + ("<p>this domain is for sale</p>" if parked
                   else "<p>regular body content</p>")
                + "</body></html>")
        return (url, bytearray(html.encode()))

    pages = spark.createDataFrame(
        [page("https://a.com/1", noindex=True, h1=2),
         page("https://a.com/2", parked=True, h1=1),
         page("https://a.com/3"),
         page("https://b.com/1")],
        "url string, html binary",
    )
    got = {r["host"]: r for r in host_health(pages).collect()}
    a = got["a.com"]
    assert (a["n_pages"], a["n_noindex"], a["n_parked"]) == (3, 1, 1)
    assert a["noindex_bp"] == 10000 // 3 and a["parked_bp"] == 10000 // 3
    assert a["mean_h1_x100"] == 100 * 3 // 3
    b = got["b.com"]
    assert b["noindex_bp"] == 0 and b["parked_bp"] == 0


# ------------------------------------------------------------------ #
# title_dup_candidates
# ------------------------------------------------------------------ #

def test_title_dup_candidates_hand_computed(spark):
    """Normalized (case/whitespace-folded) titles cluster; empty and
    missing titles never do; rep_url is the lexicographic min."""
    from docling_serve_spark.operators.pagemeta import title_dup_candidates

    def page(url, title_html):
        return (url, bytearray(
            f"<html><head>{title_html}</head><body>x</body></html>".encode()
        ))

    pages = spark.createDataFrame(
        [page("https://e.com/a", "<title>Hello  World</title>"),
         page("https://e.com/b", "<title>hello world</title>"),
         page("https://e.com/c", "<title>Other</title>"),
         page("https://e.com/d", "<title></title>"),
         page("https://e.com/e", "")],
        "url string, html binary",
    )
    got = {r["url"]: r for r in title_dup_candidates(pages).collect()}
    a, b = got["https://e.com/a"], got["https://e.com/b"]
    assert a["title_fp"] == b["title_fp"]          # case/ws-folded
    assert a["is_candidate"] and b["is_candidate"]
    assert a["group_size"] == 2
    assert a["rep_url"] == "https://e.com/a"
    assert not got["https://e.com/c"]["is_candidate"]
    for u in ("https://e.com/d", "https://e.com/e"):
        assert got[u]["group_size"] == 0 and not got[u]["is_candidate"]


def test_trustrank_seed_decay_and_spam_blindness(spark):
    """TrustRank property (Gyöngyi et al. 2004): trust flows only from
    the seed set — a high-in-degree host unreachable from the seeds
    gets ZERO trust (where PageRank would reward it). One damped round
    hand-computed in nano-units."""
    from docling_serve_spark.operators import webgraph

    edges = spark.createDataFrame(
        [("S", "A"), ("A", "B"),
         ("X", "P"), ("Y", "P"), ("Z", "P")],  # spam cluster, seed-unreachable
        "src string, dst string",
    )
    got = {r["host"]: r for r in
           webgraph.trustrank(edges, seeds=["S"], iterations=1).collect()}
    # r0: S=10^9, rest 0. Round 1: seed base = 3*10^9 // 20 = 150e6;
    # A receives floor(17 * 10^9 / 20); everything else 0.
    assert got["S"]["trust_nano"] == 150_000_000 and got["S"]["is_seed"]
    assert got["A"]["trust_nano"] == 850_000_000
    assert got["B"]["trust_nano"] == 0
    assert got["P"]["trust_nano"] == 0 and not got["P"]["is_seed"]
    # PageRank, blind to seeds, ranks the spam target highest
    pr = {r["host"]: r["rank_nano"] for r in
          webgraph.host_pagerank(edges, iterations=1).collect()}
    assert pr["P"] == max(pr.values())
    # trust keeps decaying with distance once it propagates
    got3 = {r["host"]: r["trust_nano"] for r in
            webgraph.trustrank(edges, seeds=["S"], iterations=3).collect()}
    assert got3["S"] > 0 and got3["A"] > got3["B"] > 0
    assert got3["P"] == 0


def test_hits_hand_computed_hub_authority_split(spark):
    """HITS property (Kleinberg 1999): a pure directory page that only
    points at well-cited targets is a top HUB with zero authority; the
    targets are top AUTHORITIES with zero hub score. One iteration
    hand-computed in max-normalized nano-units."""
    from docling_serve_spark.operators import webgraph

    # D is a directory linking both authorities; C cites only one.
    edges = spark.createDataFrame(
        [("D", "A1"), ("D", "A2"), ("C", "A1")],
        "src string, dst string",
    )
    got = {r["host"]: r for r in
           webgraph.hits(edges, iterations=1).collect()}
    # a0 = 1e9 each. h_raw: D=2e9, C=1e9 -> max 2e9 -> D=1e9, C=5e8.
    assert got["D"]["hub_nano"] == 1_000_000_000
    assert got["C"]["hub_nano"] == 500_000_000
    # a_raw: A1 = h(D)+h(C) = 1.5e9, A2 = 1e9 -> max 1.5e9
    assert got["A1"]["auth_nano"] == 1_000_000_000
    assert got["A2"]["auth_nano"] == (1_000_000_000 * 10**9) // 1_500_000_000
    # pure sources/sinks get zero on the other axis
    assert got["A1"]["hub_nano"] == 0 and got["A2"]["hub_nano"] == 0
    assert got["D"]["auth_nano"] == 0 and got["C"]["auth_nano"] == 0
    # more rounds keep the split and stay deterministic
    got3 = {r["host"]: r for r in
            webgraph.hits(edges, iterations=3).collect()}
    assert got3["D"]["hub_nano"] == 1_000_000_000
    assert got3["A1"]["auth_nano"] == 1_000_000_000
    assert got3["A1"]["auth_nano"] > got3["A2"]["auth_nano"] > 0


def test_cocitation_hand_computed_and_df_cap(spark):
    """Co-citation (X82): pair counts, integer Jaccard, and the
    out-degree df-cap that removes mega-directory sources from BOTH
    the numerator and the in-degree denominator."""
    from docling_serve_spark.operators import webgraph

    edges = spark.createDataFrame(
        # s1, s2 both cite A and B; s2 also cites C; mega cites all.
        [("s1", "A"), ("s1", "B"),
         ("s2", "A"), ("s2", "B"), ("s2", "C"),
         ("mega", "A"), ("mega", "B"), ("mega", "C"), ("mega", "D")],
        "src string, dst string",
    )
    got = {(r["host_a"], r["host_b"]): r for r in
           webgraph.cocitation_similarity(
               edges, min_common=2, max_out_degree=3).collect()}
    # mega (odeg 4 > cap 3) is dropped: in(A)=in(B)={s1,s2}, in(C)={s2}
    assert set(got) == {("A", "B")}
    r = got[("A", "B")]
    assert r["n_common"] == 2 and r["indeg_a"] == 2 and r["indeg_b"] == 2
    assert r["jaccard_bp"] == 10000  # identical in-link sets
    # without the cap, mega adds a third common source and C/D pair up
    uncapped = {(r["host_a"], r["host_b"]): r["n_common"] for r in
                webgraph.cocitation_similarity(
                    edges, min_common=2, max_out_degree=100).collect()}
    assert uncapped[("A", "B")] == 3
    assert uncapped[("A", "C")] == 2 and uncapped[("B", "C")] == 2


def test_kmv_exact_below_k_and_estimate_accuracy(spark):
    from docling_serve_spark.operators.sketches import kmv_distinct

    rows = ([Row(g="big", it=f"tok{i}") for i in range(500)]
            + [Row(g="small", it=w) for w in ("a", "b", "c")]
            + [Row(g="small", it="a")])  # duplicate: distinct first
    items = spark.createDataFrame(rows)
    got = {r["g"]: r for r in
           kmv_distinct(items, "g", "it", k=32).collect()}
    s = got["small"]
    assert s["n_kept"] == 3 and s["kth_hash"] is None
    assert s["est_distinct"] == 3  # exact below k
    b = got["big"]
    assert b["n_kept"] == 32 and b["kth_hash"] is not None
    # KMV relative error ~ 1/sqrt(k-1) ≈ 18%; generous 35% band
    assert 325 <= b["est_distinct"] <= 675, b["est_distinct"]


def test_winnowing_guarantee_tie_rule_and_short_docs(spark):
    """The SIGMOD-03 guarantee: a shared token run of length
    >= w + k - 1 (here 6) yields at least one identical fingerprint in
    both documents. Plus the rightmost-min tie rule on a repeated-gram
    document and the single-window path for short documents."""
    from docling_serve_spark.operators.dedup import winnow_fingerprints

    docs = spark.createDataFrame([
        Row(doc_id=1, text="aa bb cc dd ee ff gg hh"),
        Row(doc_id=2, text="zz cc dd ee ff gg hh xx"),   # shares 6-run
        Row(doc_id=3, text="a a a a a a"),               # all grams tie
        Row(doc_id=4, text="p q r s"),                   # 2 grams < w
        Row(doc_id=5, text="x y"),                       # no 3-gram at all
    ])
    out = winnow_fingerprints(docs, k=3, w=4)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    fps1 = {fp for _, fp in by_doc[1]}
    fps2 = {fp for _, fp in by_doc[2]}
    assert fps1 & fps2, "shared >= w+k-1 run must share a fingerprint"
    # doc 3: 4 identical gram hashes, one window (m - w = 0) -> the
    # RIGHTMOST position wins the tie
    assert by_doc[3] == [(3, by_doc[3][0][1])]
    # doc 4: fewer grams than the window -> exactly one fingerprint,
    # the rightmost of the tie-free pair's minimum
    assert len(by_doc[4]) == 1
    assert 5 not in by_doc  # shorter than one k-gram: no fingerprints


def test_spam_mass_flags_seed_unreachable_rank(spark):
    """VLDB-06 property: the spam cluster's target collects PageRank
    but zero trust -> spam_mass_bp = 10000 and is_spam; the seed and
    its trust-fed neighbors stay below threshold; mass clamps at 0
    where trust exceeds rank (teleport concentrates on the seed)."""
    from docling_serve_spark.operators import webgraph

    edges = spark.createDataFrame(
        [("S", "A"), ("A", "B"),
         ("X", "P"), ("Y", "P"), ("Z", "P")],
        "src string, dst string",
    )
    got = {r["host"]: r for r in
           webgraph.spam_mass(edges, seeds=["S"], iterations=2).collect()}
    assert got["P"]["spam_mass_bp"] == 10000 and got["P"]["is_spam"]
    assert got["S"]["spam_mass_bp"] == 0 and not got["S"]["is_spam"]
    assert got["A"]["spam_mass_bp"] == 0  # trust > rank: clamped
    assert not got["B"]["is_spam"]


def test_phrase_search_positional_semantics(spark):
    """Phrase search (X84): consecutive-token matches only, overlap
    counts separately, duplicate phrase terms reuse one posting list,
    docs missing any term are dropped by the inner joins."""
    from docling_serve_spark.operators.retrieval import phrase_topk

    docs = spark.createDataFrame(
        [(1, "the quick fox saw the quick fox jump"),
         (2, "quick the fox"),            # terms present, wrong order
         (3, "the quick brown fox"),      # interrupted phrase
         (4, "THE  Quick\tfox"),          # normalization: case + ws
         (5, "a a a a")],                 # overlapping duplicate terms
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in
           phrase_topk(docs, ("the", "quick", "fox"), k=10).collect()}
    assert set(got) == {1, 4}
    assert got[1]["n_matches"] == 2 and got[1]["rank"] == 1
    assert got[4]["n_matches"] == 1 and got[4]["rank"] == 2
    dup = {r["doc_id"]: r["n_matches"] for r in
           phrase_topk(docs, ("a", "a"), k=10).collect()}
    assert dup == {5: 3}  # "a a" in "a a a a": positions 0,1,2


def test_triangle_stats_hand_computed(spark):
    """Triangles (X85) on K3 + pendant: A-B-C triangle, D hangs off C.
    Degrees A2 B2 C3 D1; one triangle touching A, B, C; clustering
    10000 for A/B, floor(2/(3*2)*1e4)=3333 for C, 0 for the pendant.
    Direction and duplicate edges must not matter."""
    from docling_serve_spark.operators import webgraph

    edges = spark.createDataFrame(
        # mixed directions + a duplicate reverse edge
        [("A", "B"), ("C", "B"), ("C", "A"), ("A", "C"), ("C", "D")],
        "src string, dst string",
    )
    got = {r["host"]: r for r in webgraph.triangle_stats(edges).collect()}
    assert {h: g["degree"] for h, g in got.items()} == {
        "A": 2, "B": 2, "C": 3, "D": 1}
    assert {h: g["n_triangles"] for h, g in got.items()} == {
        "A": 1, "B": 1, "C": 1, "D": 0}
    assert got["A"]["clustering_bp"] == 10000
    assert got["B"]["clustering_bp"] == 10000
    assert got["C"]["clustering_bp"] == 3333
    assert got["D"]["clustering_bp"] == 0


def test_bloom_no_false_negatives_and_mergeable(spark):
    """Bloom filter (X86): every inserted item probes true (the
    structural guarantee a crawler relies on — never refetch a seen
    url), never-inserted items read true only at the designed
    false-positive rate, and two filters merged by bit_or equal the
    filter of the union (the multi-crawl merge path)."""
    from pyspark.sql import functions as F

    from docling_serve_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    m = 1 << 14
    a = spark.range(0, 300).select(
        F.concat(F.lit("https://a.example/"), F.col("id")).alias("url"))
    b = spark.range(300, 600).select(
        F.concat(F.lit("https://b.example/"), F.col("id")).alias("url"))
    fresh = spark.range(0, 500).select(
        F.concat(F.lit("https://never.example/"), F.col("id")).alias("url"))

    words = bloom_build(a.union(b), m_bits=m, k=3)
    seen = bloom_probe(words, a.union(b), m_bits=m, k=3).collect()
    assert len(seen) == 600 and all(r["maybe_seen"] for r in seen)

    probes = bloom_probe(words, fresh, m_bits=m, k=3).collect()
    fp = sum(1 for r in probes if r["maybe_seen"])
    # k=3, n=600, m=16384: (1-e^(-3*600/16384))^3 ~ 0.1%; allow 10x
    assert fp <= 5, fp

    merged = (
        bloom_build(a, m_bits=m, k=3)
        .union(bloom_build(b, m_bits=m, k=3))
        .groupBy("word_idx")
        .agg(F.bit_or("word").cast("bigint").alias("word"))
    )
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, words.collect())))


def test_cms_never_underestimates_and_merges(spark):
    """Count-min sketch (X87): est >= exact for every probed item
    (each true occurrence lands in every row), error bounded by the
    collision mass, and two sketches merged by summing counters equal
    the sketch of the union."""
    from pyspark.sql import functions as F

    from docling_serve_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    w = 256
    # zipf-ish: item i appears 600 // (i + 1) times, 40 distinct items
    items = spark.range(0, 40).select(
        F.col("id").alias("i"),
        F.expr("explode(array_repeat(concat('tok', id), "
               "CAST(600 / (id + 1) AS INT)))").alias("item"),
    ).select("item")
    n_total = items.count()
    sketch = cms_build(items, "item", d=3, w=w)
    probes = spark.range(0, 45).select(  # 40 present + 5 absent
        F.concat(F.lit("tok"), F.col("id")).alias("item"))
    est = {r["item"]: r["est_count"] for r in
           cms_estimate(sketch, probes, "item", d=3, w=w).collect()}
    exact = {r["item"]: r["c"] for r in
             items.groupBy("item").agg(F.count("*").alias("c")).collect()}
    for i in range(45):
        t = f"tok{i}"
        true = exact.get(t, 0)
        assert est[t] >= true, t                     # one-sided
        assert est[t] - true <= 5 * n_total // w, t  # bounded error

    # merge identity over a disjoint split of the multiset
    a = items.where(F.abs(F.hash("item")) % 2 == 0)
    b = items.where(F.abs(F.hash("item")) % 2 == 1)
    merged = (
        cms_build(a, "item", d=3, w=w)
        .union(cms_build(b, "item", d=3, w=w))
        .groupBy("row", "idx")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, sketch.collect())))


def test_seed_distance_bfs_levels_and_unreachable(spark):
    """BFS seed distance (X89): exact hop levels on a chain with a
    shortcut (min over paths, not path order), the max_hops cutoff,
    and -1 for a component the seeds cannot reach."""
    from docling_serve_spark.operators import webgraph

    edges = spark.createDataFrame(
        [("S", "A"), ("A", "B"), ("B", "C"), ("C", "D"),
         ("S", "B"),            # shortcut: B is 1 hop, not 2
         ("D", "S"),            # back edge: cycle must not relabel S
         ("X", "Y"), ("Y", "X")],  # island, seed-unreachable
        "src string, dst string",
    )
    got = {r["host"]: r for r in
           webgraph.seed_distance(edges, seeds=["S"], max_hops=2).collect()}
    assert got["S"]["seed_hops"] == 0 and got["S"]["reachable"]
    assert got["A"]["seed_hops"] == 1
    assert got["B"]["seed_hops"] == 1          # shortcut wins over S->A->B
    assert got["C"]["seed_hops"] == 2
    assert got["D"]["seed_hops"] == -1         # beyond max_hops bound
    assert not got["D"]["reachable"]
    assert got["X"]["seed_hops"] == -1 and got["Y"]["seed_hops"] == -1
    # widening the bound resolves D at its true depth
    far = {r["host"]: r["seed_hops"] for r in
           webgraph.seed_distance(edges, seeds=["S"], max_hops=4).collect()}
    assert far["D"] == 3 and far["X"] == -1


def test_recrawl_priority_hand_computed(spark):
    """Recrawl priority (X90): hand-checked change-rate estimation —
    a url changing every capture (10000 bp), one never changing
    (0 bp), a single-capture url (NULL rate, optimistic priority),
    and whole-day staleness arithmetic."""
    from docling_serve_spark.operators.urltools import recrawl_priority

    caps = spark.createDataFrame(
        [
            ("hot", "20240201000000", "d1"),
            ("hot", "20240202000000", "d2"),
            ("hot", "20240203000000", "d3"),
            ("cold", "20240201000000", "s"),
            ("cold", "20240210000000", "s"),
            ("once", "20240215000000", "z"),
        ],
        "urlkey string, ts14 string, digest string",
    )
    got = {r["urlkey"]: r for r in
           recrawl_priority(caps, asof_date="2024-03-01").collect()}
    hot = got["hot"]
    assert hot["n_captures"] == 3 and hot["n_changes"] == 2
    assert hot["change_rate_bp"] == 10000
    assert hot["age_days"] == 27  # 2024-02-03 -> 2024-03-01
    assert hot["priority"] == 10000 * 27
    cold = got["cold"]
    assert cold["n_changes"] == 0 and cold["change_rate_bp"] == 0
    assert cold["priority"] == 0
    once = got["once"]
    assert once["n_captures"] == 1 and once["change_rate_bp"] is None
    assert once["age_days"] == 15 and once["priority"] == 10000 * 15


def test_length_outliers_hand_computed_quartiles(spark):
    """Length outliers (X91): x4 quartiles equal 4·quantile_cont on a
    hand-set group — values [1..9] plus outlier 1000: Q1=3, Q3=7.5
    (x4: 12 and 30), fences [12-27, 30+27] = [-15, 57] x4 → only 1000
    flagged; a singleton group degenerates to zero-width fences."""
    from docling_serve_spark.operators.textstats import length_outliers

    rows = [(i, "a", v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9,
                                               1000])]
    rows.append((99, "b", 42))
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, "
                                       "n_chars bigint")
    got = {(r["grp"], r["doc_id"]): r
           for r in length_outliers(docs).collect()}
    a = got[("a", 0)]
    # n=10: Q1 index 2.25 -> 3+(4-3)*0.25 = 3.25 -> x4 13;
    # Q3 index 6.75 -> 7+(8-7)*0.75 = 7.75 -> x4 31
    assert a["q1_x4"] == 13 and a["q3_x4"] == 31
    assert a["lo_fence_x4"] == 13 - (3 * 18) // 2
    assert a["hi_fence_x4"] == 31 + (3 * 18) // 2
    flagged = {k[1] for k, r in got.items() if r["is_outlier"]}
    assert flagged == {9}  # only the 1000-char doc
    b = got[("b", 99)]
    assert b["q1_x4"] == 42 * 4 and b["q3_x4"] == 42 * 4
    assert not b["is_outlier"]


def test_degree_distribution_bins_hand_computed(spark):
    """Degree histogram (X92): bit-length binning — a degree-1 host
    lands in bin 1 [1,1], degree-3 in bin 2 [2,3], degree-5 in bin 3
    [4,7]; in/out tallied separately over the distinct edge list."""
    from docling_serve_spark.operators import webgraph

    edges = spark.createDataFrame(
        # hub has out-degree 5; t1..t5 in-degree 1; b out-degree 3
        [("hub", f"t{i}") for i in range(1, 6)]
        + [("b", "t1"), ("b", "t2"), ("b", "t3"),
           ("b", "t1")],  # duplicate edge must not double-count
        "src string, dst string",
    )
    got = {(r["direction"], r["bin"]): r
           for r in webgraph.degree_distribution(edges).collect()}
    out3 = got[("out", 3)]  # hub, degree 5
    assert out3["bin_lo"] == 4 and out3["bin_hi"] == 7
    assert out3["n_hosts"] == 1 and out3["total_degree"] == 5
    out2 = got[("out", 2)]  # b, degree 3
    assert out2["n_hosts"] == 1 and out2["total_degree"] == 3
    in1 = got[("in", 1)]   # t4,t5 have in-degree 1
    assert in1["bin_lo"] == 1 and in1["bin_hi"] == 1
    assert in1["n_hosts"] == 2
    in2 = got[("in", 2)]   # t1,t2,t3 have in-degree 2 (hub + b)
    assert in2["n_hosts"] == 3 and in2["total_degree"] == 6


def test_host_churn_hand_computed(spark):
    """Host churn (X94): one host with every status, one fully
    stable host — birth/death/churn bp checked by hand."""
    from docling_serve_spark.operators.relational import snapshot_diff
    from docling_serve_spark.operators.urltools import host_churn

    old = spark.createDataFrame(
        [("https://a.example/1", "f1"), ("https://a.example/2", "f2"),
         ("https://a.example/3", "f3"), ("https://b.example/1", "g1")],
        "url string, fingerprint string",
    )
    new = spark.createDataFrame(
        # /1 unchanged, /2 changed, /3 removed, /4 added
        [("https://a.example/1", "f1"), ("https://a.example/2", "X"),
         ("https://a.example/4", "f4"), ("https://b.example/1", "g1")],
        "url string, fingerprint string",
    )
    got = {r["host"]: r
           for r in host_churn(snapshot_diff(old, new)).collect()}
    a = got["a.example"]
    assert (a["n_old"], a["n_new"]) == (3, 3)
    assert (a["n_added"], a["n_removed"], a["n_changed"],
            a["n_unchanged"]) == (1, 1, 1, 1)
    assert a["birth_rate_bp"] == 10000 // 3
    assert a["death_rate_bp"] == 10000 // 3
    assert a["churn_bp"] == (10000 * 3) // 4
    b = got["b.example"]
    assert b["churn_bp"] == 0 and b["birth_rate_bp"] == 0


def test_politeness_audit_hand_computed(spark):
    """Politeness audit (X95): gap arithmetic, the equal-timestamp
    0-gap violation, the default-delay branch, and a single-fetch
    host with NULL min gap and zero violations."""
    from docling_serve_spark.operators.frontier import politeness_audit

    fetches = spark.createDataFrame(
        [("a", 0), ("a", 500), ("a", 2000), ("a", 2000),  # gaps 500,1500,0
         ("b", 0), ("b", 900),                            # gap 900, no delay row
         ("c", 0)],
        "host string, ts_ms bigint",
    )
    delays = spark.createDataFrame([("a", 1000)],
                                   "host string, delay_ms bigint")
    got = {r["host"]: r for r in politeness_audit(fetches, delays).collect()}
    a = got["a"]
    assert a["n_fetches"] == 4 and a["min_gap_ms"] == 0
    assert a["n_violations"] == 2  # 500 and 0 both < 1000
    assert a["violation_bp"] == (10000 * 2) // 3
    b = got["b"]
    assert b["delay_ms"] == 1000 and b["n_violations"] == 1  # default delay
    c = got["c"]
    assert c["min_gap_ms"] is None and c["n_violations"] == 0
    assert c["violation_bp"] == 0


def test_sitemap_coverage_hand_computed(spark):
    """Sitemap coverage (X96): declared∩crawled arithmetic by hand,
    duplicate declarations collapse, a declared-only host reads 0
    coverage and a crawled-only host reads full orphan rate."""
    from docling_serve_spark.operators.urltools import sitemap_coverage

    declared = spark.createDataFrame(
        [("https://a.example/1",), ("https://a.example/1",),  # dup collapses
         ("https://a.example/2",), ("https://a.example/3",),
         ("https://gap.example/1",)],
        "url string",
    )
    crawled = spark.createDataFrame(
        [("https://a.example/1",), ("https://a.example/2",),
         ("https://a.example/9",),  # orphan
         ("https://orphan.example/1",)],
        "url string",
    )
    got = {r["host"]: r
           for r in sitemap_coverage(declared, crawled).collect()}
    a = got["a.example"]
    assert (a["n_declared"], a["n_crawled"], a["n_both"]) == (3, 3, 2)
    assert a["n_gap"] == 1 and a["n_orphan"] == 1
    assert a["coverage_bp"] == (10000 * 2) // 3
    assert a["orphan_bp"] == 10000 // 3
    assert got["gap.example"]["coverage_bp"] == 0
    assert got["orphan.example"]["orphan_bp"] == 10000
    assert got["orphan.example"]["n_declared"] == 0


def test_url_param_stats_hand_computed(spark):
    """URL param audit (X97): tracking detection is exact-key (a
    'reference' param must NOT match 'ref'), fragments are excluded
    from the query string, bare '&&' separators are dropped."""
    from docling_serve_spark.operators.urltools import url_param_stats

    pages = spark.createDataFrame(
        [("https://a.example/x",),
         ("https://a.example/y?utm_source=z",),
         ("https://a.example/z?reference=book&page=2",),  # NOT tracking
         ("https://a.example/w?a=1&&b=2#frag=no",),
         ("https://b.example/only?gclid=tag",)],
        "url string",
    )
    got = {r["host"]: r for r in url_param_stats(pages).collect()}
    a = got["a.example"]
    assert a["n_urls"] == 4 and a["n_with_query"] == 3
    assert a["n_tracking"] == 1  # only utm_source; 'reference' is exact-miss
    assert a["query_share_bp"] == 7500
    assert a["tracking_share_bp"] == 2500
    # params: utm_source, reference, page, a, b  (frag excluded)
    assert a["n_distinct_params"] == 5
    b = got["b.example"]
    assert b["tracking_share_bp"] == 10000 and b["n_distinct_params"] == 1


def test_group_overlap_hand_computed(spark):
    """Group overlap (X98/X99): containment-of-smaller arithmetic,
    whitespace-normalized fingerprints, a 3-group shared fp emitting
    all three pairs, and disjoint groups emitting no row."""
    from docling_serve_spark.operators.corpus import group_overlap

    docs = spark.createDataFrame(
        [
            ("train", "the shared   text"),   # normalizes equal
            ("train", "train only one"),
            ("train", "train only two"),
            ("val",   "The Shared text"),
            ("test",  "the shared text "),
            ("test",  "test only"),
            ("lone",  "nothing shared here"),
        ],
        "label string, text string",
    )
    rows = group_overlap(docs, label_col="label").collect()
    got = {(r["label_a"], r["label_b"]): r for r in rows}
    assert set(got) == {("test", "train"), ("train", "val"),
                        ("test", "val")}
    tv = got[("train", "val")]
    assert tv["n_shared"] == 1 and tv["n_a"] == 3 and tv["n_b"] == 1
    assert tv["overlap_bp"] == 10000  # val fully contained in train
    tt = got[("test", "train")]
    assert tt["overlap_bp"] == 5000  # 1 of min(2, 3)
    assert all("lone" not in k for k in got)


# ------------------------------------------------------------------ #
# tokenizer fertility / batch drift (X103-X104)
# ------------------------------------------------------------------ #

def test_token_fertility_counts_and_ratio(spark):
    from docling_serve_spark.operators.textstats import token_fertility

    docs = spark.createDataFrame(
        [(1, "hello world", "en"),          # 2 words, 2 pieces
         (2, "a,b c;d", "xx"),              # 2 words, 6 pieces
         (3, "", "empty")],                 # blank: all zeros
        "doc_id bigint, text string, lang string",
    )
    got = {r["lang"]: r for r in token_fertility(docs).collect()}
    assert got["en"]["fertility_bp"] == 10000
    assert got["en"]["n_tokens"] == 2 and got["en"]["n_pieces"] == 2
    assert got["xx"]["fertility_bp"] == 30000      # 6 pieces / 2 words
    assert got["empty"]["n_tokens"] == 0
    assert got["empty"]["fertility_bp"] == 0       # div-by-zero guarded


def test_batch_drift_tv_distance(spark):
    from docling_serve_spark.operators.corpus import batch_drift

    # bin 3 = lengths 4-7, bin 4 = lengths 8-15
    a = spark.createDataFrame(
        [(i, "aaaa") for i in range(4)], "doc_id bigint, text string"
    )
    b = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaa"), (3, "aaaaaaaa"), (4, "aaaaaaaa")],
        "doc_id bigint, text string",
    )
    rows = {r["bin"]: r for r in batch_drift(a, b).collect()}
    assert set(rows) == {3, 4}
    assert rows[3]["p_a_bp"] == 10000 and rows[3]["p_b_bp"] == 5000
    assert rows[4]["n_a"] == 0 and rows[4]["p_b_bp"] == 5000
    assert rows[3]["bin_lo"] == 4 and rows[3]["bin_hi"] == 7
    # TV = (5000 + 5000) / 2, identical on every row
    assert all(r["tv_total_bp"] == 5000 for r in rows.values())


def test_batch_drift_identical_batches_zero(spark):
    from docling_serve_spark.operators.corpus import batch_drift

    a = spark.createDataFrame(
        [(i, "x" * (i + 1)) for i in range(8)], "doc_id bigint, text string"
    )
    rows = batch_drift(a, a).collect()
    assert rows and all(r["drift_bp"] == 0 for r in rows)
    assert all(r["tv_total_bp"] == 0 for r in rows)


# ------------------------------------------------------------------ #
# DUST rule mining (X105)
# ------------------------------------------------------------------ #

def test_dust_rules_mines_index_html_alias(spark):
    """Three hosts each serving the same page at /pN/ and
    /pN/index.html: one generalized rule ('' -> 'index.html') with
    support 3, never three path-specific rules."""
    rows = []
    for h in range(3):
        text = f"unique page body {h} with words"
        rows.append((f"http://h{h}.com/p{h}/", text))
        rows.append((f"http://h{h}.com/p{h}/index.html", text))
    pages = spark.createDataFrame(rows, "url string, text string")
    got = urltools.dust_rules(pages, min_support=3).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["rule_from"], r["rule_to"]) == ("", "index.html")
    assert r["n_pairs"] == 3 and r["n_hosts"] == 3


def test_dust_rules_support_threshold_and_cross_host_isolation(spark):
    # same-content URLs on DIFFERENT hosts never pair; a one-off alias
    # below min_support is dropped
    pages = spark.createDataFrame(
        [("http://a.com/x", "mirror body"),
         ("http://b.com/x", "mirror body"),
         ("http://c.com/y?utm=1", "c body"),
         ("http://c.com/y", "c body")],
        "url string, text string",
    )
    assert urltools.dust_rules(pages, min_support=2).count() == 0
    got = urltools.dust_rules(pages, min_support=1).collect()
    assert {(r["rule_from"], r["rule_to"]) for r in got} == {("", "?utm=1")}


def test_dust_rules_group_cap_bounds_pairs(spark):
    # a 10-alias trap group contributes C(4,2)=6 pairs at max_group=4
    rows = [(f"http://t.com/s{i}", "trap body") for i in range(10)]
    pages = spark.createDataFrame(rows, "url string, text string")
    total = (
        urltools.dust_rules(pages, max_group=4, min_support=1)
        .agg(F.sum("n_pairs")).first()[0]
    )
    assert total == 6


# ------------------------------------------------------------------ #
# canonical trust audit (X106)
# ------------------------------------------------------------------ #

def _canon_page(url, canonical, text):
    html = "<html><head>"
    if canonical:
        html += f'<link rel="canonical" href="{canonical}"/>'
    html += f"</head><body>{text}</body></html>"
    return (url, bytearray(html.encode()), text)


def test_canonical_trust_verdict_classes(spark):
    from docling_serve_spark.operators.pagemeta import canonical_trust

    rows = [
        # agree: alt declares main, same content
        _canon_page("http://a.com/alt1", "http://a.com/main1", "body one"),
        _canon_page("http://a.com/main1", "", "body one"),
        # disagree: alt declares main, DIFFERENT content
        _canon_page("http://a.com/alt2", "http://a.com/main2", "body two"),
        _canon_page("http://a.com/main2", "", "other text"),
        # self-canonical
        _canon_page("http://a.com/self", "http://a.com/self", "self body"),
        # dangling: target never crawled
        _canon_page("http://a.com/alt3", "http://a.com/gone", "body three"),
        # no canonical at all
        _canon_page("http://a.com/plain", "", "plain body"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, html binary, text string"
    )
    [r] = canonical_trust(pages).collect()
    assert r["host"] == "a.com" and r["n_pages"] == 7
    assert r["n_with_canonical"] == 4
    assert r["n_self"] == 1 and r["n_agree"] == 1
    assert r["n_disagree"] == 1 and r["n_dangling"] == 1
    assert r["trust_bp"] == 5000  # (1 self + 1 agree) / 4


def test_canonical_trust_normalizes_declared_urls(spark):
    from docling_serve_spark.operators.pagemeta import canonical_trust

    # www/scheme/trailing-slash variants of the declared target must
    # still resolve to the crawled page
    rows = [
        _canon_page("http://b.com/x", "HTTPS://www.b.com/y/", "same"),
        _canon_page("http://b.com/y", "", "same"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, html binary, text string"
    )
    [r] = canonical_trust(pages).collect()
    assert r["n_agree"] == 1 and r["n_dangling"] == 0
    assert r["trust_bp"] == 10000


# ------------------------------------------------------------------ #
# host dup pressure / sampling temperature (X108-X109)
# ------------------------------------------------------------------ #

def test_host_dup_stats_is_host_local(spark):
    from docling_serve_spark.operators.textstats import host_dup_stats

    pages = spark.createDataFrame(
        [("http://mill.com/a", "template body"),
         ("http://mill.com/b", "template body"),
         ("http://mill.com/c", "template body"),
         ("http://mill.com/d", "unique page"),
         # the same template on ANOTHER host must not count here
         ("http://clean.com/x", "template body"),
         ("http://clean.com/y", "own content")],
        "url string, text string",
    )
    got = {r["host"]: r for r in host_dup_stats(pages).collect()}
    assert got["mill.com"]["n_pages"] == 4
    assert got["mill.com"]["n_dup_pages"] == 3
    assert got["mill.com"]["n_clusters"] == 1
    assert got["mill.com"]["dup_bp"] == 7500
    assert got["clean.com"]["n_dup_pages"] == 0
    assert got["clean.com"]["dup_bp"] == 0


def test_sampling_temperature_boosts_tail_language(spark):
    from docling_serve_spark.operators.textstats import sampling_temperature

    docs = spark.createDataFrame(
        [(i, "word " * 90, "en") for i in range(9)]
        + [(100, "wort " * 90, "de")],
        "doc_id bigint, text string, lang string",
    )
    got = {r["lang"]: r for r in sampling_temperature(docs).collect()}
    # natural shares 0.9 / 0.1; alpha=0.3 compresses toward uniform
    assert abs(got["en"]["p_raw"] - 0.9) < 1e-6
    assert got["de"]["q_sampled"] > got["de"]["p_raw"]     # boosted
    assert got["en"]["q_sampled"] < got["en"]["p_raw"]     # damped
    assert got["de"]["boost"] > 1.0 > got["en"]["boost"]
    total_q = got["en"]["q_sampled"] + got["de"]["q_sampled"]
    assert abs(total_q - 1.0) < 1e-5                        # normalized


# ------------------------------------------------------------------ #
# hreflang reciprocity (X110)
# ------------------------------------------------------------------ #

def _hl_page(url, alternates):
    html = "<html><head>" + "".join(
        f'<link rel="alternate" hreflang="{lang}" href="{href}"/>'
        for lang, href in alternates
    ) + "</head><body>x</body></html>"
    return (url, bytearray(html.encode()))


def test_hreflang_reciprocity_return_tag_audit(spark):
    from docling_serve_spark.operators.pagemeta import hreflang_reciprocity

    rows = [
        # en declares self + fr; fr returns -> reciprocal
        _hl_page("https://s.com/en/1",
                 [("en", "https://s.com/en/1"), ("fr", "https://s.com/fr/1")]),
        _hl_page("https://s.com/fr/1", [("en", "https://s.com/en/1")]),
        # en declares de; de never returns -> unreturned
        _hl_page("https://s.com/en/2", [("de", "https://s.com/de/2")]),
        _hl_page("https://s.com/de/2", []),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r["src_url"]: r for r in hreflang_reciprocity(pages).collect()}
    e1 = got["https://s.com/en/1"]
    assert (e1["n_declared"], e1["n_self"], e1["n_reciprocal"],
            e1["n_unreturned"]) == (2, 1, 1, 0)
    assert e1["reciprocal_bp"] == 10000
    f1 = got["https://s.com/fr/1"]
    assert f1["n_reciprocal"] == 1 and f1["reciprocal_bp"] == 10000
    e2 = got["https://s.com/en/2"]
    assert (e2["n_reciprocal"], e2["n_unreturned"]) == (0, 1)
    assert e2["reciprocal_bp"] == 0
    # a page declaring nothing emits no row
    assert "https://s.com/de/2" not in got


def test_hreflang_reciprocity_ignores_language_label(spark):
    from docling_serve_spark.operators.pagemeta import hreflang_reciprocity

    # the return tag uses a different (even wrong) language label —
    # reciprocity is a URL-pair property
    rows = [
        _hl_page("https://s.com/a", [("fr", "https://s.com/b")]),
        _hl_page("https://s.com/b", [("x-default", "https://s.com/a")]),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r["src_url"]: r for r in hreflang_reciprocity(pages).collect()}
    assert all(r["reciprocal_bp"] == 10000 for r in got.values())


# ------------------------------------------------------------------ #
# sitemap lastmod staleness (X111)
# ------------------------------------------------------------------ #

def test_sitemap_staleness_classes(spark):
    from datetime import datetime

    from docling_serve_spark.operators.urltools import sitemap_staleness

    xml = (
        "<urlset>"
        "<url><loc>https://s.com/fresh</loc>"
        "<lastmod>2024-01-01</lastmod></url>"
        "<url><loc> https://s.com/stale </loc>"
        "<lastmod>2024-03-15T08:00:00+00:00</lastmod></url>"
        "<url><loc>https://s.com/nolastmod</loc></url>"
        "<url><loc>https://s.com/uncrawled</loc>"
        "<lastmod>2024-01-05</lastmod></url>"
        "<url><loc>https://s.com/badmod</loc>"
        "<lastmod>not-a-date</lastmod></url>"
        "</urlset>"
    )
    sitemaps = spark.createDataFrame(
        [("https://s.com/sitemap.xml", bytearray(xml.encode()))],
        "url string, html binary",
    )
    ts = datetime(2024, 2, 1, 12, 0)
    crawled = spark.createDataFrame(
        [("https://s.com/fresh", ts), ("https://s.com/stale", ts),
         ("https://s.com/nolastmod", ts), ("https://s.com/badmod", ts)],
        "url string, warc_ts timestamp",
    )
    [r] = sitemap_staleness(sitemaps, crawled).collect()
    assert r["host"] == "s.com"
    assert r["n_declared"] == 5
    assert r["n_with_lastmod"] == 3          # bad date counts as absent
    assert r["n_uncrawled"] == 1
    assert r["n_stale"] == 1                 # lastmod 03-15 > crawl 02-01
    assert r["n_fresh"] == 3                 # fresh + nolastmod + badmod
    assert r["stale_bp"] == 5000             # 1 of (3 lastmod - 1 uncrawled)


def test_sitemap_staleness_latest_declaration_wins(spark):
    from datetime import datetime

    from docling_serve_spark.operators.urltools import sitemap_staleness

    xml1 = ("<urlset><url><loc>https://s.com/p</loc>"
            "<lastmod>2024-01-01</lastmod></url></urlset>")
    xml2 = ("<urlset><url><loc>https://s.com/p</loc>"
            "<lastmod>2024-03-01</lastmod></url></urlset>")
    sitemaps = spark.createDataFrame(
        [("https://s.com/a.xml", bytearray(xml1.encode())),
         ("https://s.com/b.xml", bytearray(xml2.encode()))],
        "url string, html binary",
    )
    crawled = spark.createDataFrame(
        [("https://s.com/p", datetime(2024, 2, 1))],
        "url string, warc_ts timestamp",
    )
    [r] = sitemap_staleness(sitemaps, crawled).collect()
    assert r["n_declared"] == 1 and r["n_stale"] == 1  # max lastmod wins


# ------------------------------------------------------------------ #
# per-language calibrated quality cut (X112)
# ------------------------------------------------------------------ #

def test_lang_quality_cut_is_per_language(spark):
    from docling_serve_spark.operators.textstats import lang_quality_cut

    # lang 'hi' scores all sit BELOW every 'en' score; a global cut
    # would wipe 'hi' out, the calibrated cut drops each language's
    # own bottom quarter only
    rows = (
        [(i, "cleanwords " * (i + 5), "en") for i in range(4)]
        + [(10 + i, ("x " * (i + 1)) + "!!!! 1234 %%%", "hi")
           for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {r["doc_id"]: r for r in
           lang_quality_cut(docs, drop_bottom_bp=2500).collect()}
    en_scores = [got[i]["score_bp"] for i in range(4)]
    hi_scores = [got[10 + i]["score_bp"] for i in range(4)]
    assert min(en_scores) > max(hi_scores)
    # exactly one doc dropped per language (bottom quarter of 4)
    for lang_ids in (range(4), range(10, 14)):
        kept = [got[i]["keep"] for i in lang_ids]
        assert kept.count(False) == 1
    # the dropped one is that language's own worst
    assert got[min(range(4), key=lambda i: (got[i]['score_bp'], i))]["keep"] is False


def test_lang_quality_cut_percentiles_are_exact(spark):
    from docling_serve_spark.operators.textstats import lang_quality_cut

    docs = spark.createDataFrame(
        [(i, "w" * (i + 1) + "." * (10 - i), "en") for i in range(5)],
        "doc_id bigint, text string, lang string",
    )
    got = sorted(
        (r["pct_bp"] for r in lang_quality_cut(docs).collect())
    )
    assert got == [0, 2500, 5000, 7500, 10000]


# ------------------------------------------------------------------ #
# HTML-entity residue (X113)
# ------------------------------------------------------------------ #

def test_entity_residue_detects_broken_extraction(spark):
    from docling_serve_spark.operators.normalize import entity_residue_stats

    docs = spark.createDataFrame(
        [(1, "Fish &amp; Chips &#39;menu&#x27; here"),   # systematic
         (2, "a page that mentions &amp; once " + "w" * 5000),  # prose
         (3, "perfectly clean text with an & ampersand"),
         (4, "")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in entity_residue_stats(docs).collect()}
    assert got[1]["n_entities"] == 3 and got[1]["has_residue"] is True
    assert got[2]["n_entities"] == 1 and got[2]["has_residue"] is False
    assert got[3]["n_entities"] == 0      # bare & is not an entity
    assert got[4]["n_entities"] == 0 and got[4]["has_residue"] is False


# ------------------------------------------------------------------ #
# fetch-schedule capacity audit (X114)
# ------------------------------------------------------------------ #

def test_schedule_audit_flags_straggler_fetcher(spark):
    from docling_serve_spark.operators.frontier import schedule_audit

    sched = spark.createDataFrame(
        [("u1", "slow.com", 0, 0, 0), ("u2", "slow.com", 0, 1, 5000),
         ("u3", "slow.com", 0, 2, 10000),
         ("u4", "fast.com", 1, 0, 0), ("u5", "other.com", 1, 0, 0)],
        "url string, host string, fetcher int, fetch_seq int, "
        "fetch_at_ms bigint",
    )
    got = {r["fetcher"]: r for r in schedule_audit(sched).collect()}
    assert got[0]["n_urls"] == 3 and got[0]["n_hosts"] == 1
    assert got[0]["makespan_ms"] == 10000
    assert got[1]["n_hosts"] == 2 and got[1]["makespan_ms"] == 0
    assert got[0]["load_bp"] == 6000 and got[1]["load_bp"] == 4000
    # spread between busiest and idlest fetcher dominates the wave
    assert all(r["imbalance_bp"] == 10000 for r in got.values())


def test_schedule_audit_balanced_wave_zero_imbalance(spark):
    from docling_serve_spark.operators.frontier import schedule_audit

    sched = spark.createDataFrame(
        [("a", "h1", 0, 0, 1000), ("b", "h2", 1, 0, 1000)],
        "url string, host string, fetcher int, fetch_seq int, "
        "fetch_at_ms bigint",
    )
    rows = schedule_audit(sched).collect()
    assert all(r["imbalance_bp"] == 0 for r in rows)


# ------------------------------------------------------------------ #
# near-dup-safe split quarantine (X116)
# ------------------------------------------------------------------ #

def test_component_split_quarantines_dup_families(spark):
    from docling_serve_spark.operators.sampling import component_split

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id bigint"
    )
    # 1-2-3 chained component (transitive), 5-6 pair, 4 and 7 single
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a bigint, doc_b bigint"
    )
    got = {r["doc_id"]: r for r in
           component_split(docs, pairs, test_bp=3000, val_bp=3000).collect()}
    assert got[1]["anchor"] == got[2]["anchor"] == got[3]["anchor"] == 1
    assert got[5]["anchor"] == got[6]["anchor"] == 5
    assert got[4]["anchor"] == 4 and got[7]["anchor"] == 7
    # the leakage guarantee: one split per component, whatever it is
    assert got[1]["split"] == got[2]["split"] == got[3]["split"]
    assert got[5]["split"] == got[6]["split"]
    # members share the anchor's bucket exactly
    assert got[2]["split_bucket"] == got[1]["split_bucket"]


def test_component_split_singletons_match_anchor_hash(spark):
    from docling_serve_spark.operators.sampling import (
        component_split,
        md5_hash48,
    )

    docs = spark.createDataFrame([(42,)], "doc_id bigint")
    pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    [r] = component_split(docs, pairs).collect()
    expected = docs.select(
        F.pmod(md5_hash48(F.concat(F.col("doc_id").cast("string"),
                                   F.lit("/csplit-v1"))), F.lit(10000))
    ).first()[0]
    assert r["split_bucket"] == expected


# ------------------------------------------------------------------ #
# embedding drift (X117)
# ------------------------------------------------------------------ #

def test_embedding_drift_detects_centroid_shift(spark):
    from docling_serve_spark.operators.similarity import embedding_drift

    a = spark.createDataFrame(
        [(1, [0.1, 0.0]), (2, [0.3, 0.0])], "vec_id bigint, embedding array<float>"
    )
    # dim 0 shifted by +0.5, dim 1 unchanged
    b = spark.createDataFrame(
        [(3, [0.6, 0.0]), (4, [0.8, 0.0])], "vec_id bigint, embedding array<float>"
    )
    got = {r["dim"]: r for r in embedding_drift(a, b).collect()}
    assert got[0]["mean_milli_a"] == 200 and got[0]["mean_milli_b"] == 700
    assert got[0]["delta_milli"] == 500
    assert got[1]["delta_milli"] == 0
    assert all(r["l1_total_milli"] == 500 for r in got.values())
    assert got[0]["n_a"] == 2 and got[0]["n_b"] == 2


def test_embedding_drift_identical_batches_zero(spark):
    from docling_serve_spark.operators.similarity import embedding_drift

    a = spark.createDataFrame(
        [(i, [0.01 * i, -0.02 * i, 0.5]) for i in range(6)],
        "vec_id bigint, embedding array<float>",
    )
    rows = embedding_drift(a, a).collect()
    assert rows and all(r["delta_milli"] == 0 for r in rows)
    assert all(r["l1_total_milli"] == 0 for r in rows)


# ------------------------------------------------------------------ #
# mixed-script homoglyph detection (X118)
# ------------------------------------------------------------------ #

def test_mixed_script_flags_homoglyph_tokens(spark):
    from docling_serve_spark.operators.normalize import mixed_script_stats

    docs = spark.createDataFrame(
        [(1, "click pаypаl login now"),        # Cyrillic а inside Latin word
         (2, "чистый русский текст здесь"),    # pure Cyrillic: clean
         (3, "english text then русский текст"),  # bilingual BETWEEN words
         (4, "plain english only")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in mixed_script_stats(docs).collect()}
    assert got[1]["is_suspect"] is True and got[1]["n_mixed_tokens"] >= 1
    assert got[2]["is_suspect"] is False and got[2]["n_latin"] == 0
    # bilingual prose switches scripts between words -> clean
    assert got[3]["is_suspect"] is False
    assert got[3]["n_latin"] > 0 and got[3]["n_cyrillic"] > 0
    assert got[4]["n_cyrillic"] == 0 and got[4]["is_suspect"] is False


# ------------------------------------------------------------------ #
# label separation matrix (X119)
# ------------------------------------------------------------------ #

def test_label_separation_orders_cluster_distances(spark):
    from docling_serve_spark.operators.similarity import label_separation

    embs = spark.createDataFrame(
        [(0, [0.0, 0.0]), (0, [0.2, 0.0]),     # centroid (100, 0) milli
         (1, [0.1, 0.0]), (1, [0.3, 0.0]),     # centroid (200, 0): close
         (2, [5.0, 5.0]), (2, [5.0, 5.0])],    # far cluster
        "label int, embedding array<float>",
    )
    got = {(r["label_a"], r["label_b"]): r
           for r in label_separation(embs).collect()}
    assert got[(0, 1)]["l1_milli"] == 100          # confusable pair
    assert got[(0, 2)]["l1_milli"] == 9900         # |0-5000|+|0-5000| - 100
    assert got[(0, 2)]["l1_milli"] > got[(0, 1)]["l1_milli"]
    assert got[(0, 1)]["n_a"] == 2 and got[(0, 1)]["n_b"] == 2
    assert len(got) == 3                           # C(3,2) pairs


# ------------------------------------------------------------------ #
# URL-path date mining (X120)
# ------------------------------------------------------------------ #

def test_url_date_profile_mines_both_forms_and_validates(spark):
    from docling_serve_spark.operators.urltools import url_date_profile

    pages = spark.createDataFrame(
        [("http://n.com/news/2023/07/15/story",),
         ("http://n.com/post-2022-05-20-title",),
         ("http://n.com/2023/13/40/not-a-date",),   # bad month/day
         ("http://n.com/archive/2023-02-31-x",),    # regex-valid, calendar-invalid
         ("http://n.com/plain/page",)],
        "url string",
    )
    [r] = url_date_profile(pages).collect()
    assert r["n_urls"] == 5 and r["n_dated"] == 2
    assert r["dated_bp"] == 4000
    assert str(r["min_date"]) == "2022-05-20"
    assert str(r["max_date"]) == "2023-07-15"


# ------------------------------------------------------------------ #
# intra-label dispersion (X121)
# ------------------------------------------------------------------ #

def test_label_dispersion_separates_pile_from_spread(spark):
    from docling_serve_spark.operators.similarity import label_dispersion

    embs = spark.createDataFrame(
        [(1, 0, [0.5, 0.5]), (2, 0, [0.5, 0.5]),      # duplicate pile
         (3, 1, [0.0, 0.0]), (4, 1, [1.0, 1.0])],     # spread cluster
        "vec_id bigint, label int, embedding array<float>",
    )
    got = {r["label"]: r for r in label_dispersion(embs).collect()}
    assert got[0]["mean_l1_milli"] == 0
    assert got[0]["min_l1_milli"] == got[0]["max_l1_milli"] == 0
    # label 1 centroid (500, 500); each member is 500+500 away
    assert got[1]["mean_l1_milli"] == 1000
    assert got[1]["n_vecs"] == 2


# ------------------------------------------------------------------ #
# corpus-derived stopwords (X122)
# ------------------------------------------------------------------ #

def test_stopword_discovery_learns_corpus_function_words(spark):
    from docling_serve_spark.operators.textstats import stopword_discovery

    docs = spark.createDataFrame(
        [(i, f"der artikel nummer w{i} hier") for i in range(10)]
        + [(100, "der sonderfall")],
        "doc_id bigint, text string",
    )
    got = {r["token"]: r for r in
           stopword_discovery(docs, df_threshold_bp=5000).collect()}
    # 'der' in 11/11 docs, the others in 10/11 — all above 50%
    assert got["der"]["rank"] == 1 and got["der"]["df"] == 11
    assert got["der"]["df_bp"] == 10000
    assert set(got) == {"der", "artikel", "nummer", "hier"}
    # per-doc distinct: repeated tokens inside one doc count once
    assert got["artikel"]["df"] == 10
    # unique w{i} tokens never clear the threshold
    assert "w3" not in got


# ------------------------------------------------------------------ #
# anchor-text spam density (X123)
# ------------------------------------------------------------------ #

def test_anchor_spam_stats_flags_money_anchors(spark):
    from docling_serve_spark.operators.webgraph import anchor_spam_stats

    def page(url, links):
        html = "".join(f'<a href="{u}">{t}</a>' for u, t in links)
        return (url, bytearray(html.encode()))

    rows = [
        page("http://a.com/1", [("https://victim.com/x", "best CASINO bonus"),
                                ("https://victim.com/y", "online casino")]),
        page("http://b.com/1", [("https://victim.com/z", "research paper"),
                                ("https://clean.com/q", "useful article")]),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r["dst_host"]: r for r in
           anchor_spam_stats(pages, ["casino", "viagra"]).collect()}
    v = got["victim.com"]
    assert v["n_anchor_links"] == 3 and v["n_spam_links"] == 2
    assert v["n_spam_src_hosts"] == 1          # both spam anchors from a.com
    assert v["spam_bp"] == 6666
    assert got["clean.com"]["n_spam_links"] == 0
    assert got["clean.com"]["spam_bp"] == 0


# ------------------------------------------------------------------ #
# packing fragmentation/padding audit (X124)
# ------------------------------------------------------------------ #

def test_packing_audit_counts_boundary_fragments(spark):
    from docling_serve_spark.operators.sampling import (
        pack_sequences,
        packing_audit,
    )

    # shard 0: 3 docs of 40 tokens into seq_len 64 -> doc 2 spans the
    # first boundary (starts at 40, ends at 79)
    docs = spark.createDataFrame(
        [(0, "w " * 40), (16, "w " * 40), (32, "w " * 40)],
        "doc_id bigint, text string",
    )
    packed = pack_sequences(docs, seq_len=64, n_shards=16)
    [r] = packing_audit(packed, seq_len=64).collect()
    assert r["shard"] == 0 and r["n_docs"] == 3
    assert r["total_tokens"] == 120 and r["n_bins"] == 2
    # doc@40 spans 64; doc@80 ends at 119 inside bin 1 -> 1 fragment
    assert r["n_fragmented"] == 1
    assert r["frag_bp"] == 3333
    assert r["padding_tokens"] == 8 and r["padding_bp"] == 625


# ------------------------------------------------------------------ #
# structured-data coverage (X125)
# ------------------------------------------------------------------ #

def test_structured_data_stats_coverage_and_top_type(spark):
    from docling_serve_spark.operators.pagemeta import structured_data_stats

    def page(url, html):
        return (url, bytearray(html.encode()))

    ld = ('<script type="application/ld+json">'
          '{"@type": "Product", "name": "x"}</script>')
    rows = [
        page("http://shop.com/1", f"<html>{ld}</html>"),
        page("http://shop.com/2", f"<html>{ld}{ld}</html>"),
        page("http://shop.com/3",
             '<html><div itemscope itemtype="s"></div>'
             '<script type="application/ld+json">'
             '{"@type" : "Article"}</script></html>'),
        page("http://plain.com/1", "<html><p>nothing</p></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r["host"]: r for r in structured_data_stats(pages).collect()}
    s = got["shop.com"]
    assert s["n_pages"] == 3 and s["n_jsonld"] == 3
    assert s["n_microdata"] == 1
    assert s["jsonld_bp"] == 10000
    assert s["top_type"] == "Product" and s["top_type_n"] == 3
    p = got["plain.com"]
    assert p["n_jsonld"] == 0 and p["top_type"] == "" and p["top_type_n"] == 0


# ------------------------------------------------------------------ #
# invisible-character audit (X126)
# ------------------------------------------------------------------ #

def test_invisible_char_stats_density_verdict(spark):
    from docling_serve_spark.operators.normalize import invisible_char_stats

    zwsp = "​"
    docs = spark.createDataFrame(
        [(1, f"c{zwsp}l{zwsp}o{zwsp}a{zwsp}k{zwsp}e{zwsp}d"),  # watermarked
         (2, "an emoji joiner ‍ once " + "w" * 5000),      # legit, sparse
         (3, "perfectly plain text")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in invisible_char_stats(docs).collect()}
    assert got[1]["n_invisible"] == 6 and got[1]["is_suspect"] is True
    assert got[2]["n_invisible"] == 1 and got[2]["is_suspect"] is False
    assert got[3]["n_invisible"] == 0 and got[3]["invisible_per_10k"] == 0


# ------------------------------------------------------------------ #
# filter-agreement cross-tab (X127)
# ------------------------------------------------------------------ #

def test_filter_agreement_confusion_counts(spark):
    from docling_serve_spark.operators.corpus import filter_agreement

    a = spark.createDataFrame(
        [(1, True), (2, True), (3, False), (4, False)],
        "doc_id bigint, keep boolean",
    )
    b = spark.createDataFrame(
        [(1, True), (2, False), (3, False), (4, True)],
        "doc_id bigint, keep boolean",
    )
    [r] = filter_agreement(a, b, "gopher", "c4").collect()
    assert (r["gate_a"], r["gate_b"]) == ("gopher", "c4")
    assert r["n_both_keep"] == 1 and r["n_both_drop"] == 1
    assert r["n_only_a"] == 1 and r["n_only_b"] == 1
    assert r["keep_a_bp"] == 5000 and r["keep_b_bp"] == 5000
    assert r["agreement_bp"] == 5000


# ------------------------------------------------------------------ #
# link-rot / frontier-debt audit (X128)
# ------------------------------------------------------------------ #

def test_link_rot_stats_resolution_shares(spark):
    from docling_serve_spark.operators.webgraph import link_rot_stats

    def page(url, hrefs):
        html = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return (url, bytearray(html.encode()))

    pages = spark.createDataFrame(
        [page("http://a.com/1",
              ["https://b.com/x", "http://gone.com/y",
               "HTTPS://www.b.com/x/"]),     # variant resolves too
         page("http://c.com/1", ["https://b.com/x"])],
        "url string, html binary",
    )
    crawled = spark.createDataFrame(
        [("https://b.com/x",), ("http://a.com/1",), ("http://c.com/1",)],
        "url string",
    )
    got = {r["src_host"]: r for r in
           link_rot_stats(pages, crawled).collect()}
    a = got["a.com"]
    assert a["n_outlinks"] == 3 and a["n_resolved"] == 2
    assert a["n_dangling"] == 1 and a["rot_bp"] == 3333
    assert got["c.com"]["rot_bp"] == 0


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    # "aaa" contains the pair "aa" TWICE per occurrence (Sennrich
    # counts every adjacent position); 3 occurrences -> 6. "ab"
    # occurs twice -> 2. Hapax "zq" dies at min_count; 1-char "a"
    # contributes nothing.
    from docling_serve_spark.operators.textstats import bpe_pair_stats

    docs = spark.createDataFrame(
        [(1, "aaa ab a zq"), (2, "aaa ab"), (3, "aaa a")],
        "doc_id bigint, text string",
    )
    got = {r["pair"]: (r["n_pairs"], r["n_types"])
           for r in bpe_pair_stats(docs, k=10, min_count=2).collect()}
    assert got == {"aa": (6, 1), "ab": (2, 1)}


def test_bpe_top_pair_is_first_merge(spark):
    from docling_serve_spark.operators.textstats import bpe_pair_stats

    docs = spark.createDataFrame(
        [(1, "lower lower lowest newer newer newer")],
        "doc_id bigint, text string",
    )
    rows = bpe_pair_stats(docs, k=3, min_count=1).collect()
    # "er" rides lower(2) + lowest? no — lowest has no "er"; newer
    # has TWO "er"? "newer": ne-ew-we-er -> one "er". er total =
    # 2 (lower) + 3 (newer) = 5; "ne"/"ew" = 3 each, "lo"/"ow" =
    # 2+1 = 3 each, "we" = 2+1+3 = 6 -> top pair is "we"
    assert rows[0]["pair"] == "we" and rows[0]["n_pairs"] == 6
    assert rows[0]["rank"] == 1


def test_host_prior_shrinks_small_hosts_not_large(spark):
    # big host: 9000/10000 keeps; tiny host: 0/2 keeps. Global rate
    # ~0.9 -> the tiny host's prior lands near the corpus rate while
    # the big host keeps its own.
    from docling_serve_spark.operators.corpus import host_quality_prior

    v = spark.createDataFrame(
        [("big.com", i < 9000) for i in range(10000)]
        + [("tiny.com", False), ("tiny.com", False)],
        "host string, keep boolean",
    )
    got = {r["host"]: r for r in host_quality_prior(v, pseudo_count=20).collect()}
    big, tiny = got["big.com"], got["tiny.com"]
    assert big["raw_bp"] == 9000
    # global = 9000/10002 keeps -> 8998 bp
    assert big["global_bp"] == 8998
    # big barely moves: (10^4*9000 + 20*8998) div 10020 = 8999
    assert big["prior_bp"] == 8999
    assert tiny["raw_bp"] == 0
    # tiny pulled to (0 + 20*8998) div 22 = 8180
    assert tiny["prior_bp"] == 8180


def test_host_prior_converges_to_raw_with_zero_pseudo(spark):
    from docling_serve_spark.operators.corpus import host_quality_prior

    v = spark.createDataFrame(
        [("a.com", True), ("a.com", False), ("b.com", True)],
        "host string, keep boolean",
    )
    rows = host_quality_prior(v, pseudo_count=0).collect()
    assert all(r["prior_bp"] == r["raw_bp"] for r in rows)


def test_vocab_coverage_good_turing_hapax_mass(spark):
    # en: tokens = [a a b c] -> 4 tokens, 3 types, 2 hapax ->
    # unseen mass 5000 bp, TTR 7500 bp. fr: all-hapax -> 10000 bp.
    from docling_serve_spark.operators.textstats import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a b", "en"), (2, "c", "en"), (3, "un deux", "fr")],
        "doc_id bigint, text string, lang string",
    )
    got = {r["lang"]: r for r in vocab_coverage(docs).collect()}
    en = got["en"]
    assert (en["n_tokens"], en["n_types"], en["n_hapax"]) == (4, 3, 2)
    assert en["gt_unseen_bp"] == 5000 and en["ttr_bp"] == 7500
    fr = got["fr"]
    assert fr["gt_unseen_bp"] == 10000 and fr["ttr_bp"] == 10000


def test_render_required_flags_spa_and_script_dominated(spark):
    from docling_serve_spark.operators.pagemeta import render_required_stats

    long_text = "word " * 100  # 500 chars of real server-side text
    pages = spark.createDataFrame(
        [
            # SPA shell: empty mount + script, ~0 text -> required
            ("http://a.com/1",
             b'<html><div id="root"></div><script>var x;</script></html>'),
            # script-heavy but text survives server-side -> NOT required
            ("http://a.com/2",
             ("<html><script>" + "j" * 2000 + "</script><p>"
              + long_text + "</p></html>").encode()),
            # script-dominated, tiny text -> required via share rule
            ("http://b.com/3",
             ("<html><script>" + "j" * 2000 + "</script><p>hi</p></html>")
             .encode()),
            # plain article -> NOT required
            ("http://b.com/4",
             ("<html><p>" + long_text + "</p></html>").encode()),
        ],
        "url string, html binary",
    )
    got = {r["host"]: r for r in render_required_stats(pages).collect()}
    assert got["a.com"]["n_render_required"] == 1
    assert got["a.com"]["n_pages"] == 2
    assert got["b.com"]["n_render_required"] == 1
    assert got["b.com"]["render_bp"] == 5000


def test_render_required_unclosed_script_counts_as_text(spark):
    # an unclosed <script> falls through the strip -> its body counts
    # as text (documented tradeoff; identical in both engines)
    from docling_serve_spark.operators.pagemeta import render_required_stats

    pages = spark.createDataFrame(
        [("http://c.com/1", ("<html><script>" + "z" * 500).encode())],
        "url string, html binary",
    )
    r = render_required_stats(pages).collect()[0]
    assert r["n_render_required"] == 0 and r["script_share_bp"] == 0


def test_delta_chain_classes_against_time_order(spark):
    from docling_serve_spark.operators.urltools import delta_chain_stats

    caps = spark.createDataFrame(
        [
            # u1 chain: novel (first), identical, 1-bit delta, big jump
            ("u1", 1, 100, "h.com"),
            ("u1", 2, 100, "h.com"),
            ("u1", 3, 101, "h.com"),
            ("u1", 4, 100 ^ 0xFF00, "h.com"),
            # u2: single capture -> novel
            ("u2", 1, 7, "h.com"),
        ],
        "url string, ts bigint, simhash bigint, host string",
    )
    r = delta_chain_stats(caps).collect()[0]
    assert (r["n_captures"], r["n_identical"], r["n_delta"],
            r["n_novel"]) == (5, 1, 1, 3)
    assert r["identical_bp"] == 2000 and r["delta_bp"] == 2000


def test_delta_chain_is_time_ordered_not_setwise(spark):
    # a capture identical to an OLD one but not the previous one is
    # NOT delta-encodable in a streaming archive: the chain walks
    # consecutive pairs only (X58 covers the set-wise case)
    from docling_serve_spark.operators.urltools import delta_chain_stats

    caps = spark.createDataFrame(
        [("u", 1, 5, "h"), ("u", 2, 5 ^ 0xFF0, "h"), ("u", 3, 5, "h")],
        "url string, ts bigint, simhash bigint, host string",
    )
    r = delta_chain_stats(caps).collect()[0]
    assert r["n_identical"] == 0 and r["n_novel"] == 3


def test_readability_fk_formula_fixed_point(spark):
    from docling_serve_spark.operators.textstats import readability_stats

    # "the cat sat. it ran." -> 5 words, 2 sentences, 5 vowel groups
    # wps = 2500, spw = 1000, fk = (2500*390 + 1000*11800)//1000
    #       - 15590 = 12775 - 15590 = -2815
    docs = spark.createDataFrame(
        [(1, "the cat sat. it ran.", "en")],
        "doc_id bigint, text string, lang string",
    )
    r = readability_stats(docs).collect()[0]
    assert (r["wps_milli"], r["spw_milli"]) == (2500, 1000)
    assert r["fk_milli"] == -2815 and r["hard_bp"] == 0


def test_readability_flags_hard_text(spark):
    from docling_serve_spark.operators.textstats import readability_stats

    # one endless sentence of polysyllabic words -> grade far past 12
    hard = " ".join(["onomatopoeia"] * 40)
    docs = spark.createDataFrame(
        [(1, hard, "en"), (2, "a dog. a cat.", "en")],
        "doc_id bigint, text string, lang string",
    )
    r = readability_stats(docs).collect()[0]
    assert r["hard_bp"] == 5000


def test_table_mining_separates_relational_from_layout(spark):
    from docling_serve_spark.operators.pagemeta import table_mining_stats

    rel = ("<table><tr><td>a</td><td>b</td></tr>"
           "<tr><td>1</td><td>2</td></tr></table>")
    onecol = ("<table><tr><td>nav</td></tr><tr><td>foot</td></tr>"
              "</table>")
    header_only = "<table><tr><th>x</th><th>y</th></tr></table>"
    pages = spark.createDataFrame(
        [
            ("http://t.com/1", f"<html>{rel}</html>".encode()),
            ("http://t.com/2", f"<html>{onecol}{header_only}</html>".encode()),
            ("http://t.com/3", b"<html><p>no tables</p></html>"),
        ],
        "url string, html binary",
    )
    r = table_mining_stats(pages).collect()[0]
    assert (r["n_pages"], r["n_tables"], r["n_mineable"]) == (3, 3, 1)
    assert r["mineable_bp"] == 3333
    assert r["pages_with_mineable_bp"] == 3333


def test_bitext_url_pairs_mine_lang_path_twins(spark):
    from docling_serve_spark.operators.bitext import bitext_url_pairs

    pages = spark.createDataFrame(
        [
            ("http://x.com/en/article-1",),
            ("http://x.com/fr/article-1",),
            ("http://x.com/de/article-1",),
            ("http://x.com/en/other",),       # no twin -> no pair
            ("http://y.com/fr/article-1",),   # other host: never pairs
            ("http://x.com/about",),          # no lang segment
        ],
        "url string",
    )
    rows = bitext_url_pairs(pages).collect()
    got = {(r["lang_a"], r["lang_b"]) for r in rows
           if r["path_key"] == "/*/article-1" and r["host"] == "x.com"}
    assert got == {("de", "en"), ("de", "fr"), ("en", "fr")}
    assert all(r["host"] in ("x.com",) or r["path_key"] != "/*/article-1"
               or False for r in rows)
    assert len(rows) == 3  # y.com's lone fr page pairs with nothing


def test_bitext_url_pairs_dedups_within_language(spark):
    # two en variants of the same key must not multiply the pairs
    from docling_serve_spark.operators.bitext import bitext_url_pairs

    pages = spark.createDataFrame(
        [("http://x.com/en/p",), ("http://x.com/en/p?b",),
         ("http://x.com/fr/p",)],
        "url string",
    )
    rows = bitext_url_pairs(pages).collect()
    assert len(rows) == 1 and rows[0]["url_a"].endswith("/en/p")


def test_apportion_quotas_sum_exactly_to_budget(spark):
    from docling_serve_spark.operators.frontier import apportion_budget

    w = spark.createDataFrame(
        [("a", 3), ("b", 3), ("c", 1)], "host string, weight bigint"
    )
    rows = apportion_budget(w, budget=10).collect()
    got = {r["host"]: r["quota"] for r in rows}
    # 30/7 = 4 rem 2 (a, b), 10/7 = 1 rem 3 (c): bases 4,4,1 leave
    # one slot, and c's remainder 3 is the largest -> c gets it
    assert got == {"a": 4, "b": 4, "c": 2}
    assert sum(got.values()) == 10


def test_apportion_zero_leftover_and_dominant_host(spark):
    from docling_serve_spark.operators.frontier import apportion_budget

    w = spark.createDataFrame(
        [("big", 9000), ("tiny", 1000)], "host string, weight bigint"
    )
    got = {r["host"]: r["quota"]
           for r in apportion_budget(w, budget=100).collect()}
    assert got == {"big": 90, "tiny": 10}


def test_soft404_title_body_and_long_mention(spark):
    from docling_serve_spark.operators.pagemeta import soft404_stats

    long_doc = ("<title>Guide</title><p>An error 404 means the "
                "resource is missing. " + "filler words here. " * 50
                + "</p>")
    pages = spark.createDataFrame(
        [
            ("http://h.com/1",
             b"<html><title>404 Not Found... page not found</title></html>"),
            ("http://h.com/2",
             b"<html><title>x</title><p>This page no longer exists.</p></html>"),
            ("http://h.com/3", f"<html>{long_doc}</html>".encode()),
            ("http://h.com/4",
             b"<html><title>news</title><p>all fine</p></html>"),
        ],
        "url string, html binary",
    )
    r = soft404_stats(pages).collect()[0]
    assert (r["n_pages"], r["n_soft404"], r["soft404_bp"]) == (4, 2, 5000)


def test_consent_contamination_counts_hits_and_docs(spark):
    from docling_serve_spark.operators.corpus import consent_contamination

    docs = spark.createDataFrame(
        [("h.com", "real text. We use cookies to improve things. "
                   "Accept all cookies now."),
         ("h.com", "clean article"),
         ("h.com", "Cookie Policy at the footer")],
        "host string, text string",
    )
    r = consent_contamination(docs).collect()[0]
    assert (r["n_docs"], r["n_contaminated"]) == (3, 2)
    assert r["contaminated_bp"] == 6666
    # 3 total hits over 3 docs -> 1000 milli
    assert r["mean_hits_milli"] == 1000


def test_paywall_declared_vs_marker_channels(spark):
    from docling_serve_spark.operators.pagemeta import paywall_stats

    pages = spark.createDataFrame(
        [
            ("http://p.com/1",
             b'<html>{"isAccessibleForFree": false}<p>t</p></html>'),
            ("http://p.com/2",
             b"<html><p>Subscribe to continue reading.</p></html>"),
            ("http://p.com/3", b"<html><p>free and open</p></html>"),
        ],
        "url string, html binary",
    )
    r = paywall_stats(pages).collect()[0]
    assert (r["n_declared"], r["n_marker"], r["n_paywalled"]) == (1, 1, 2)
    assert r["paywalled_bp"] == 6666


def test_amp_variants_resolved_vs_frontier_debt(spark):
    from docling_serve_spark.operators.pagemeta import amp_variant_stats

    pages = spark.createDataFrame(
        [
            # canonical declaring a crawled twin
            ("http://a.com/x",
             b'<html><head><link rel="amphtml" href="http://a.com/amp/x">'
             b"</head></html>"),
            ("http://a.com/amp/x", "<html ⚡><body>t</body></html>".encode()),
            # canonical declaring a twin that was never fetched
            ("http://a.com/y",
             b'<html><head><link rel="amphtml" href="http://a.com/amp/y">'
             b"</head></html>"),
        ],
        "url string, html binary",
    )
    r = amp_variant_stats(pages).collect()[0]
    assert (r["n_pages"], r["n_amp_pages"]) == (3, 1)
    assert (r["n_declared_pairs"], r["n_resolved_pairs"]) == (2, 1)


def test_canary_scan_reports_zeros_and_multi_hits(spark):
    from docling_serve_spark.operators.decontam import canary_scan

    guid_a = "aaaaaaaa-1111-4222-8333-444444444444"
    guid_b = "bbbbbbbb-5555-4666-8777-888888888888"
    docs = spark.createDataFrame(
        [(1, f"leaked file with {guid_a} and again {guid_a}"),
         (2, f"another doc {guid_a}"),
         (3, "clean document")],
        "doc_id bigint, text string",
    )
    cans = spark.createDataFrame([(guid_a,), (guid_b,)], "canary string")
    got = {r["canary"]: (r["n_docs"], r["n_hits"])
           for r in canary_scan(docs, cans).collect()}
    assert got[guid_a] == (2, 3)
    assert got[guid_b] == (0, 0)  # the attestation row


def test_canary_scan_escapes_regex_metacharacters(spark):
    from docling_serve_spark.operators.decontam import canary_scan

    weird = "canary(v2).[test]"
    docs = spark.createDataFrame(
        [(1, "contains canary(v2).[test] literally"),
         (2, "canaryXv2YZ-test should NOT match")],
        "doc_id bigint, text string",
    )
    cans = spark.createDataFrame([(weird,)], "canary string")
    got = canary_scan(docs, cans).collect()[0]
    assert (got["n_docs"], got["n_hits"]) == (1, 1)


def test_crawl_growth_classes_and_churn(spark):
    from docling_serve_spark.operators.relational import crawl_growth_report

    old = spark.createDataFrame(
        [("http://g.com/keep", "f1"), ("http://g.com/change", "f2"),
         ("http://g.com/gone", "f3")],
        "url string, fingerprint string",
    )
    new = spark.createDataFrame(
        [("http://g.com/keep", "f1"), ("http://g.com/change", "f2x"),
         ("http://g.com/fresh", "f4")],
        "url string, fingerprint string",
    )
    r = crawl_growth_report(old, new).collect()[0]
    assert (r["n_old"], r["n_new"]) == (3, 3)
    assert (r["n_added"], r["n_removed"], r["n_changed"],
            r["n_unchanged"]) == (1, 1, 1, 1)
    assert r["churn_bp"] == 10000  # 3 of max(3,3) urls churned


def test_bad_neighborhood_subdomain_and_distinct_dst(spark):
    from docling_serve_spark.operators.webgraph import bad_neighborhood_stats

    edges = spark.createDataFrame(
        [("s.com", "bad.net"),        # blocked apex
         ("s.com", "cdn.bad.net"),    # blocked subdomain
         ("s.com", "ok.org"),
         ("s.com", "ok.org"),         # duplicate edge: counted once
         ("clean.com", "ok.org")],
        "src_host string, dst_host string",
    )
    bl = spark.createDataFrame([("bad.net",)], "domain string")
    got = {r["src_host"]: r
           for r in bad_neighborhood_stats(edges, bl).collect()}
    s = got["s.com"]
    assert (s["n_dst_hosts"], s["n_bad_hosts"]) == (3, 2)
    assert s["bad_bp"] == 6666
    assert got["clean.com"]["bad_bp"] == 0


def test_ensemble_sweep_cumulative_from_top(spark):
    from docling_serve_spark.operators.corpus import ensemble_scores

    flags = spark.createDataFrame(
        [(1, True, True), (2, True, False), (3, False, False),
         (4, True, True)],
        "doc_id bigint, a boolean, b boolean",
    )
    rows = ensemble_scores(flags, {"a": 2, "b": 1}).collect()
    got = [(r["score"], r["n_docs"], r["cum_docs"], r["cum_share_bp"])
           for r in rows]
    # scores: 3,3 -> 2 docs; 2 -> 1; 0 -> 1
    assert got == [(3, 2, 2, 5000), (2, 1, 3, 7500), (0, 1, 4, 10000)]


def test_code_switch_detects_script_runs(spark):
    from docling_serve_spark.operators.textstats import code_switch_stats

    docs = spark.createDataFrame(
        [(1, "hello world\nмир и труд\nback to english", "en"),
         (2, "pure english\nmore english", "en"),
         (3, "مرحبا\nبالعالم", "ar")],
        "doc_id bigint, text string, lang string",
    )
    got = {r["lang"]: r for r in code_switch_stats(docs).collect()}
    en = got["en"]
    # doc 1: latin->cyrillic->latin = 2 transitions, 2 scripts
    assert (en["n_docs"], en["n_switched"]) == (2, 1)
    assert en["switched_bp"] == 5000
    assert en["mean_trans_milli"] == 1000  # 2 transitions / 2 docs
    # pure-arabic doc never flags
    assert got["ar"]["n_switched"] == 0


def test_mixture_ess_degenerate_vs_uniform(spark):
    from docling_serve_spark.operators.sampling import mixture_ess

    uniform = spark.createDataFrame(
        [(0.25,)] * 4, "q_sampled double"
    )
    r = mixture_ess(uniform).collect()[0]
    assert r["n_groups"] == 4
    assert r["ess_milli"] == 4000        # ESS = n for uniform weights
    assert r["ess_share_bp"] == 10000

    degenerate = spark.createDataFrame(
        [(0.97,), (0.01,), (0.01,), (0.01,)], "q_sampled double"
    )
    d = mixture_ess(degenerate).collect()[0]
    assert d["ess_milli"] < 1100         # collapsed onto one group
    assert d["ess_share_bp"] < 2700


def test_length_quantiles_bin_bounds(spark):
    from docling_serve_spark.operators.corpus import length_quantiles

    # 9 docs of length 5 (bin 3, hi 7) + 1 of length 1000 (bin 10,
    # hi 1023): p50/p90 land in the small bin, p99 in the big one
    docs = spark.createDataFrame(
        [(i, "x" * 5, "en") for i in range(9)]
        + [(9, "y" * 1000, "en")],
        "doc_id bigint, text string, lang string",
    )
    r = length_quantiles(docs).collect()[0]
    assert r["n_docs"] == 10
    assert r["p50_hi"] == 7
    assert r["p90_hi"] == 7
    assert r["p99_hi"] == 1023


def test_license_signals_cc_beats_arr_marker(spark):
    from docling_serve_spark.operators.pagemeta import license_signal_stats

    pages = spark.createDataFrame(
        [
            ("http://l.com/1",
             b'<a href="https://creativecommons.org/licenses/by-sa/4.0/">x</a>'),
            ("http://l.com/2",
             b'<a href="https://creativecommons.org/licenses/by-sa/4.0/">x</a>'),
            # a CC declaration coexisting with boilerplate ARR text:
            # the explicit license wins, not the footer
            ("http://l.com/3",
             b"All rights reserved "
             b'<a href="https://creativecommons.org/licenses/by/4.0/">y</a>'),
            ("http://l.com/4", b"<footer>All Rights Reserved</footer>"),
            ("http://l.com/5", b"<p>nothing</p>"),
        ],
        "url string, html binary",
    )
    r = license_signal_stats(pages).collect()[0]
    assert (r["n_pages"], r["n_open"], r["n_restrictive"]) == (5, 3, 1)
    assert r["open_bp"] == 6000
    assert r["top_license"] == "by-sa"


def test_merge_postings_replace_delete_passthrough(spark):
    """X158: a delta doc REPLACES its base postings wholesale (tf is
    not summed), deleted ids vanish, untouched docs pass through."""
    from docling_serve_spark.operators.retrieval import (
        build_postings, merge_postings,
    )

    base = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "c c c")],
        "doc_id bigint, text string",
    )
    # doc 1 re-extracted: 'a' now appears ONCE (replace, not add);
    # doc 4 is new; doc 3 disappeared from the crawl
    delta = spark.createDataFrame(
        [(1, "a d"), (4, "d d")], "doc_id bigint, text string"
    )
    deleted = spark.createDataFrame([(3,)], "doc_id bigint")
    bp, bd = build_postings(base)
    dp, dd = build_postings(delta)
    mp, md = merge_postings(bp, bd, dp, dd, deleted_ids=deleted)
    postings = {(r["term"], r["doc_id"]): r["tf"] for r in mp.collect()}
    assert postings == {
        ("a", 1): 1, ("d", 1): 1,          # replaced, not tf-summed
        ("b", 2): 1, ("c", 2): 1,          # passed through
        ("d", 4): 2,                       # new doc
    }
    doclens = {r["doc_id"]: r["dl"] for r in md.collect()}
    assert doclens == {1: 2, 2: 2, 4: 2}


def test_merge_postings_null_text_delta_scrubs_base(spark):
    """X158: a delta doc whose re-extraction produced NO tokens (NULL
    text — the page failed extraction this crawl) has no delta_doclens
    row, so the changed set must come from the delta's raw id set
    (changed_ids); its stale base postings and doc-length must NOT
    survive the merge."""
    from docling_serve_spark.operators.retrieval import (
        build_postings, merge_postings,
    )

    base = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id bigint, text string"
    )
    delta = spark.createDataFrame(
        [(1, None)], "doc_id bigint, text string"
    )
    bp, bd = build_postings(base)
    dp, dd = build_postings(delta)
    mp, md = merge_postings(bp, bd, dp, dd,
                            changed_ids=delta.select("doc_id"))
    assert {(r["term"], r["doc_id"]) for r in mp.collect()} == {
        ("b", 2), ("c", 2)
    }
    assert {r["doc_id"]: r["dl"] for r in md.collect()} == {2: 2}
    # without changed_ids the stale entries would survive — pin the
    # documented fallback so the fixture proves the failure mode
    mp0, md0 = merge_postings(bp, bd, dp, dd)
    assert ("a", 1) in {(r["term"], r["doc_id"]) for r in mp0.collect()}


def test_curriculum_schedule_straddle_split(spark):
    """X159 hand case: total 10 tokens, boundaries b1=5 b2=8. Score
    bucket 1 (cum 0->4) assigns wholesale to phase 1; bucket 2
    (4->7) straddles b1 — doc 3 (cum 5 <= b1) stays phase 1, doc 4
    (cum 7) moves to phase 2; bucket 3 (7->10) straddles b2 — doc 5
    (cum 8 <= b2) lands phase 2, doc 6 phase 3."""
    from docling_serve_spark.operators.sampling import curriculum_schedule

    docs = spark.createDataFrame(
        [(1, 1, "w w"), (2, 1, "w w"), (3, 2, "w"),
         (4, 2, "w w"), (5, 3, "w"), (6, 3, "w w")],
        "doc_id bigint, score bigint, text string",
    )
    out = {r["phase"]: (r["n_docs"], r["n_tokens"],
                        r["score_min"], r["score_max"])
           for r in curriculum_schedule(docs).collect()}
    assert out == {1: (3, 5, 1, 2), 2: (2, 3, 2, 3), 3: (1, 2, 3, 3)}


def test_curriculum_schedule_boundary_aligned_bucket(spark):
    """X159: a bucket whose cum_start lands EXACTLY on a phase
    boundary still straddles — a zero-token doc ordered first in it
    has per-doc cum == b and the inclusive rule (phase k while
    cum <= b_k) keeps it in the earlier phase. total=10, b=5; the
    score-2 bucket spans 5->10, its empty doc 2 stays phase 1."""
    import pytest

    from docling_serve_spark.operators.sampling import curriculum_schedule

    docs = spark.createDataFrame(
        [(1, 1, "w w w w w"), (2, 2, ""), (3, 2, "w w w w w")],
        "doc_id bigint, score bigint, text string",
    )
    out = {r["phase"]: (r["n_docs"], r["n_tokens"])
           for r in curriculum_schedule(docs, phase_bp=(5000, 5000))
           .collect()}
    assert out == {1: (2, 5), 2: (1, 5)}
    with pytest.raises(ValueError, match="10000"):
        curriculum_schedule(docs, phase_bp=(5000, 3000))


def test_balanced_trainset_minority_cap_and_boundary_bucket(spark):
    """X160: per group each class keeps exactly the minority count,
    chosen by Knuth-hash priority. n_buckets=2 forces the fr-neg cut
    INSIDE a bucket (cum 1 < m=2 < 3), exercising the boundary-rank
    path; priorities hand-computed as (id*2654435761) mod 2^32."""
    from docling_serve_spark.operators.sampling import balanced_trainset

    rows = (
        [(i, "en", "pos") for i in (1, 2, 3)] + [(4, "en", "neg")]
        + [(5, "de", "pos")] + [(i, "de", "neg") for i in (6, 7)]
        + [(i, "fr", "pos") for i in (8, 16)]
        + [(i, "fr", "neg") for i in (9, 10, 11)]
    )
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, label string")
    got = {(r["grp"], r["label"], r["doc_id"])
           for r in balanced_trainset(docs, group_col="lang",
                                      n_buckets=2).collect()}
    assert got == {
        ("en", "pos", 2), ("en", "neg", 4),      # en: m=1, pri(2) lowest
        ("de", "pos", 5), ("de", "neg", 7),      # de: m=1, pri(7) < pri(6)
        ("fr", "pos", 8), ("fr", "pos", 16),     # fr: m=2, both pos kept
        ("fr", "neg", 10), ("fr", "neg", 9),     # bucket-0 wholesale + rank-1
    }


def test_nb_quality_score_hand_case(spark):
    """X161 hand case: B=8192, 'good'(x2, pos) vs 'bad'(x2, neg),
    equal priors. w_good = floor(ln((2+1)/(2+B)) - ln(1/(2+B)))*1e6
    = floor(ln 3 * 1e6) = 1098612; w_bad symmetric = -1098613 (floor
    of the negative); prior = floor(ln 1) = 0. Unlabeled doc 3 is
    still scored ('good' -> positive)."""
    from docling_serve_spark.operators.langmodel import nb_quality_score

    docs = spark.createDataFrame(
        [(1, "good good"), (2, "bad bad"), (3, "good")],
        "doc_id bigint, text string",
    )
    labels = spark.createDataFrame(
        [(1, "pos"), (2, "neg")], "doc_id bigint, label string"
    )
    got = {r["doc_id"]: (r["n_features"], r["score_micro"], r["is_pos"])
           for r in nb_quality_score(docs, labels).collect()}
    assert got == {
        1: (2, 2197224, True),
        2: (2, -2197226, False),
        3: (1, 1098612, True),
    }


def test_epoch_allocation_waterfill(spark):
    """X162: A (n=50, w=8000) saturates its 4-epoch cap first (r=250 <
    r=3000); its unused budget re-spreads to B, which gets
    (400*2000*1e6) div (2000*150) = 2666666 micro-epochs (< cap).
    Budget = 200 tokens * 3.0."""
    from docling_serve_spark.operators.sampling import epoch_allocation

    srcs = spark.createDataFrame(
        [("A", 50, 8000), ("B", 150, 2000)],
        "source string, n_tokens bigint, weight_bp bigint",
    )
    got = {r["source"]: (r["capped"], r["epochs_micro"], r["alloc_tokens"])
           for r in epoch_allocation(srcs, budget_ratio_bp=30000).collect()}
    assert got == {"A": (True, 4000000, 200), "B": (False, 2666666, 399)}


def test_epoch_allocation_no_caps(spark):
    """X162 uncapped case: equal sources, budget 3x corpus -> everyone
    gets exactly 3.0 epochs and the full proportional share."""
    from docling_serve_spark.operators.sampling import epoch_allocation

    srcs = spark.createDataFrame(
        [("A", 100, 5000), ("B", 100, 5000)],
        "source string, n_tokens bigint, weight_bp bigint",
    )
    got = {r["source"]: (r["capped"], r["epochs_micro"], r["alloc_tokens"])
           for r in epoch_allocation(srcs, budget_ratio_bp=30000).collect()}
    assert got == {"A": (False, 3000000, 300), "B": (False, 3000000, 300)}


def test_calibration_bins_hand_case(spark):
    """X163: scores 0..3 into 2 equal-width bins ((s*2) div 4); the
    upper bin is all-positive, the lower all-negative; avg is
    min-offset floor arithmetic."""
    from docling_serve_spark.operators.langmodel import calibration_bins

    scored = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2), (4, 3)],
        "doc_id bigint, score_micro bigint",
    )
    labels = spark.createDataFrame(
        [(1, "neg"), (2, "neg"), (3, "pos"), (4, "pos")],
        "doc_id bigint, label string",
    )
    got = [tuple(r) for r in
           calibration_bins(scored, labels, n_bins=2).collect()]
    assert got == [
        (0, 2, 0, 0, 0, 0, 1),
        (1, 2, 2, 10000, 2, 2, 3),
    ]


def test_host_lang_entropy_hand_case(spark):
    """X164: a.com 2en/2fr -> ln2 entropy (693147 micro, mixed);
    b.com 3en/1fr -> 562335 (under the 0.6-nat cut); c.com mono ->
    0. Dominant tie at a.com breaks to the smaller lang code."""
    from docling_serve_spark.operators.textstats import host_lang_entropy

    rows = (
        [("https://a.com/1", "en"), ("https://a.com/2", "en"),
         ("https://a.com/3", "fr"), ("https://a.com/4", "fr"),
         ("https://b.com/1", "en"), ("https://b.com/2", "en"),
         ("https://b.com/3", "en"), ("https://b.com/4", "fr")]
        + [(f"https://c.com/{i}", "en") for i in range(4)]
    )
    pages = spark.createDataFrame(rows, "url string, lang string")
    got = {r["host"]: (r["n_docs"], r["n_langs"], r["dominant_lang"],
                       r["dominant_bp"], r["entropy_micro"], r["is_mixed"])
           for r in host_lang_entropy(pages).collect()}
    assert got == {
        "a.com": (4, 2, "en", 5000, 693147, True),
        "b.com": (4, 2, "en", 7500, 562335, False),
        "c.com": (4, 1, "en", 10000, 0, False),
    }


def test_ai_optout_group_semantics(spark):
    """X165: stacked UA lines share a group — even blank-separated
    (RFC 9309 allows emptyline between startgrouplines, and real
    files do it); a UA line after a directive starts a new group;
    specific groups override '*'; empty Disallow allows; comment-only
    files match nothing."""
    from docling_serve_spark.operators.urltools import ai_optout

    bodies = [
        ("h0", "User-agent: *\nDisallow: /private\n\n"
               "User-agent: GPTBot\nDisallow: /"),
        ("h1", "User-agent: *\nDisallow: /"),
        ("h2", "User-agent: GPTBot\n\nUser-agent: CCBot\nDisallow: /\n\n"
               "User-agent: *\nAllow: /"),
        ("h3", "User-agent: CCBot\nDisallow:"),
        ("h4", "# nothing here\nSitemap: https://e/x.xml"),
        ("h5", "User-agent: Google-Extended\nCrawl-delay: 5\n"
               "Disallow: /\nUser-agent: Bytespider\nDisallow: /search"),
    ]
    robots = spark.createDataFrame(bodies, "host string, body string")
    got = {(r["host"], r["agent"]): (r["blocked"], r["via"])
           for r in ai_optout(robots).collect()}
    assert got[("h0", "gptbot")] == (True, "specific")
    assert got[("h0", "ccbot")] == (False, "wildcard")
    assert got[("h1", "anthropic-ai")] == (True, "wildcard")
    assert got[("h2", "gptbot")] == (True, "specific")
    assert got[("h2", "ccbot")] == (True, "specific")
    assert got[("h2", "claudebot")] == (False, "wildcard")
    assert got[("h3", "ccbot")] == (False, "specific")
    assert got[("h3", "gptbot")] == (False, "none")
    assert got[("h4", "gptbot")] == (False, "none")
    assert got[("h5", "google-extended")] == (True, "specific")
    assert got[("h5", "bytespider")] == (False, "specific")
    assert got[("h5", "ccbot")] == (False, "none")
    assert len(got) == 36


def test_interleave_audit_runs(spark):
    """X166: shard 0 delivers a,a,b,b,b,a; shard 1 delivers b,a —
    source a has runs (2,1,1), b has (3,1); runs never cross
    shards."""
    from docling_serve_spark.operators.sampling import interleave_audit

    rows = [(0, 1, "a"), (0, 2, "a"), (0, 3, "b"), (0, 4, "b"),
            (0, 5, "b"), (0, 6, "a"), (1, 1, "b"), (1, 2, "a")]
    delivery = spark.createDataFrame(
        rows, "shard bigint, pos bigint, source string"
    )
    got = {r["source"]: (r["n_items"], r["n_runs"], r["max_run"],
                         r["mean_run_x100"])
           for r in interleave_audit(delivery).collect()}
    assert got == {"a": (4, 3, 2, 133), "b": (4, 2, 3, 200)}


def test_dedup_scope_stats_intra_vs_cross(spark):
    """X167: group X spans snapshots (canonical in s1, so doc 2 is an
    intra-s1 dup and doc 3 a cross-s2 dup); group Z is wholly inside
    s2 (intra). Singleton doc 4 counts only toward n_docs."""
    from docling_serve_spark.operators.dedup import dedup_scope_stats

    rows = [(1, "s1", "x x"), (2, "s1", "X  x"), (3, "s2", "x x"),
            (4, "s2", "solo"), (5, "s2", "z"), (6, "s2", "Z ")]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, snapshot string, text string"
    )
    got = {r["snapshot"]: (r["n_docs"], r["n_dup_intra"], r["n_dup_cross"],
                           r["dup_intra_bp"], r["dup_cross_bp"])
           for r in dedup_scope_stats(docs).collect()}
    assert got == {"s1": (2, 1, 0, 5000, 0), "s2": (4, 1, 1, 2500, 2500)}


def test_optout_impact_token_weighting(spark):
    """X168: gptbot blocked only on the 900-token host -> 90% of
    tokens from 50% of hosts; ccbot blocked nowhere."""
    from docling_serve_spark.operators.urltools import optout_impact

    audit = spark.createDataFrame(
        [("big.com", "gptbot", True, "specific"),
         ("small.com", "gptbot", False, "none"),
         ("big.com", "ccbot", False, "none"),
         ("small.com", "ccbot", False, "none")],
        "host string, agent string, blocked boolean, via string",
    )
    toks = spark.createDataFrame(
        [("big.com", 900), ("small.com", 100)],
        "host string, n_tokens bigint",
    )
    got = {r["agent"]: (r["n_hosts"], r["n_hosts_blocked"],
                        r["tokens_blocked"], r["token_share_bp"])
           for r in optout_impact(audit, toks).collect()}
    assert got == {"gptbot": (2, 1, 900, 9000), "ccbot": (2, 0, 0, 0)}


def test_bin_provenance_span_intersection(spark):
    """X169: L=4; doc 1 occupies [0,6) (bins 0-1), doc 2 [6,9)
    (bins 1-2). Probing bin 1 returns doc 1's tail span [4,6) and
    doc 2's head span [0,2); bin 0 returns doc 1's [0,4) alone."""
    from docling_serve_spark.operators.sampling import bin_provenance

    packed = spark.createDataFrame(
        [(1, 0, 6, 0, 0), (2, 0, 3, 1, 2)],
        "doc_id bigint, shard bigint, n_tokens bigint, "
        "bin_id bigint, offset_in_bin bigint",
    )
    probes = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 0)], "shard bigint, bin_id bigint"
    )
    got = {(r["shard"], r["bin_id"], r["doc_id"]):
           (r["tok_from"], r["tok_to"], r["n_tokens_in_bin"])
           for r in bin_provenance(packed, probes, seq_len=4).collect()}
    assert got == {
        (0, 0, 1): (0, 4, 4),
        (0, 1, 1): (4, 6, 2),
        (0, 1, 2): (0, 2, 2),
    }


def test_extract_diff_flip_change_and_coverage(spark):
    """X170: u1 unchanged, u2 text changed (+2 chars), u3 status flip
    only, u4 removed in new, u5 added in new — per-format counters and
    the signed length delta."""
    from docling_serve_spark.operators.relational import extract_diff

    old = spark.createDataFrame(
        [("u1", "html", "success", "same"),
         ("u2", "html", "success", "aa"),
         ("u3", "pdf", "success", "p"),
         ("u4", "pdf", "success", "gone")],
        "url string, doc_type string, status string, extracted_text string",
    )
    new = spark.createDataFrame(
        [("u1", "html", "success", "same"),
         ("u2", "html", "success", "aaBB"),
         ("u3", "pdf", "failure", "p"),
         ("u5", "pdf", "success", "new")],
        "url string, doc_type string, status string, extracted_text string",
    )
    got = {r["doc_type"]: (r["n_old"], r["n_new"], r["n_common"],
                           r["n_status_flips"], r["n_text_changed"],
                           r["text_change_bp"], r["sum_len_delta"])
           for r in extract_diff(old, new).collect()}
    assert got == {
        "html": (2, 2, 2, 0, 1, 5000, 2),
        "pdf": (2, 2, 1, 1, 0, 0, 0),
    }


def test_zipf_fit_two_class_hand_case(spark):
    """X172: vocabulary {w:4, x:1, y:1, z:1} -> two count classes,
    class c=4 at midrank 1 (x=0) and c=1 at midrank 3; weighted LS
    slope = -ln4/ln3 -> alpha_milli 1261, and a two-point weighted
    fit is exact (r2_milli 1000). floor(1000*(-num/den)) verified
    against the same IEEE ops in plain Python."""
    from docling_serve_spark.operators.textstats import zipf_fit

    docs = spark.createDataFrame(
        [(1, "w w x"), (2, "w w y z")], "doc_id bigint, text string"
    )
    row = zipf_fit(docs).collect()[0]
    assert (row["n_tokens"], row["n_terms"], row["n_classes"]) == (7, 4, 2)
    assert row["alpha_milli"] == 1261
    assert row["r2_milli"] == 1000


def test_heaps_fit_linear_growth_hand_case(spark):
    """X173: four docs, each one brand-new word -> V grows exactly
    linearly in N; at k=2 the cut points give (N,V) = (3,3),(4,4),
    so the log-log slope is exactly 1 (identical x/y integer sums)."""
    from docling_serve_spark.operators.textstats import heaps_fit

    docs = spark.createDataFrame(
        [(i, f"w{i}") for i in range(1, 5)], "doc_id bigint, text string"
    )
    row = heaps_fit(docs, n_points=2).collect()[0]
    assert (row["n_docs"], row["n_terms"], row["n_points"]) == (4, 4, 2)
    assert row["beta_milli"] == 1000
    assert row["r2_milli"] == 1000


def test_dedup_threshold_sweep_flat_identical_pair(spark):
    """X174: one verbatim duplicate pair (Jaccard 10000) and one
    unrelated doc -> every grid threshold sees exactly 1 pair / 2
    docs, and the grid covers 3000..10000 by 500."""
    from docling_serve_spark.operators.dedup import dedup_threshold_sweep

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"),
         (3, "q r s t u v w x")],
        "doc_id bigint, text string",
    )
    rows = dedup_threshold_sweep(docs).collect()
    assert [r["threshold_bp"] for r in rows] == list(range(3000, 10001, 500))
    assert all((r["n_pairs"], r["n_docs"]) == (1, 2) for r in rows)


def test_compaction_plan_atomic_binning(spark):
    """X175: target 100 — files land wholly in the group where their
    cumulative start falls, so groups exceed target by at most one
    file; sub-half-target inputs are counted as the small files the
    compaction absorbs."""
    from docling_serve_spark.operators.sampling import compaction_plan

    files = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 30), (4, 120), (5, 10)],
        "file_id bigint, n_bytes bigint",
    )
    got = {r["group_id"]: (r["n_files"], r["group_bytes"], r["n_small"],
                           r["utilization_bp"])
           for r in compaction_plan(files, target_bytes=100).collect()}
    assert got == {0: (2, 120, 0, 12000), 1: (2, 150, 1, 15000),
                   2: (1, 10, 1, 1000)}


def test_compaction_plan_partition_scoped(spark):
    """X175: with part_col set the prefix sum restarts per partition —
    compaction never merges across partitions."""
    from docling_serve_spark.operators.sampling import compaction_plan

    files = spark.createDataFrame(
        [("a", 1, 90), ("a", 2, 90), ("b", 3, 90), ("b", 4, 90)],
        "chunk string, file_id bigint, n_bytes bigint",
    )
    got = {(r["chunk"], r["group_id"]): r["n_files"]
           for r in compaction_plan(files, target_bytes=100,
                                    part_col="chunk").collect()}
    assert got == {("a", 0): 2, ("b", 0): 2}


def test_stratified_holdout_hamilton_and_hash_rank(spark):
    """X176: N=10, budget=6 -> floor shares (en 3, fr 1, de 1) leave
    one seat; fr has the largest remainder (.8) and takes it. Members
    are the smallest Knuth-hash priorities per stratum (n_buckets=2
    exercises the boundary-rank path)."""
    from docling_serve_spark.operators.sampling import stratified_holdout

    rows = ([(i, "en") for i in (1, 2, 3, 4, 5)]
            + [(i, "fr") for i in (6, 7, 8)]
            + [(i, "de") for i in (9, 10)])
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    got = {(r["stratum"], r["doc_id"])
           for r in stratified_holdout(docs, budget=6,
                                       n_buckets=2).collect()}
    # en m=3: pris rank 5,2,4; fr m=2: 7,6; de m=1: 10
    assert got == {("en", 5), ("en", 2), ("en", 4),
                   ("fr", 7), ("fr", 6), ("de", 10)}


def test_oov_rate_fallback_cost(spark):
    """X177: vocab {the, cat}; 'the cat zzz' -> 1 OOV of 3 chars ->
    oov 3333bp, fallback pieces = 2 + 3 = 5 -> 16666bp; fully-covered
    fr doc stays at 10000bp."""
    from docling_serve_spark.operators.textstats import oov_rate

    docs = spark.createDataFrame(
        [(1, "en", "the cat zzz"), (2, "fr", "the the")],
        "doc_id bigint, lang string, text string",
    )
    vocab = spark.createDataFrame([("the",), ("cat",)], "word string")
    got = {r["lang"]: (r["n_tokens"], r["n_oov"], r["oov_bp"],
                       r["n_oov_chars"], r["fallback_fertility_bp"])
           for r in oov_rate(docs, vocab).collect()}
    assert got == {"en": (3, 1, 3333, 3, 16666), "fr": (2, 0, 0, 0, 10000)}


def test_quality_trend_perfect_line_and_degenerates(spark):
    """X178: pass rates 5000/7500/10000 over three snapshots fit a
    perfect 2500-bp/step line; a single snapshot has no fit (NULLs);
    a flat pair reads slope 0 with exact fit."""
    from docling_serve_spark.operators.corpus import quality_trend

    v = spark.createDataFrame(
        [("s1", i < 2) for i in range(4)]
        + [("s2", i < 3) for i in range(4)]
        + [("s3", True) for _ in range(4)],
        "snapshot string, keep boolean",
    )
    r = quality_trend(v).collect()[0]
    assert tuple(r) == (3, 5000, 10000, 2500000, 1000)

    one = spark.createDataFrame([("s1", True)], "snapshot string, keep boolean")
    r1 = quality_trend(one).collect()[0]
    assert (r1["slope_milli_bp"], r1["r2_milli"]) == (None, None)

    flat = spark.createDataFrame(
        [("s1", True), ("s2", True)], "snapshot string, keep boolean"
    )
    r2 = quality_trend(flat).collect()[0]
    assert (r2["slope_milli_bp"], r2["r2_milli"]) == (0, 1000)


def test_long_context_supply_threshold_shares(spark):
    """X179: source A (3, 10, 600 tokens) at thresholds 5/512 — the
    600-token doc carries 9787 bp of A's mass at 512; B never
    qualifies."""
    from docling_serve_spark.operators.sampling import long_context_supply

    docs = spark.createDataFrame(
        [("A", " ".join(["w"] * 3)), ("A", " ".join(["w"] * 10)),
         ("A", " ".join(["w"] * 600)), ("B", "w w w w")],
        "source string, text string",
    )
    got = {(r["source"], r["threshold"]):
           (r["n_docs_ge"], r["n_tokens_ge"], r["token_share_bp"])
           for r in long_context_supply(docs, thresholds=(5, 512)).collect()}
    assert got == {
        ("A", 5): (2, 610, 9951), ("A", 512): (1, 600, 9787),
        ("B", 5): (0, 0, 0), ("B", 512): (0, 0, 0),
    }


def test_host_categories_priority_and_default(spark):
    """X180: state.gov matches both 'gov' (priority 1) and the looser
    'news' pattern would not — priority decides when multiple rules
    hit; unmatched hosts fall to 'other'; shares are page-weighted."""
    from docling_serve_spark.operators.urltools import host_categories

    pages = spark.createDataFrame(
        [("https://state.gov/a",), ("https://state.gov/b",),
         ("https://daily-news.gov/x",),   # matches gov AND news
         ("https://citynews.com/y",),
         ("https://example.org/z",)],
        "url string",
    )
    rules = spark.createDataFrame(
        [("gov", r"\.gov$", 1), ("news", "news", 2)],
        "category string, pattern string, priority int",
    )
    got = {r["category"]: (r["n_hosts"], r["n_pages"], r["page_share_bp"])
           for r in host_categories(pages, rules).collect()}
    assert got == {
        "gov": (2, 3, 6000),      # state.gov(2) + daily-news.gov(1)
        "news": (1, 1, 2000),     # citynews.com
        "other": (1, 1, 2000),    # example.org
    }


def test_sentence_uniformity_detects_template(spark):
    """X181: five identical-length sentences -> dispersion 0, flagged;
    bursty lengths (1,9,2,12,4) -> D = (5*246-784)/(5*28) x100 = 318,
    not flagged; a two-sentence doc never flags regardless."""
    from docling_serve_spark.operators.textstats import sentence_uniformity

    uniform = ". ".join(["w w w w"] * 5) + "."
    bursty = ("w. w w w w w w w w w. w w. "
              "w w w w w w w w w w w w. w w w w.")
    short = "w w. w w."
    docs = spark.createDataFrame(
        [(1, uniform), (2, bursty), (3, short)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["n_sentences"], r["mean_len_x100"],
                         r["dispersion_x100"], r["is_uniform"])
           for r in sentence_uniformity(docs).collect()}
    assert got[1] == (5, 400, 0, True)
    assert got[2] == (5, 560, 318, False)
    assert got[3] == (2, 200, 0, False)


def test_markdown_structure_profile(spark):
    """X182: two H-levels, two list items, two table rows, one fence
    pair over 9 non-blank lines -> structure 10000*(2+2+2+2)/9."""
    from docling_serve_spark.operators.textstats import markdown_structure

    md = ("# Title\n\n## Section\n\nprose line here\n"
          "- item one\n* item two\n"
          "| a | b |\n| 1 | 2 |\n"
          "```\n```")
    docs = spark.createDataFrame([(1, md), (2, "plain prose only")],
                                 "doc_id bigint, md string")
    got = {r["doc_id"]: tuple(r)[1:] for r in
           markdown_structure(docs).collect()}
    assert got[1] == (2, 2, 2, 2, 2, 8888)
    assert got[2] == (0, 0, 0, 0, 0, 0)


def test_ngram_novelty_shares(spark):
    """X183: history = 'a b c d' (grams: abc, bcd). New doc 1 repeats
    it plus one new tail gram -> 2/3 seen, novelty 3333; doc 2 is
    fully novel (10000); doc 3 verbatim old (0)."""
    from docling_serve_spark.operators.dedup import ngram_novelty

    hist = spark.createDataFrame([(100, "a b c d")],
                                 "doc_id bigint, text string")
    new = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z w"), (3, "a b c d")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_bp"])
           for r in ngram_novelty(new, hist).collect()}
    assert got == {1: (3, 1, 3333), 2: (2, 2, 10000), 3: (2, 0, 0)}


def test_title_body_overlap_flags(spark):
    """X184: matching title (3/3 words found) passes; a clickbait
    title sharing only 1 of 7 content words flags; a 2-word title
    never flags regardless of overlap."""
    from docling_serve_spark.operators.pagemeta import title_body_overlap

    pages = spark.createDataFrame(
        [(1, "Solar panel installation", "guide to solar panel "
          "installation costs and permits"),
         (2, "You wont believe these shocking panel secrets",
          "boring panel specification datasheet table"),
         (3, "The cat", "dog stories only")],
        "doc_id bigint, title string, text string",
    )
    got = {r["doc_id"]: (r["n_title_words"], r["n_found"],
                         r["overlap_bp"], r["is_inconsistent"])
           for r in title_body_overlap(pages).collect()}
    assert got[1] == (3, 3, 10000, False)
    assert got[2] == (7, 1, 1428, True)
    assert got[3] == (2, 0, 0, False)


def test_keyword_stuffing_concentration_gates(spark):
    """X185: a 30x-repeated 3-word phrase -> top1 3334 bp, HHI 3334 bp,
    stuffed; 90 distinct words -> top1 111, HHI 111, clean; a 10-token
    doc is concentrated but under min_tokens -> never stuffed; empty
    text emits no row."""
    from docling_serve_spark.operators.textstats import keyword_stuffing

    stuffed = "buy cheap pills " * 30          # 90 tokens, 3 words
    varied = " ".join(f"w{i}" for i in range(90))
    short = "spam " * 10
    docs = spark.createDataFrame(
        [(1, stuffed), (2, varied), (3, short), (4, "  ")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["n_distinct"],
                         r["top1_share_bp"], r["hhi_bp"], r["stuffed"])
           for r in keyword_stuffing(docs).collect()}
    assert got[1] == (90, 3, 3333, 3333, True)
    assert got[2] == (90, 90, 111, 111, False)
    assert got[3] == (10, 1, 10000, 10000, False)  # under min_tokens
    assert 4 not in got


def test_vocab_drift_statuses(spark):
    """X186: 'zork' absent early and 6x late -> new (growth NULL);
    'wave' 1 early (of 20 tokens) vs 12 late (of 22) -> rising with
    growth = 10000*12*20 div (1*22) = 109090 bp; 'the' flat ->
    excluded; 'rare' late-only but under min_late -> excluded."""
    from docling_serve_spark.operators.textstats import vocab_drift

    early = [("early", "the the the the the the the the the wave"),
             ("early", "the the the the the the the the the the")]
    late = [("late", "the the zork zork zork wave wave wave wave wave"),
            ("late", "the zork zork zork wave wave wave wave "
                     "wave wave wave rare")]
    docs = spark.createDataFrame(early + late, "period string, text string")
    rows = {r["word"]: (r["n_early"], r["n_late"], r["growth_bp"],
                        r["status"])
            for r in vocab_drift(docs, min_late=5).collect()}
    assert rows["zork"] == (0, 6, None, "new")
    assert rows["wave"][0:2] == (1, 12)
    assert rows["wave"][3] == "rising"
    assert rows["wave"][2] == 109090
    assert "the" not in rows and "rare" not in rows


def test_lexicon_severity_tier_verdicts(spark):
    """X187: one tier-3 term -> drop regardless of density; three
    tier-1 hits in 40 tokens (750 bp at cut 150) -> drop; one tier-1
    hit in 100 tokens (100 bp) -> flag; clean text -> keep with zero
    counters; punctuation-attached terms don't match (token-exact)."""
    from docling_serve_spark.operators.corpus import lexicon_severity

    lex = spark.createDataFrame(
        [("viagra", 3), ("damn", 1), ("casino", 2)],
        "term string, severity int",
    )
    filler40 = " ".join(f"f{i}" for i in range(37))
    filler99 = " ".join(f"f{i}" for i in range(99))
    docs = spark.createDataFrame(
        [(1, filler99 + " viagra"),
         (2, filler40 + " damn damn damn"),
         (3, filler99 + " damn"),
         (4, filler99 + " plain"),
         (5, filler99 + " damn,")],   # punctuation-attached: no hit
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["n_hits"], r["n_hit_terms"], r["max_severity"],
                         r["sev_density_bp"], r["action"])
           for r in lexicon_severity(docs, lex).collect()}
    assert got[1] == (1, 1, 3, 300, "drop")
    assert got[2] == (3, 1, 1, 750, "drop")
    assert got[3] == (1, 1, 1, 100, "flag")
    assert got[4] == (0, 0, 0, 0, "keep")
    assert got[5] == (0, 0, 0, 0, "keep")


def test_confusable_hosts_skeleton_families(spark):
    """X189: digit homoglyphs, Cyrillic lookalikes, and inserted
    hyphens all fold to the true host's skeleton; unrelated hosts
    never group; single-spelling hosts are not emitted."""
    from docling_serve_spark.operators.urltools import confusable_hosts

    pages = spark.createDataFrame(
        [
            ("example.com",), ("example.com",),
            ("exampl3.com",),          # 3 -> e
            ("exаmple.com",),          # Cyrillic а
            ("ex-ample.com",),         # hyphen insertion
            ("PAYPAL.com",), ("paypa1.com",),  # case fold + 1 -> l
            ("lonely.org",),           # no variants -> filtered out
        ],
        "host string",
    )
    rows = {r["skeleton"]: r for r in confusable_hosts(pages).collect()}
    assert set(rows) == {"example.com", "paypal.com"}
    ex = rows["example.com"]
    assert ex["n_hosts"] == 4 and ex["n_docs"] == 5
    assert ex["hosts"] == (
        "ex-ample.com,exampl3.com,example.com,exаmple.com"
    )
    pp = rows["paypal.com"]
    assert pp["n_hosts"] == 2
    assert "PAYPAL.com" in pp["hosts"] and "paypa1.com" in pp["hosts"]


def test_kcore_peel_layers_hand_computed(spark):
    """X190: a triangle with a pendant tail — tail cascades inward
    one layer per round (t2 dies round 1, t1 round 2), the triangle
    itself survives k=2; an isolated edge dies in round 1 on both
    ends. Undirected + dedup'd + self-loops dropped."""
    from docling_serve_spark.operators import webgraph

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "a"),   # triangle: 2-core
            ("a", "t1"), ("t1", "t2"),            # pendant tail
            ("x", "y"),                           # isolated edge
            ("a", "a"),                           # self-loop (dropped)
            ("b", "a"),                           # reverse dup
        ],
        "src string, dst string",
    )
    rows = {r["host"]: r for r in
            webgraph.kcore_peel(edges, k=2, max_rounds=5).collect()}
    assert {h: r["peel_round"] for h, r in rows.items()} == {
        "a": -1, "b": -1, "c": -1, "t1": 2, "t2": 1, "x": 1, "y": 1,
    }
    assert rows["a"]["degree0"] == 3  # b, c, t1 (self-loop dropped)
    assert rows["a"]["in_core"] and not rows["t1"]["in_core"]
    assert all(r["converged"] for r in rows.values())

    # a schedule too short to finish must say so: a 9-node path at
    # k=2 needs 4 peel rounds; 2 rounds leave mid-path survivors that
    # are NOT core members, and converged=false flags exactly that
    path = spark.createDataFrame(
        [(f"p{i}", f"p{i+1}") for i in range(8)],
        "src string, dst string",
    )
    short = {r["host"]: r for r in
             webgraph.kcore_peel(path, k=2, max_rounds=2).collect()}
    assert not short["p4"]["converged"]
    assert short["p4"]["in_core"]  # outlived the schedule, unproven


def test_jl_distortion_audit_properties(spark):
    """X191: distortion is proj/orig L2 and obeys the structural
    facts — zero-distance pairs give NULL distortion (guarded
    division), a pair differing in ONE coordinate measures that
    coordinate's projection column norm, and for generic vectors the
    16-d projection lands within a sane multiplicative band."""
    from docling_serve_spark.operators import similarity

    dim = 64
    base = [0.0] * dim
    e0 = list(base)
    bump = list(base); bump[3] = 2.0   # differs from e0 in coord 3 only
    gen = [((i * 37 + 11) % 13 - 6) / 3.0 for i in range(dim)]
    rows = [(0, e0), (7, bump),        # pair (0,7): single-coord diff
            (1, gen), (8, gen),        # pair (1,8): identical -> od=0
            (2, gen), (9, e0)]         # pair (2,9): generic distance
    embeds = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    got = {r["vec_id_a"]: r for r in
           similarity.jl_distortion_audit(embeds).collect()}
    assert set(got) == {0, 1, 2}
    # identical vectors: orig_dist 0, distortion NULL (not a crash)
    assert got[1]["orig_dist"] == 0.0 and got[1]["distortion"] is None
    # single-coordinate pair: orig = |bump[3]| = 2; proj distance =
    # 2 * ||column 3 of the plane matrix|| / sqrt(16)
    import math
    col3 = [similarity._hyperplane(dim, 271, p)[3] for p in range(16)]
    expect = 2.0 * math.sqrt(sum(c * c for c in col3)) / 4.0
    assert abs(got[0]["proj_dist"] - expect) < 1e-5
    assert got[0]["orig_dist"] == 2.0
    # generic pair: JL keeps the ratio in a broad multiplicative band
    assert 0.2 < got[2]["distortion"] < 2.5


def test_char_entropy_bands(spark):
    """X192: repeated-char text scores 0 entropy (one bigram class),
    a near-uniform blob scores high, natural prose lands in the ok
    band; docs shorter than 2 chars are omitted."""
    from docling_serve_spark.operators.textstats import char_entropy

    import hashlib
    blob = "".join(hashlib.md5(f"x:{i}".encode()).hexdigest()
                   for i in range(8))[:256]
    docs = spark.createDataFrame(
        [
            (1, "z" * 300),
            (2, blob),
            (3, "the quick brown fox jumps over the lazy dog and "
                "keeps running through the quiet green field today"),
            (4, "a"),     # too short -> omitted
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["verdict"] == "low_entropy"
    assert got[1]["entropy_micro"] == 0 and got[1]["n_distinct"] == 1
    assert got[2]["verdict"] == "high_entropy"
    assert got[3]["verdict"] == "ok"
    assert got[3]["n_bigrams"] == 96  # 97-char prefix after norm


def test_effective_token_supply_discounts_cross_source_dups(spark):
    """X193: a text duplicated across two sources splits its token
    mass 1/2 to each; unique docs keep full weight; overhead is the
    bp share of raw tokens that dedup would reclaim."""
    from docling_serve_spark.operators.corpus import effective_token_supply

    docs = spark.createDataFrame(
        [
            ("s1", "alpha beta gamma delta"),       # unique, 4 tok
            ("s1", "shared wire story here"),       # dup x2, 4 tok
            ("s2", "shared wire story here"),
            ("s2", "one two three four five six"),  # unique, 6 tok
        ],
        "source string, text string",
    )
    got = {r["source"]: r
           for r in effective_token_supply(docs).collect()}
    s1 = got["s1"]
    # 4 full + 4/2 -> eff_bp = 40000 + 20000
    assert s1["n_tokens"] == 8 and s1["eff_tokens_bp"] == 60000
    assert s1["n_dup_docs"] == 1
    assert s1["dup_overhead_bp"] == 10000 - 60000 // 8
    s2 = got["s2"]
    assert s2["n_tokens"] == 10 and s2["eff_tokens_bp"] == 80000


def test_pagination_chains_stitches_parts_in_order(spark):
    """X194: a 3-part article chains root->1->2 with positions in
    part order; a standalone doc never enters a chain; the successor
    tiebreak picks the min doc_id when two docs share a head."""
    from docling_serve_spark.operators.pagemeta import pagination_chains

    docs = spark.createDataFrame(
        [
            (10, "story one begins here now bridge one part zero end"),
            (11, "bridge one part zero end middle keeps going on "
                 "bridge one part one end"),
            (12, "bridge one part one end closing remarks finish it"),
            (30, "totally unrelated standalone page about gardens"),
            # two docs share the head matching doc 40's tail: min wins
            (40, "intro text starts here soon shared seam token five"),
            (41, "soon shared seam token five continuation alpha beta"),
            (42, "soon shared seam token five continuation gamma delta"),
        ],
        "doc_id bigint, text string",
    )
    rows = sorted(
        map(tuple, pagination_chains(docs).collect()),
        key=lambda r: (r[0], r[1]),
    )
    assert (10, 0, 10, 3) in rows and (10, 1, 11, 3) in rows \
        and (10, 2, 12, 3) in rows
    assert not any(r[2] == 30 for r in rows)
    # 40's successor: min(41, 42) = 41; 42 never joins 40's chain
    assert (40, 1, 41, 2) in rows
    assert not any(r[0] == 40 and r[2] == 42 for r in rows)


def test_pagination_chains_cycle_guard(spark):
    """A seam cycle reachable from a root (mutual continue-reading
    boilerplate) must not re-emit its members: each doc appears at
    most once per root and the walk stops where the cycle closes."""
    from docling_serve_spark.operators.pagemeta import pagination_chains

    docs = spark.createDataFrame(
        [
            (1, "opening words lead in here cycle alpha beta gamma one"),
            (2, "cycle alpha beta gamma one middle cycle delta "
                "epsilon zeta two"),
            (3, "cycle delta epsilon zeta two back cycle alpha beta "
                "gamma one"),
        ],
        "doc_id bigint, text string",
    )
    rows = sorted(map(tuple, pagination_chains(docs).collect()))
    # root 1 walks 1 -> 2 -> 3; 3's tail points back at 2's head,
    # but 2 was already visited: chain stops at length 3
    assert rows == [(1, 0, 1, 3), (1, 1, 2, 3), (1, 2, 3, 3)]


def test_pii_risk_rollup_co_occurrence_tiers(spark):
    """X195: one host with an email+phone page (multi), one with a
    single-email page, one clean; rates integer-exact in bp."""
    from docling_serve_spark.operators.pii import pii_risk_rollup

    pages = spark.createDataFrame(
        [
            ("a.com", "reach me a@b.org or call +1 (555) 010-1234 ok"),
            ("a.com", "plain page no identifiers at all here"),
            ("b.com", "mail b@c.net for details"),
            ("c.com", "nothing sensitive on this page"),
        ],
        "host string, text string",
    )
    got = {r["host"]: r for r in pii_risk_rollup(pages).collect()}
    assert got["a.com"]["n_multi_docs"] == 1
    assert got["a.com"]["multi_rate_bp"] == 5000
    assert got["a.com"]["n_emails"] == 1 and got["a.com"]["n_phones"] == 1
    assert got["b.com"]["n_pii_docs"] == 1
    assert got["b.com"]["n_multi_docs"] == 0
    assert got["c.com"]["pii_rate_bp"] == 0


def test_contamination_weighted_rarity_dominates(spark):
    """X196: a doc sharing one RARE benchmark gram outscores a doc
    sharing only a corpus-ubiquitous gram; weights are integer
    micro-nats L(N)-L(df); clean docs report zeros."""
    from docling_serve_spark.operators.decontam import (
        contamination_weighted)

    common = "the quick brown fox jumps over"   # planted in many docs
    rare = "zeta functional analysis theorem proof sketch"
    rows = [(1, rare + " unrelated tail words here"),
            (2, common + " generic filler text one"),
            (3, "completely different content with no overlap here")]
    # 7 more docs all carrying the common gram -> high df
    rows += [(10 + i, common + f" filler variant {i} pad") for i in range(7)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [(rare + " and " + common,)], "text string")
    got = {r["doc_id"]: r
           for r in contamination_weighted(
               docs, bench, k=6, flag_micro=2_000_000).collect()}
    import math
    n = len(rows)
    l = lambda x: math.floor(math.log(x) * 1_000_000)  # noqa: E731
    assert got[1]["weight_micro"] == l(n) - l(1)  # df(rare)=1
    # doc 2's only possible hits are common-gram hits (df=8)
    assert 0 < got[2]["weight_micro"] < got[1]["weight_micro"]
    assert got[3]["weight_micro"] == 0
    assert not got[3]["contaminated_weighted"]
    # at the test's flag cut, only the rare-gram doc fires
    assert got[1]["contaminated_weighted"]
    assert not got[2]["contaminated_weighted"]


def test_dom_skeletons_group_by_shape_not_text(spark):
    """X197: same template + different text -> one skeleton; closing
    tags and tag case don't split families; distinct structures
    stay apart."""
    from docling_serve_spark.operators.pagemeta import dom_skeletons

    pages = spark.createDataFrame(
        [
            ("<html><body><p>alpha</p></body></html>", "a.com"),
            ("<HTML><BODY><P>totally other words</P></BODY></HTML>",
             "b.com"),
            ("<html><body><div>x</div></body></html>", "a.com"),
        ],
        "html string, host string",
    )
    rows = sorted(dom_skeletons(pages).collect(),
                  key=lambda r: -r["n_docs"])
    assert len(rows) == 2
    top = rows[0]
    assert top["n_docs"] == 2 and top["n_hosts"] == 2
    assert top["share_bp"] == 6666
    assert top["example_host"] == "a.com"


def test_int8_quant_audit_bounds_and_identity(spark):
    """X198: a vector quantizes to itself when its values are exact
    multiples of max/127 (cos_err 0); generic pairs keep cosine
    within a small error; zero vectors are excluded (no scale)."""
    from docling_serve_spark.operators import similarity

    exact = [127.0, -127.0] + [0.0] * 62      # multiples of s=1.0
    gen1 = [((i * 31 + 7) % 17 - 8) / 5.0 for i in range(64)]
    gen2 = [((i * 13 + 3) % 19 - 9) / 4.0 for i in range(64)]
    rows = [(0, exact), (11, exact),
            (1, gen1), (12, gen2),
            (2, [0.0] * 64), (13, gen1)]      # zero vec -> pair dropped
    embeds = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    got = {r["vec_id_a"]: r
           for r in similarity.int8_quant_audit(embeds).collect()}
    assert set(got) == {0, 1}       # pair (2,13) dropped: zero scale
    assert got[0]["cos_err"] == 0.0 and got[0]["cos_orig"] == 1.0
    assert got[1]["cos_err"] < 0.01  # absmax int8 keeps cosine tight


def test_allocation_fairness_gini_extremes(spark):
    """X199: a perfectly uniform allocation scores gini 0; full
    concentration on one key out of four approaches the (n-1)/n
    bound; shares are integer bp."""
    from docling_serve_spark.operators.frontier import allocation_fairness

    uniform = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 5), ("d", 5)],
        "host string, n_fetches bigint",
    )
    u = allocation_fairness(uniform).collect()[0]
    assert u["gini_bp"] == 0 and u["max_share_bp"] == 2500

    skewed = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0), ("d", 100)],
        "host string, n_fetches bigint",
    )
    s = allocation_fairness(skewed).collect()[0]
    # G = (n-1)/n = 0.75 exactly when one key holds everything
    assert s["gini_bp"] == 7500
    assert s["max_share_bp"] == 10000
    assert s["top_decile_share_bp"] == 10000  # top-1 of 4 keys


def test_embedding_outliers_kth_nn(spark):
    """X201: an isolated point scores its distance to the cluster
    while cluster members score intra-cluster distances; sampled
    points exclude themselves; the k-th index clamps when the sample
    is smaller than k."""
    from docling_serve_spark.operators.similarity import (
        embedding_outliers)

    # cluster at origin (ids 0,17,34 are the sample: % 17 == 0)
    base = [0.0] * 64
    far = [10.0] * 64
    rows = [(0, base), (17, base), (34, base), (1, base), (2, far)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    got = {r["vec_id"]: r
           for r in embedding_outliers(emb, k=5,
                                       outlier_dist=3.0).collect()}
    # sample = {0, 17, 34}; point 2's nearest sample dist = 80
    assert got[2]["kth_nn_dist"] == 80.0 and got[2]["is_outlier"]
    # cluster members: all sample dists are 0 (self excluded)
    assert got[1]["kth_nn_dist"] == 0.0 and not got[1]["is_outlier"]
    assert got[0]["kth_nn_dist"] == 0.0  # scored vs the OTHER two


def test_host_reputation_fusion_verdicts(spark):
    """X202: a central high-quality host keeps, a mutual-link farm
    pair drops despite centrality (spam penalty), an uncrawled host
    (in graph, no pages) earns quality 0."""
    from docling_serve_spark.operators import webgraph

    edges = spark.createDataFrame(
        # a,b,c,d all point at hub; farm pair f1<->f2 only swap links
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"),
         ("f1", "f2"), ("f2", "f1"), ("a", "b")],
        "src string, dst string",
    )
    pages = spark.createDataFrame(
        [("hub", True), ("hub", True), ("a", True), ("b", False),
         ("f1", True), ("f2", True)],
        "host string, is_quality boolean",
    )
    # the 2-cycle farm recirculates rank into the MAX centrality (a
    # classic spider trap), so the spam weight must dominate for the
    # fusion to drop it — exactly the policy choice the explicit
    # weight parameters exist for
    got = {r["host"]: r
           for r in webgraph.host_reputation(
               edges, pages, w_central=3000, w_quality=2000,
               w_spam=5000, keep_cut=3500, review_cut=1500).collect()}
    assert got["hub"]["verdict"] == "keep"
    assert got["f1"]["centrality_bp"] == 10000  # the trap, measured
    assert got["f1"]["reciprocal_bp"] == 10000
    assert got["f1"]["verdict"] == "drop"
    assert got["a"]["verdict"] == "review"
    # 'c' has no pages: quality 0; 'b' has a page that fails the gate
    assert got["c"]["quality_bp"] == 0
    assert got["b"]["quality_bp"] == 0
    # negative fusion clamps at zero, never engine-divergent division
    assert all(r["score_bp"] >= 0 for r in got.values())
