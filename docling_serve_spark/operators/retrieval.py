"""Lexical retrieval over the corpus: BM25 top-k.

Training-data pipelines run lexical retrieval against the corpus for
benchmark decontamination (find documents matching an eval-set probe
before n-gram flagging), targeted quality audits ("show me the top
documents for this query"), and seed-set expansion for domain
classifiers. BM25 is the standard scoring function (Robertson &
Walker, SIGIR 1994; the Okapi TREC-3 formulation with the usual
k1/b parametrization).

Integer-exactness: BM25's term contribution is
``idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``. With rational
parameters k1 = 6/5 and b = 3/4 and avgdl = L/N (L = corpus token
count, N = doc count), the contribution rewrites exactly as

    idf_micro * tf * 44 * L  div  (20*L*tf + 6*L + 18*dl*N)

— a single int64 integer division once idf is fixed in micro-nat
units (round(1e6 * ln(1 + (N-df+0.5)/(df+0.5))), one rounding per
TERM, never per row). Per-(doc,term) contributions are bigints, so
the per-doc score is an integer SUM — bit-reproducible across
engines and partitionings (same discipline as the char-LM scores).
int64 headroom: idf_micro*tf*44*L stays below 2^63 up to roughly
L ≈ 10^10 tokens at tf ≤ 100; past that, drop the idf scale to 1e3
(documented trade, same plan).

Scale shape: one narrow tokenize+explode, the tf branch filters to
the query's terms AT THE EXPLODE (the only rows that survive are
candidate postings — a handful of terms, so the filter kills ~all
rows before any shuffle); doc-length is one partial-agg groupBy the
corpus needs anyway; the totals row and per-term idf are broadcast
(≤ |query| rows); top-k is TakeOrderedAndProject (never a global
sort). No text moves after the explode.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from docling_serve_spark.operators.dedup import tokens


def build_postings(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """(postings, doclens) — the inverted index as two tables:
    ``postings (term, doc_id, tf)`` and ``doclens (doc_id, dl)``.
    Build ONCE per corpus snapshot, persist as parquet partitioned/
    bucketed by term, and every subsequent query (X42 BM25, X84
    phrase verification, decontamination probes) reads postings for
    its handful of terms via partition pruning instead of
    re-tokenizing 100 TB of text — the index/query split every
    retrieval engine makes, expressed as plain tables
    (`jobs/index.py` is the build entrypoint). Both aggregations are
    map-side combinable; the shuffle carries (term, doc_id) pairs,
    never text."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    doclens = toks.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("dl")
    )
    return postings, doclens


def bm25_from_index(postings: DataFrame, doclens: DataFrame,
                    query_terms: Sequence[str], k: int = 10) -> DataFrame:
    """BM25 top-k over a PREBUILT index (build_postings' tables) —
    the query-time half: identical arithmetic, tie rule, and output
    schema as ``bm25_topk`` (which delegates here), but the corpus
    text is never touched; a term-partitioned postings store prunes
    the scan to the query's terms."""
    id_col = "doc_id"
    terms = sorted(set(query_terms))
    dl = doclens.select(F.col(id_col), F.col("dl").cast("bigint"))
    totals = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    tf = postings.filter(F.col("term").isin(terms)).select(
        id_col, "term", F.col("tf").cast("bigint")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "idf_micro",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.lit(1000000.0)
            ).cast("bigint"),
        )
        .withColumn(
            "contrib",
            F.expr(
                "(idf_micro * tf * 44 * total_len) div "
                "(20 * total_len * tf + 6 * total_len + 18 * dl * n_docs)"
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("contrib").cast("bigint").alias("score_micro"),
        F.count("*").cast("int").alias("n_terms_matched"),
    )
    top = agg.orderBy(F.col("score_micro").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def bm25_topk(docs: DataFrame, query_terms: Sequence[str], k: int = 10,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, score_micro, n_terms_matched, rank) — the ``k``
    highest-BM25 documents for a bag of query terms, rank ties broken
    by ascending id (deterministic). Delegates to the index-form pair
    (build_postings + bm25_from_index), so inline and indexed
    execution are the same plan by construction."""
    postings, doclens = build_postings(docs, text_col, id_col)
    out = bm25_from_index(postings, doclens, query_terms, k)
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out


def merge_postings(
    base_postings: DataFrame,
    base_doclens: DataFrame,
    delta_postings: DataFrame,
    delta_doclens: DataFrame,
    deleted_ids: DataFrame | None = None,
    changed_ids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Upsert a re-extraction delta into a prebuilt index (the
    incremental-maintenance half of `jobs/index.py`: at 10^12 docs an
    index is never rebuilt from scratch — each crawl snapshot merges
    its changed pages in). Semantics are SCD-1 at DOC grain, like the
    warehouse upsert (X34): every doc present in the delta REPLACES
    its base postings and doc-length wholesale (a re-extracted page's
    old term list is stale — term frequencies cannot be summed across
    extractions), docs absent from the delta pass through unchanged,
    and ``deleted_ids`` (pages gone from the new crawl) are dropped
    without replacement. Scale shape: two left-anti equi-joins on
    doc_id (the delta's id set is crawl-delta-sized, so AQE broadcasts
    it) + a union — no postings text, no full-index shuffle; the
    term-partitioned layout is restored at write time by the caller's
    ``repartition(term)``, touching only files whose terms changed.

    ``changed_ids``: the delta's RAW doc-id set. Pass it whenever the
    delta can contain docs whose re-extracted text tokenizes to
    NOTHING (NULL/empty text — a page that failed extraction this
    crawl): such docs have no delta_doclens row, so inferring the
    changed set from delta_doclens would silently leave their stale
    base postings and doc-length in place, violating
    replace-wholesale. When omitted, falls back to delta_doclens'
    ids (sufficient only if every delta doc tokenizes)."""
    changed = (changed_ids if changed_ids is not None
               else delta_doclens).select("doc_id")
    if deleted_ids is not None:
        changed = changed.unionByName(
            deleted_ids.select("doc_id")
        ).distinct()
    kept_p = base_postings.join(changed, "doc_id", "left_anti")
    kept_d = base_doclens.join(changed, "doc_id", "left_anti")
    return (
        kept_p.unionByName(delta_postings.select(*kept_p.columns)),
        kept_d.unionByName(delta_doclens.select(*kept_d.columns)),
    )


def phrase_topk(docs: DataFrame, phrase_terms: Sequence[str], k: int = 10,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_matches, rank) — exact-phrase search via POSITIONAL
    postings (the phrase-query evaluation of every inverted-index
    engine; Manning/Raghavan/Schütze, IIR 2008 §2.4): documents where
    ``phrase_terms`` occur as consecutive tokens, ranked by occurrence
    count. Pipelines use it where bag-of-words BM25 is too loose —
    exact-quote decontamination probes, boilerplate-phrase audits,
    attribution checks.

    Evaluation: a position list per (doc, term) — built from ONE
    posexplode whose ``isin`` filter on the phrase's terms runs AT the
    explode, so only candidate postings survive (a handful of terms ≈
    zero rows at corpus scale) — then ``len(phrase)-1`` equi-joins on
    doc_id (inner: a doc missing any term cannot match) and one
    codegen'd array pass counting start positions ``p`` where every
    slot ``i`` has ``p+i`` in its position list. No text moves after
    the explode; position lists are sorted for determinism; top-k is
    TakeOrderedAndProject with (n_matches DESC, doc_id ASC) ties.
    Duplicate terms in the phrase reuse the same posting list, and
    overlapping matches count separately ("a a a" matches "a a"
    twice) — the standard positional-intersection semantics."""
    from functools import reduce

    terms = [str(t) for t in phrase_terms]
    if len(terms) < 2:
        raise ValueError("phrase_topk needs at least two terms")
    toks = docs.select(
        id_col, F.posexplode(tokens(F.col(text_col))).alias("pos", "term")
    )
    posting = (
        toks.filter(F.col("term").isin(sorted(set(terms))))
        .groupBy(id_col, "term")
        .agg(F.array_sort(F.collect_list("pos")).alias("positions"))
    )
    cur = posting.filter(F.col("term") == terms[0]).select(
        id_col, F.col("positions").alias("p0")
    )
    for i, t in enumerate(terms[1:], start=1):
        cur = cur.join(
            posting.filter(F.col("term") == t).select(
                id_col, F.col("positions").alias(f"p{i}")
            ),
            id_col,
        )
    n_matches = F.size(
        F.filter(
            F.col("p0"),
            lambda p: reduce(
                lambda a, b: a & b,
                [
                    F.array_contains(F.col(f"p{i}"), p + F.lit(i))
                    for i in range(1, len(terms))
                ],
            ),
        )
    ).cast("bigint")
    agg = cur.select(id_col, n_matches.alias("n_matches")).filter(
        F.col("n_matches") > 0
    )
    top = agg.orderBy(
        F.col("n_matches").desc(), F.col(id_col).asc()
    ).limit(k)
    w = Window.orderBy(F.col("n_matches").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def rrf_fuse(lex: DataFrame, sem: DataFrame, k: int = 10,
             c: int = 60, id_col: str = "doc_id") -> DataFrame:
    """X206 — reciprocal-rank fusion of a lexical and a semantic
    top-k list (Cormack/Clarke/Buettcher, SIGIR 2009): score(d) =
    sum over lists of 1/(c + rank_d).  The standard way to combine
    BM25 (X42) with embedding ANN (X6) in a hybrid retrieval stack —
    ranks, not raw scores, so the two incomparable score scales never
    need calibration.

    Integer discipline: contributions are ``1_000_000 // (c + rank)``
    (bigint floor division — engine-exact), absent-from-list
    contributes 0.  Ties broken by ascending id.

    Scale shape: both inputs are k-row top-k lists (driver-scale by
    construction — the expensive work happened inside the retrieval
    legs), so the fusion is a full-outer join of two tiny DataFrames;
    at 10^12 docs this plan is unchanged because k never grows with
    the corpus."""
    l = lex.select(F.col(id_col), F.col("rank").alias("lex_rank"))
    s = sem.select(F.col(id_col), F.col("rank").alias("sem_rank"))
    fused = l.join(s, id_col, "full_outer").select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.col("lex_rank").cast("int").alias("lex_rank"),
        F.col("sem_rank").cast("int").alias("sem_rank"),
        (
            F.coalesce(
                F.expr(f"1000000 div ({c} + lex_rank)").cast("bigint"),
                F.lit(0).cast("bigint"),
            )
            + F.coalesce(
                F.expr(f"1000000 div ({c} + sem_rank)").cast("bigint"),
                F.lit(0).cast("bigint"),
            )
        ).alias("rrf_micro"),
    )
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col(id_col).asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def proximity_topk(docs: DataFrame, query_terms: Sequence[str],
                   window: int = 4, k: int = 10,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """X217 — proximity search over positional postings: documents
    where every query term occurs within ``window`` tokens of an
    anchor occurrence of the FIRST term, ranked by anchor count —
    the within-k operator between X42's unordered bag (too loose for
    entity co-mention mining) and X84's exact phrase (too strict for
    reordered/inflected mentions); IIR 2008 §2.4.2's positional
    intersection with a distance predicate instead of adjacency.

    Same plan as phrase_topk (one isin-filtered posexplode → postings
    → inner joins on doc_id → one codegen array pass), so the scale
    argument carries over unchanged; ``abs(q - p) <= window`` replaces
    the consecutive-slot test. Ties (n_matches, then id) pinned."""
    terms = [str(t) for t in query_terms]
    if len(terms) < 2:
        raise ValueError("proximity_topk needs at least two terms")
    if len(set(terms)) != len(terms):
        # a repeated term would satisfy its own within-window test at
        # distance 0 for every anchor — garbage ranking, reject early
        raise ValueError("proximity_topk terms must be distinct")
    toks = docs.select(
        id_col, F.posexplode(tokens(F.col(text_col))).alias("pos", "term")
    )
    posting = (
        toks.filter(F.col("term").isin(sorted(set(terms))))
        .groupBy(id_col, "term")
        .agg(F.array_sort(F.collect_list("pos")).alias("positions"))
    )
    cur = posting.filter(F.col("term") == terms[0]).select(
        id_col, F.col("positions").alias("p0")
    )
    for i, t in enumerate(terms[1:], start=1):
        cur = cur.join(
            posting.filter(F.col("term") == t).select(
                id_col, F.col("positions").alias(f"p{i}")
            ),
            id_col,
        )
    from functools import reduce

    # the anchor position p must be visible inside the nested
    # F.exists lambdas: transform p0 to a per-anchor struct of
    # per-term within-window flags, then filter on their conjunction
    n_matches = F.size(
        F.filter(
            F.transform(
                F.col("p0"),
                lambda p: F.struct(
                    *[
                        F.exists(
                            F.col(f"p{i}"),
                            (lambda pp: lambda q: F.abs(q - pp)
                             <= window)(p),
                        ).alias(f"m{i}")
                        for i in range(1, len(terms))
                    ]
                ),
            ),
            lambda s: reduce(
                lambda a, b: a & b,
                [s[f"m{i}"] for i in range(1, len(terms))],
            ),
        )
    ).cast("bigint")
    agg = cur.select(id_col, n_matches.alias("n_matches")).filter(
        F.col("n_matches") > 0
    )
    top = agg.orderBy(
        F.col("n_matches").desc(), F.col(id_col).asc()
    ).limit(k)
    w = Window.orderBy(F.col("n_matches").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
