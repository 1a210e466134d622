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


def bm25_topk(docs: DataFrame, query_terms: Sequence[str], k: int = 10,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, score_micro, n_terms_matched, rank) — the ``k``
    highest-BM25 documents for a bag of query terms, rank ties broken
    by ascending id (deterministic)."""
    terms = sorted(set(query_terms))
    toks = docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("term"))
    dl = toks.groupBy(id_col).agg(F.count("*").cast("bigint").alias("dl"))
    totals = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
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
