#!/usr/bin/env python3
"""spark-submit entrypoint: build (or query) the lexical retrieval
index over a documents/pages table.

Build mode writes the inverted index as two parquet tables —
``postings`` (term, doc_id, tf), REPARTITIONED BY term so a query's
handful of terms prunes to a handful of files, and ``doclens``
(doc_id, dl) — plus one stats JSON. Query mode answers a BM25 top-k
from the PREBUILT tables without touching corpus text: the
index/query split every retrieval engine makes (X42's scoring, X84's
phrase candidates, and decontamination probes all read the same
store). This file is only the plumbing; the arithmetic lives in
operators/retrieval.py and is oracle-checked.

Merge mode upserts a re-extraction delta (and an optional deletion
list) into an existing index and writes the result as a NEW index
directory — the incremental-maintenance path (X158): per crawl
snapshot only the changed pages are tokenized; the base index is
read, anti-joined on the changed doc_ids, and rewritten. Output goes
to a fresh directory rather than in place so a killed merge leaves
the base index intact (swap is an atomic rename at the orchestrator).

Usage:
  python jobs/index.py build --input /tmp/docs.parquet --output /tmp/ix
  python jobs/index.py query --index /tmp/ix --terms quality crawl -k 5
  python jobs/index.py merge --index /tmp/ix --delta /tmp/new.parquet \
      --deleted /tmp/gone.parquet --output /tmp/ix2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="mode", required=True)
    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--term-partitions", type=int, default=32,
                   help="postings files are hash-partitioned by term "
                        "so query-time scans prune")
    b.add_argument("--master", default=None)
    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--terms", nargs="+", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--master", default=None)
    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--delta", required=True,
                   help="parquet of re-extracted documents (id, text)")
    m.add_argument("--deleted", default=None,
                   help="optional parquet of doc_ids gone from the crawl")
    m.add_argument("--output", required=True)
    m.add_argument("--text-col", default="text")
    m.add_argument("--id-col", default="doc_id")
    m.add_argument("--term-partitions", type=int, default=32)
    m.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from docling_serve_spark.operators.retrieval import (
        bm25_from_index, build_postings, merge_postings,
    )
    from docling_serve_spark.session import get_spark

    spark = get_spark(master=args.master)

    def write_index(postings, doclens) -> None:
        postings.repartition(args.term_partitions, "term").write.mode(
            "overwrite"
        ).parquet(os.path.join(args.output, "postings"))
        doclens.write.mode("overwrite").parquet(
            os.path.join(args.output, "doclens")
        )
        dls = spark.read.parquet(os.path.join(args.output, "doclens"))
        stats = dls.agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
        ).collect()[0]
        n_terms = spark.read.parquet(
            os.path.join(args.output, "postings")
        ).select("term").distinct().count()
        summary = {
            "n_docs": stats["n_docs"],
            "total_len": stats["total_len"],
            "n_terms": n_terms,
        }
        with open(os.path.join(args.output, "stats.json"), "w") as fh:
            json.dump(summary, fh)
        print(json.dumps(summary))

    if args.mode == "build":
        docs = spark.read.parquet(args.input)
        postings, doclens = build_postings(
            docs, text_col=args.text_col, id_col=args.id_col
        )
        write_index(postings, doclens)
    elif args.mode == "merge":
        base_p = spark.read.parquet(os.path.join(args.index, "postings"))
        base_d = spark.read.parquet(os.path.join(args.index, "doclens"))
        delta = spark.read.parquet(args.delta)
        delta_p, delta_d = build_postings(
            delta, text_col=args.text_col, id_col=args.id_col
        )
        deleted = (
            spark.read.parquet(args.deleted).select(
                F.col(args.id_col).alias("doc_id")
            )
            if args.deleted else None
        )
        merged_p, merged_d = merge_postings(
            base_p, base_d, delta_p, delta_d, deleted_ids=deleted,
            # the delta's RAW id set, not delta_d's: a delta row whose
            # re-extracted text tokenizes to nothing has no doclens row
            # but must still scrub its stale base entries
            changed_ids=delta.select(F.col(args.id_col).alias("doc_id")),
        )
        write_index(merged_p, merged_d)
    else:
        postings = spark.read.parquet(os.path.join(args.index, "postings"))
        doclens = spark.read.parquet(os.path.join(args.index, "doclens"))
        rows = bm25_from_index(postings, doclens, args.terms,
                               k=args.k).collect()
        out = [
            {"rank": r["rank"], "doc_id": r["doc_id"],
             "score_micro": r["score_micro"],
             "n_terms_matched": r["n_terms_matched"]}
            for r in rows
        ]
        print(json.dumps(out))


if __name__ == "__main__":
    main()
