"""spark-submit entry: Cranfield-style batch evaluation (MAP @20).

    spark-submit --py-files dist/engine.zip jobs/evaluate.py \
        --index /data/index [--queries queries.txt] [--qrels qrel.txt] \
        [--scorer bm25] [--k 20]

queries.txt: one query per line (query i = line i, 1-based).
qrel.txt: line i = space-separated relevant doc_ids for query i.
Without --queries, a 225-query synthetic set is used; without --qrels,
relevance is synthesized from full tf-idf evaluation (the harness then
measures how far the chosen scorer departs from the reference ranking —
the same A/B the reference's SimulateQueryRun performed across its six
engine variants).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# plain-python invocation (tests, probes) — spark-submit --py-files makes
# this a no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries")
    ap.add_argument("--qrels")
    ap.add_argument("--scorer", default="bm25", choices=["bm25", "tfidf_ref"])
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument(
        "--matrix",
        action="store_true",
        help="evaluate ALL engine variants (the SimulateQueryRun analogue)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from searchengine_spark.evaluation import qrels_from_mode, topk_map
    from searchengine_spark.query.exec import IndexHandle
    from searchengine_spark.session import ENGINE_CONFS

    b = SparkSession.builder.appName("evaluate-map")
    for k, v in ENGINE_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    idx = IndexHandle(spark, args.index)

    if args.queries:
        with open(args.queries) as f:
            queries = [(i + 1, q.strip()) for i, q in enumerate(f) if q.strip()]
    else:
        from searchengine_spark.corpus import generate_queries

        queries = generate_queries(225)

    if args.matrix:
        from searchengine_spark.evaluation import variant_matrix

        print(json.dumps(variant_matrix(spark, args.index, queries, k=args.k), indent=1))
        spark.stop()
        return

    if args.qrels:
        qrels = {}
        with open(args.qrels) as f:
            for i, line in enumerate(f):
                qrels[i + 1] = {int(x) for x in line.split()}
    else:
        qrels = qrels_from_mode(idx, queries, k=args.k, scorer="tfidf_ref")

    res = topk_map(idx, queries, qrels, k=args.k, scorer=args.scorer)
    print(
        json.dumps(
            {
                "map": res["map"],
                "n_queries": len(queries),
                "qps": res["qps"],
                "elapsed_sec": res["elapsed_sec"],
                "scorer": args.scorer,
                "k": args.k,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
