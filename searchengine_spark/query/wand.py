"""Block-max pruned top-k (the north rule's "block-max WAND" serving path).

Classic BMW (Ding & Suel 2011) is a document-at-a-time pivot walk — a
single-threaded shape. The distributed equivalent over this index's
document-partitioned posting blocks is BUCKET-grained upper-bound
pruning, driven by the per-block maxima materialized at build time
(``max_tf``, ``min_dl``, ``min_ld`` — index/build.py):

  UB(bucket) = Σ_{t ∈ query terms with a block in bucket} wqt_t · maxcontrib_t(bucket)

  score(d ∈ bucket) ≤ UB(bucket) — docs missing a term contribute 0, and
  each term's contribution is monotone ↑ in tf and ↓ in dl (BM25) / ↓ in
  Ld (tfidf_ref), so the stored block extrema bound it from above.

Three Spark jobs, never a full posting scan:

  1. block metadata for the query terms → UB per bucket (columnar scan of
     the stats columns only — the posting blobs are never read, parquet
     column pruning keeps them on disk)
  2. exact-evaluate the ``probe`` most-promising buckets → threshold
     θ = k-th best score found
  3. exact-evaluate only the buckets whose UB clears θ, union, top-k

The pruned result is IDENTICAL to full evaluation (tested across both
scorers). The UB table stays a DataFrame end to end (10^12 docs →
n_docs/bucket_docs rows); the driver collects only ``probe`` bucket ids,
one θ, and the ≤k result rows.

Replaces the reference's 3-tier early-termination heuristic
(TieredRankedQueryParser.java:143-152), which is UNSAFE (a tier-1-only
answer can miss true top-k docs); this pruning is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .exec import (
    BM25_B,
    BM25_K1,
    IndexHandle,
    _decode_blocks,
    expand_ranked_query,
    query_weights,
)


def _ub_per_bucket(
    idx: IndexHandle, qw: list[tuple[str, float]], scorer: str, avgdl: float
) -> DataFrame:
    qw_df = F.broadcast(idx.spark.createDataFrame(qw, "term string, wqt double"))
    meta = (
        idx.postings.select("term", "bucket", "max_tf", "min_dl", "min_ld")
        # a (term,bucket) may span several physical block rows (segment /
        # chunk splits); pre-aggregate so the UB counts each term once
        .groupBy("term", "bucket")
        .agg(
            F.max("max_tf").alias("max_tf"),
            F.min("min_dl").alias("min_dl"),
            F.min("min_ld").alias("min_ld"),
        )
        .join(qw_df, "term")
    )
    tfm = F.col("max_tf").cast("double")
    if scorer == "bm25":
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("min_dl") / F.lit(avgdl)
        )
        contrib = F.col("wqt") * tfm * F.lit(BM25_K1 + 1.0) / (tfm + norm)
        ub = F.sum(contrib)
    else:  # tfidf_ref: (Σ wqt·(1+ln max_tf)) / (min Ld over the bucket)
        contrib = F.col("wqt") * (F.lit(1.0) + F.log(tfm))
        ub = F.sum(contrib) / F.min("min_ld")
    return meta.groupBy("bucket").agg(ub.alias("ub"))


def _score_buckets(
    idx: IndexHandle, qw: list[tuple[str, float]], buckets: DataFrame, scorer: str
) -> DataFrame:
    """Exact (doc_id, score) for docs in the given bucket dim — the same
    math as exec.ranked_topk restricted by a broadcast semi-join."""
    spark = idx.spark
    blocks = (
        idx.postings.filter(F.col("term").isin([t for t, _ in qw]))
        .join(F.broadcast(buckets), "bucket")
        .select("term", "docs_vb", "tfs_vb", "dls_vb")
    )
    decoded = blocks.mapInPandas(
        _decode_blocks, schema="term string, doc_id long, tf long, dl long"
    )
    qw_df = F.broadcast(spark.createDataFrame(qw, "term string, wqt double"))
    cand = decoded.join(qw_df, "term")
    tf = F.col("tf").cast("double")
    if scorer == "tfidf_ref":
        partial = (F.lit(1.0) + F.log(tf)) * F.col("wqt")
        return (
            cand.select("doc_id", partial.alias("partial"))
            .groupBy("doc_id")
            .agg(F.sum("partial").alias("acc"))
            .join(idx.docs.select("doc_id", "ld"), "doc_id")
            .select("doc_id", (F.col("acc") / F.col("ld")).alias("score"))
        )
    avgdl = float(idx.meta["avgdl"])
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl)
    )
    partial = F.col("wqt") * tf * F.lit(BM25_K1 + 1.0) / (tf + norm)
    return (
        cand.select("doc_id", partial.alias("partial"))
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("score"))
    )


def ranked_topk_wand(
    idx: IndexHandle,
    query: str,
    k: int = 20,
    scorer: str = "bm25",
    probe: int = 4,
    stats: dict | None = None,
) -> DataFrame:
    """Block-max pruned top-k; rank/score-identical to exec.ranked_topk.
    ``stats`` (optional dict) receives pruning telemetry."""
    spark = idx.spark
    result_schema = "doc_id long, url string, score double"
    terms = expand_ranked_query(query)
    if not terms:
        return spark.createDataFrame([], result_schema)
    qw = query_weights(idx, terms, scorer)
    if not qw:
        return spark.createDataFrame([], result_schema)
    avgdl = float(idx.meta["avgdl"])

    ub = _ub_per_bucket(idx, qw, scorer, avgdl).cache()
    try:
        top_buckets = [
            r["bucket"] for r in ub.orderBy(F.desc("ub")).limit(probe).collect()
        ]
        probe_dim = spark.createDataFrame([(b,) for b in top_buckets], "bucket int")
        probed_rows = (
            _score_buckets(idx, qw, probe_dim, scorer)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        theta = probed_rows[-1]["score"] if len(probed_rows) >= k else float("-inf")

        # >= not >: a bucket with UB == θ can still hold a doc that TIES the
        # k-th score and wins the doc_id-asc tiebreak
        survivors = ub.filter(
            (F.col("ub") >= theta) & ~F.col("bucket").isin(top_buckets)
        ).select("bucket")
        if stats is not None:
            # telemetry only: two extra count jobs — never run on the
            # latency path (bench/serving call with stats=None)
            n_buckets = ub.count()
            n_survive = survivors.count()
            stats.update(
                n_buckets=n_buckets,
                probed=len(top_buckets),
                survivors=n_survive,
                pruned=n_buckets - n_survive - len(top_buckets),
                theta=theta,
            )
        scored = spark.createDataFrame(
            [(r["doc_id"], r["score"]) for r in probed_rows],
            "doc_id long, score double",
        )
        # survivor evaluation folds into the FINAL job unconditionally —
        # an empty survivor dim broadcasts as empty and costs no scan,
        # so no driver-side count decides the union (one job, not two)
        scored = scored.union(
            _score_buckets(idx, qw, survivors, scorer).select("doc_id", "score")
        )
        rows = (
            scored.join(idx.docs.select("doc_id", "url"), "doc_id")
            .select("doc_id", "url", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        # materialized before unpersist; ≤ k rows
        return spark.createDataFrame(rows, result_schema)
    finally:
        ub.unpersist()
