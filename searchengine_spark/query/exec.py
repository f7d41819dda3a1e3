"""Ranked top-k query execution (SURVEY.md §7.5).

Spark shape (§3.2): tiny broadcast dim (query-term weights) ⋈ bucket/
rowgroup-pruned postings scan → Arrow-UDF block decode → JVM aggregation
→ top-k via ORDER BY ... LIMIT k (TakeOrderedAndProject — no full sort).

Two scorers on one index (SURVEY §2.6 note):
  - ``tfidf_ref``: the reference's lnc tf-idf, float64 natural log —
    score(d) = Σ_t (1+ln tf)·ln(1+N/df) / Ld(d)
    (RankedQueryParser.java:82-94,119-132). Rank-identity gate.
  - ``bm25`` (k1=1.2, b=0.75): the north-star web-scale scorer.
    idf = ln((N-df+0.5)/(df+0.5)+1), dl = Σ tf, avgdl from build meta.

Tie-break: (score DESC, doc_id ASC) — the reference's heap leaves equal
scores unordered (RankedQueryParser.java:42-52), so we pin doc_id order
and the oracle mirrors it (SURVEY §2.5 K4).
"""

from __future__ import annotations

import json
import math
import os
from collections import Counter
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.varbyte import decode_sorted, vb_decode
from ..text.porter import porter_stem
from ..text.tokenizer import remove_apostrophes, strip_for_query

BM25_K1 = 1.2
BM25_B = 0.75


def expand_ranked_query(query: str) -> list[str]:
    """Reference ranked-query term expansion (RankedQueryParser.java:69-116):
    lowercase (QueryFrame.java:284), split on single spaces, each subquery
    split on '-' with every part T9-normalized, plus the hyphens-removed
    concatenation as an extra term. Duplicates are KEPT — a term appearing
    twice accumulates twice."""
    terms: list[str] = []
    for sub in query.lower().strip().split(" "):
        # Java String.split drops trailing empties only; empty tokens stem
        # to "" and lookup misses — equivalent to skipping them.
        for tok in sub.split("-"):
            t = porter_stem(remove_apostrophes(strip_for_query(tok)))
            if t:
                terms.append(t)
        if "-" in sub:
            t = porter_stem(remove_apostrophes(strip_for_query(sub.replace("-", ""))))
            if t:
                terms.append(t)
    return terms


@dataclass
class IndexHandle:
    """Open handle on a built index directory (cache the DataFrames — the
    reference reuses parser/index objects across queries the same way,
    QueryFrame.java:245-248)."""

    spark: SparkSession
    path: str

    def __post_init__(self) -> None:
        from ..index.compact import recover_compaction

        # repair a crashed compaction swap before touching the layout
        recover_compaction(self.path)
        self.postings = self.spark.read.option(
            "basePath", os.path.join(self.path, "postings")
        ).parquet(os.path.join(self.path, "postings"))
        self.docs = self.spark.read.parquet(os.path.join(self.path, "docs")).select(
            "doc_id", "url", "dl", "ld"
        )
        self.lexicon = self.spark.read.parquet(os.path.join(self.path, "lexicon"))
        self.meta = json.load(
            open(os.path.join(self.path, "_manifests", "meta.json"))
        )
        # driver-RAM df memo (see term_dfs) — bounded by distinct QUERIED
        # terms, not lexicon size, so it stays scale-safe on a shard whose
        # full lexicon wouldn't fit on the driver
        self._df_memo: dict[str, int] = {}
        self._lex_ds = None

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """term → df for the PRESENT subset of ``terms``, via a driver-RAM
        memo over a footer-pruned pyarrow read of the lexicon — the batch/
        interactive planners' analogue of the serving tier's RAM lexicon
        (serve.py term_stats), but lazy: each distinct term is fetched once
        (misses memoize as df=0) and never costs a Spark job. Repeated
        queries — the batch harness, bench reps, a WAND upper-bound probe
        after a planner probe — are pure dict hits. Falls back to a Spark
        collect when the index path isn't pyarrow-readable (e.g. a remote
        URI with no local filesystem mapping)."""
        todo = sorted({t for t in terms if t not in self._df_memo})
        if todo:
            found: dict[str, int] = {}
            try:
                import pyarrow.compute as pc
                import pyarrow.dataset as ds

                if self._lex_ds is None:
                    self._lex_ds = ds.dataset(
                        os.path.join(self.path, "lexicon"), format="parquet"
                    )
                t = self._lex_ds.to_table(
                    columns=["term", "df"], filter=pc.field("term").isin(todo)
                )
                found = {
                    term: int(df)
                    for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist())
                }
            except Exception:
                found = {
                    r["term"]: int(r["df"])
                    for r in self.lexicon.filter(F.col("term").isin(todo))
                    .select("term", "df")
                    .collect()
                }
            for term in todo:
                self._df_memo[term] = found.get(term, 0)
        return {t: self._df_memo[t] for t in set(terms) if self._df_memo.get(t, 0) > 0}


def _decode_blocks(batches):
    """mapInPandas kernel: posting blocks → (term, doc_id, tf, dl) rows.
    numpy-vectorized; Python touches blocks, not postings. dl is the
    denormalized per-posting doc length — BM25 scoring needs no join."""
    for pdf in batches:
        terms_out: list[np.ndarray] = []
        docs_out: list[np.ndarray] = []
        tfs_out: list[np.ndarray] = []
        dls_out: list[np.ndarray] = []
        for term, dvb, tvb, lvb in zip(
            pdf["term"], pdf["docs_vb"], pdf["tfs_vb"], pdf["dls_vb"]
        ):
            d = decode_sorted(bytes(dvb))
            t = vb_decode(bytes(tvb)).astype(np.int64)
            terms_out.append(np.repeat(np.array([term], dtype=object), len(d)))
            docs_out.append(d)
            tfs_out.append(t)
            dls_out.append(vb_decode(bytes(lvb)).astype(np.int64))
        if terms_out:
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms_out),
                    "doc_id": np.concatenate(docs_out),
                    "tf": np.concatenate(tfs_out),
                    "dl": np.concatenate(dls_out),
                }
            )


def _decode_blocks_plain(batches):
    """3-column variant (term, doc_id, tf) for tables without the
    denormalized dls_vb column (the tiered parity variants)."""
    for pdf in batches:
        terms_out, docs_out, tfs_out = [], [], []
        for term, dvb, tvb in zip(pdf["term"], pdf["docs_vb"], pdf["tfs_vb"]):
            d = decode_sorted(bytes(dvb))
            t = vb_decode(bytes(tvb)).astype(np.int64)
            terms_out.append(np.repeat(np.array([term], dtype=object), len(d)))
            docs_out.append(d)
            tfs_out.append(t)
        if terms_out:
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms_out),
                    "doc_id": np.concatenate(docs_out),
                    "tf": np.concatenate(tfs_out),
                }
            )


def decoded_postings(
    idx: IndexHandle, terms: list[str] | None
) -> DataFrame:
    """Bucket-pruned scan (parquet row-group min/max on the term-sorted
    files is the 'vocab binary search' analogue, SURVEY §4) + decode.
    ``terms=None`` decodes the WHOLE postings table (full-index passes
    like the tiered build) without materializing the vocabulary anywhere
    — no filter, no driver collect."""
    blocks = idx.postings
    if terms is not None:
        blocks = blocks.filter(F.col("term").isin(list(set(terms))))
    blocks = blocks.select("term", "docs_vb", "tfs_vb", "dls_vb")
    return blocks.mapInPandas(
        _decode_blocks, schema="term string, doc_id long, tf long, dl long"
    )


def _decode_blocks_with_positions(batches):
    """mapInPandas kernel: posting blocks → (term, doc_id, tf, positions)
    rows — the 'getPostingsWithPositions' path
    (DiskInvertedIndex.java:93-126): positions materialized only here,
    ranked scoring never pays for them (lazy position decode, SURVEY §4)."""
    from ..index.varbyte import decode_position_lists

    for pdf in batches:
        rows_t, rows_d, rows_tf, rows_p = [], [], [], []
        for term, dvb, tvb, pvb in zip(
            pdf["term"], pdf["docs_vb"], pdf["tfs_vb"], pdf["pos_vb"]
        ):
            d = decode_sorted(bytes(dvb))
            t = vb_decode(bytes(tvb)).astype(np.int64)
            plists = decode_position_lists(bytes(pvb), t)
            rows_t.append(np.repeat(np.array([term], dtype=object), len(d)))
            rows_d.append(d)
            rows_tf.append(t)
            rows_p.extend(p.astype(np.int32).tolist() for p in plists)
        if rows_t:
            yield pd.DataFrame(
                {
                    "term": np.concatenate(rows_t),
                    "doc_id": np.concatenate(rows_d),
                    "tf": np.concatenate(rows_tf),
                    "positions": pd.Series(rows_p, dtype=object),
                }
            )


def decoded_postings_with_positions(
    idx: IndexHandle, terms: list[str] | None
) -> DataFrame:
    blocks = idx.postings
    if terms is not None:
        blocks = blocks.filter(F.col("term").isin(list(set(terms))))
    blocks = blocks.select("term", "docs_vb", "tfs_vb", "pos_vb")
    return blocks.mapInPandas(
        _decode_blocks_with_positions,
        schema="term string, doc_id long, tf long, positions array<int>",
    )


def query_weights(
    idx: IndexHandle, terms: list[str], scorer: str
) -> list[tuple[str, float]]:
    """Per-term wqt, multiplied by query-term multiplicity."""
    n = float(self_n(idx))
    mult = Counter(terms)
    dfs = idx.term_dfs(list(mult))
    out = []
    for term in sorted(dfs):  # term order, matching the lexicon's sort
        df = float(dfs[term])
        if scorer == "tfidf_ref":
            wqt = math.log(1.0 + n / df)
        elif scorer == "bm25":
            wqt = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        else:
            raise ValueError(scorer)
        out.append((term, wqt * mult[term]))
    return out


def self_n(idx: IndexHandle) -> int:
    return int(idx.meta["n_docs"])


def ranked_topk(
    idx: IndexHandle,
    query: str,
    k: int = 20,
    scorer: str = "tfidf_ref",
) -> DataFrame:
    """Full-evaluation ranked retrieval → DataFrame
    (doc_id, url, score) with deterministic (score desc, doc_id asc) top-k."""
    spark = idx.spark
    terms = expand_ranked_query(query)
    if not terms:
        return spark.createDataFrame([], "doc_id long, url string, score double")
    qw = query_weights(idx, terms, scorer)
    if not qw:
        return spark.createDataFrame([], "doc_id long, url string, score double")
    qw_df = F.broadcast(
        spark.createDataFrame(qw, "term string, wqt double")
    )
    cand = decoded_postings(idx, [t for t, _ in qw]).join(qw_df, "term")
    if scorer == "tfidf_ref":
        partial = (F.lit(1.0) + F.log(F.col("tf").cast("double"))) * F.col("wqt")
        scored = (
            cand.select("doc_id", partial.alias("partial"))
            .groupBy("doc_id")
            .agg(F.sum("partial").alias("acc"))
            .join(idx.docs.select("doc_id", "ld"), "doc_id")
            .select("doc_id", (F.col("acc") / F.col("ld")).alias("score"))
        )
    else:  # bm25 — dl rides the decoded posting; no docs join on candidates
        avgdl = float(idx.meta["avgdl"])
        tf = F.col("tf").cast("double")
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl)
        )
        partial = F.col("wqt") * tf * F.lit(BM25_K1 + 1.0) / (tf + norm)
        scored = (
            cand.select("doc_id", partial.alias("partial"))
            .groupBy("doc_id")
            .agg(F.sum("partial").alias("score"))
        )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    # only the ≤k winners fetch doc metadata
    return (
        topk.join(idx.docs.select("doc_id", "url"), "doc_id")
        .select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def _bm25_bucket_topk_kernel(qweights, avgdl: float, bucket_docs: int, k: int):
    """applyInPandas kernel factory for the scatter-gather batch path: one
    group = one BUCKET (a contiguous doc_id range — every posting of every
    doc in the range is co-located by construction, since postings rows are
    keyed (term, bucket)). Decodes the live terms' blocks, accumulates BM25
    per (query, local doc) in numpy, and emits at most k rows per query —
    the per-bucket winners. Exact: each doc lives in exactly one bucket, so
    the global top-k is a subset of the union of per-bucket top-k.

    ``qweights``: {term: [(qid, wqt·mult), ...]} with deterministic list
    order; accumulation iterates blocks in sorted-term order so each
    query's per-doc sum folds in a fixed term order (float-order stable
    across runs)."""
    K1, B = BM25_K1, BM25_B

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["term"].to_numpy(), kind="stable")
        base = int(pdf["bucket"].iloc[0]) * bucket_docs
        acc: dict[int, np.ndarray] = {}
        terms = pdf["term"].to_numpy()
        dvbs = pdf["docs_vb"].to_numpy()
        tvbs = pdf["tfs_vb"].to_numpy()
        lvbs = pdf["dls_vb"].to_numpy()
        for i in order:
            users = qweights.get(terms[i])
            if not users:
                continue
            docs = decode_sorted(bytes(dvbs[i]))
            tf = vb_decode(bytes(tvbs[i])).astype(np.float64)
            dl = vb_decode(bytes(lvbs[i])).astype(np.float64)
            contrib = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
            local = docs - base
            for qid, w in users:
                arr = acc.get(qid)
                if arr is None:
                    arr = acc[qid] = np.zeros(bucket_docs, dtype=np.float64)
                # docs within one block are unique → fancy += is exact;
                # chunk-duplicate (term,bucket) rows add in separate passes
                arr[local] += w * contrib
        if not acc:
            return pd.DataFrame(
                {"qid": pd.Series(dtype="int32"),
                 "doc_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")}
            )
        qids_out, docs_out, scores_out = [], [], []
        for qid in sorted(acc):
            arr = acc[qid]
            nz = np.nonzero(arr)[0]
            sc = arr[nz]
            # exact (score DESC, doc_id ASC) head — buckets are small, a
            # full lexsort of the matches is cheaper than tie-safe partition
            sel = np.lexsort((nz, -sc))[:k]
            qids_out.append(np.full(len(sel), qid, dtype=np.int32))
            docs_out.append((nz[sel] + base).astype(np.int64))
            scores_out.append(sc[sel])
        return pd.DataFrame(
            {
                "qid": np.concatenate(qids_out),
                "doc_id": np.concatenate(docs_out),
                "score": np.concatenate(scores_out),
            }
        )

    return score_bucket


def ranked_topk_batch(
    idx: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 20,
    scorer: str = "tfidf_ref",
    impl: str | None = None,
) -> DataFrame:
    """Evaluate MANY ranked queries in ONE Spark job (the analogue of the
    reference's batch harness, Milestone3/SimulateQueryRun.java:33-87, and
    the throughput-bench path): queries become a small broadcast dim
    (qid, term, wqt), postings for the union of terms are decoded once,
    scores aggregate per (qid, doc_id), and a per-qid window takes top-k.

    Scale shape: one bucket-pruned scan regardless of query count; the
    window partitions by qid (thousands of tiny partitions), never by
    term, so stopword skew can't concentrate in one task.

    ``impl``: None (auto) picks the scatter-gather KERNEL path for bm25 —
    encoded blocks shuffle once by bucket (each block crosses the wire
    once no matter how many queries share its term, vs one candidate row
    per (query, posting) in the exchange path), one Arrow kernel per
    bucket scores every query numpy-side and emits ≤k rows per query, and
    a window over ≤ k·queries·buckets tiny rows takes the exact global
    top-k — the same scatter-gather shape the sharded serving root uses
    across shards. "exchange" forces the declarative candidate-row path
    (the tfidf_ref parity scorer always uses it: its ÷Ld needs the docs
    dim, which rides the exchange plan's broadcast join)."""
    spark = idx.spark
    n = float(self_n(idx))
    per_q: dict[int, Counter] = {qid: Counter(expand_ranked_query(q)) for qid, q in queries}
    all_terms = sorted({t for c in per_q.values() for t in c})
    if not all_terms:
        return spark.createDataFrame(
            [], "qid int, rank int, doc_id long, url string, score double"
        )
    dfs = {t: float(df) for t, df in idx.term_dfs(all_terms).items()}
    rows = []
    for qid, cnt in per_q.items():
        for t, mult in cnt.items():
            df = dfs.get(t)
            if not df:
                continue
            if scorer == "tfidf_ref":
                wqt = math.log(1.0 + n / df)
            else:
                wqt = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            rows.append((qid, t, wqt * mult))
    if not rows:
        return spark.createDataFrame(
            [], "qid int, rank int, doc_id long, url string, score double"
        )
    from pyspark.sql.window import Window

    if impl is None:
        impl = "kernel" if scorer == "bm25" else "exchange"
    if impl == "kernel":
        if scorer != "bm25":
            raise ValueError("kernel batch path is bm25-only (tfidf needs Ld)")
        qweights: dict[str, list[tuple[int, float]]] = {}
        for qid, t, w in sorted(rows):
            qweights.setdefault(t, []).append((qid, w))
        live_terms = sorted(qweights)
        avgdl = float(idx.meta["avgdl"])
        bucket_docs = int(idx.meta["bucket_docs"])
        blocks = idx.postings.filter(
            F.col("term").isin(live_terms)
        ).select("bucket", "term", "docs_vb", "tfs_vb", "dls_vb")
        per_bucket = blocks.groupBy("bucket").applyInPandas(
            _bm25_bucket_topk_kernel(qweights, avgdl, bucket_docs, k),
            schema="qid int, doc_id long, score double",
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
        ranked = (
            per_bucket.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
        return ranked.join(idx.docs.select("doc_id", "url"), "doc_id").select(
            "qid", "rank", "doc_id", "url", "score"
        )

    qdim = F.broadcast(spark.createDataFrame(rows, "qid int, term string, wqt double"))
    live_terms = sorted({t for _, t, _ in rows})
    cand = decoded_postings(idx, live_terms).join(qdim, "term")
    if scorer == "tfidf_ref":
        partial = (F.lit(1.0) + F.log(F.col("tf").cast("double"))) * F.col("wqt")
        scored = (
            cand.select("qid", "doc_id", partial.alias("partial"))
            .groupBy("qid", "doc_id")
            .agg(F.sum("partial").alias("acc"))
            .join(idx.docs.select("doc_id", "ld"), "doc_id")
            .select("qid", "doc_id", (F.col("acc") / F.col("ld")).alias("score"))
        )
    else:  # bm25: dl is decoded with the posting — no docs join on candidates
        avgdl = float(idx.meta["avgdl"])
        tf = F.col("tf").cast("double")
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl)
        )
        partial = F.col("wqt") * tf * F.lit(BM25_K1 + 1.0) / (tf + norm)
        scored = (
            cand.select("qid", "doc_id", partial.alias("partial"))
            .groupBy("qid", "doc_id")
            .agg(F.sum("partial").alias("score"))
        )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    # url only for the ≤ n_queries·k winners
    return ranked.join(idx.docs.select("doc_id", "url"), "doc_id").select(
        "qid", "rank", "doc_id", "url", "score"
    )
