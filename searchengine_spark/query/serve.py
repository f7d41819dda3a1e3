"""Spark-free interactive serving over the Spark-built index.

Spark is the right engine for the BUILD (partition-parallel over 10^12
docs) and for BATCH query evaluation (225 queries/job), but an
interactive query pays Spark's multi-stage scheduling floor (~0.8 s in
local mode). Real web-search systems split exactly here: offline
index build vs online serving tier. This module is that serving tier —
the index layout is plain parquet, so a query needs only:

  * lexicon probe with a `term IN (…)` pyarrow filter (row-group
    min/max pruning over the term-sorted files = the reference's vocab
    binary search, DiskInvertedIndex.java:129-167),
  * posting-block fetch with the same pushdown (stats columns + blobs),
  * numpy varbyte decode + accumulate + argpartition top-k,
  * doc-metadata fetch for the ≤k winners via a doc_id range filter
    (doc_ids are monotone across the url-sorted docs files).

Scores are float-identical to the Spark path up to summation order
(tested rank-identical). At web scale this object maps onto one serving
shard; sharding = the same bucket ranges the index is partitioned by.
"""

from __future__ import annotations

import json
import math
import os
from collections import Counter

import numpy as np

import pyarrow.compute as pc
import pyarrow.dataset as ds

from ..index.varbyte import decode_position_lists, decode_sorted, vb_decode
from .exec import BM25_B, BM25_K1, expand_ranked_query


class LocalIndexReader:
    def __init__(self, path: str) -> None:
        self.path = path
        self.postings = ds.dataset(os.path.join(path, "postings"))
        self.lexicon = ds.dataset(os.path.join(path, "lexicon"))
        self.docs = ds.dataset(os.path.join(path, "docs"))
        self.meta = json.load(open(os.path.join(path, "_manifests", "meta.json")))

    # -- lookups -----------------------------------------------------------
    def term_stats(self, terms: list[str]) -> dict[str, int]:
        t = self.lexicon.to_table(
            columns=["term", "df"], filter=pc.field("term").isin(terms)
        )
        return dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))

    def _blocks(self, terms: list[str]):
        return self.postings.to_table(
            columns=["term", "docs_vb", "tfs_vb"],
            filter=pc.field("term").isin(terms),
        )

    def _doc_meta(self, doc_ids: np.ndarray) -> dict[int, tuple]:
        if doc_ids.size == 0:
            return {}
        lo, hi = int(doc_ids.min()), int(doc_ids.max())
        t = self.docs.to_table(
            columns=["doc_id", "url", "dl", "ld"],
            filter=(pc.field("doc_id") >= lo) & (pc.field("doc_id") <= hi),
        )
        want = set(doc_ids.tolist())
        out = {}
        for d, u, dl, ld in zip(
            t["doc_id"].to_pylist(), t["url"].to_pylist(), t["dl"].to_pylist(), t["ld"].to_pylist()
        ):
            if d in want:
                out[d] = (u, dl, ld)
        return out

    def _doc_norms(self, col: str, doc_ids: np.ndarray) -> np.ndarray:
        """Vector of dl or ld aligned with doc_ids (candidate set)."""
        lo, hi = int(doc_ids.min()), int(doc_ids.max())
        t = self.docs.to_table(
            columns=["doc_id", col],
            filter=(pc.field("doc_id") >= lo) & (pc.field("doc_id") <= hi),
        )
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        vals = np.asarray(t[col].to_pylist(), dtype=np.float64)
        order = np.argsort(ids)
        pos = np.searchsorted(ids[order], doc_ids)
        return vals[order][pos]

    # -- ranked ------------------------------------------------------------
    def ranked_topk(
        self, query: str, k: int = 20, scorer: str = "bm25"
    ) -> list[dict]:
        terms = expand_ranked_query(query)
        if not terms:
            return []
        mult = Counter(terms)
        dfs = self.term_stats(sorted(mult))
        if not dfs:
            return []
        n = float(self.meta["n_docs"])
        wqt = {}
        for t, df in dfs.items():
            df = float(df)
            if scorer == "tfidf_ref":
                wqt[t] = math.log(1.0 + n / df) * mult[t]
            else:
                wqt[t] = math.log((n - df + 0.5) / (df + 0.5) + 1.0) * mult[t]

        blocks = self._blocks(sorted(wqt))
        decoded = []  # (term, doc_ids, tfs)
        for term, dvb, tvb in zip(
            blocks["term"].to_pylist(),
            blocks["docs_vb"].to_pylist(),
            blocks["tfs_vb"].to_pylist(),
        ):
            decoded.append((term, decode_sorted(dvb), vb_decode(tvb).astype(np.float64)))
        if not decoded:
            return []
        docs_cat = np.concatenate([d for _, d, _ in decoded])
        uniq, inv = np.unique(docs_cat, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        if scorer == "tfidf_ref":
            off = 0
            for term, d, tf in decoded:
                np.add.at(acc, inv[off : off + d.size], (1.0 + np.log(tf)) * wqt[term])
                off += d.size
            scores = acc / self._doc_norms("ld", uniq)
        else:
            dl = self._doc_norms("dl", uniq)
            avgdl = float(self.meta["avgdl"])
            off = 0
            for term, d, tf in decoded:
                seg = inv[off : off + d.size]
                norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl[seg] / avgdl)
                np.add.at(
                    acc, seg, wqt[term] * tf * (BM25_K1 + 1.0) / (tf + norm)
                )
                off += d.size
            scores = acc

        k = min(k, uniq.size)
        # exact (score desc, doc_id asc) order — lexsort keeps score ties
        # deterministic, matching the Spark path's tiebreak
        top = np.lexsort((uniq, -scores))[:k]
        meta = self._doc_meta(uniq[top])
        return [
            {
                "doc_id": int(uniq[i]),
                "url": meta[int(uniq[i])][0],
                "score": float(scores[i]),
            }
            for i in top
        ]

    # -- boolean -----------------------------------------------------------
    def boolean_query(self, query: str) -> list[dict]:
        """Boolean/phrase queries on the serving tier: the SAME planner as
        the Spark path (query/boolean.BooleanPlanner — reference-exact
        semantics), driven by a local backend whose plists come from a
        pyarrow posting fetch. Returns [{'doc_id', 'url'}] doc_id-asc."""
        from ..oracle.boolmodel import OracleBackend
        from .boolean import BooleanPlanner, _RecordingBackend

        rec = _RecordingBackend()
        BooleanPlanner(rec).execute(query)
        terms = sorted(t for t in rec.terms if t)
        index: dict[str, list] = {}
        if terms:
            t = self.postings.to_table(
                columns=["term", "docs_vb", "tfs_vb", "pos_vb"],
                filter=pc.field("term").isin(terms),
            )
            for term, dvb, tvb, pvb in zip(
                t["term"].to_pylist(),
                t["docs_vb"].to_pylist(),
                t["tfs_vb"].to_pylist(),
                t["pos_vb"].to_pylist(),
            ):
                d = decode_sorted(dvb)
                tf = vb_decode(tvb)
                plists = decode_position_lists(pvb, tf)
                index.setdefault(term, []).extend(
                    (int(di), pi.tolist()) for di, pi in zip(d, plists)
                )
        for term in index:
            index[term].sort(key=lambda x: x[0])

        class _Shim:
            pass

        shim = _Shim()
        shim.index = index
        plist = BooleanPlanner(OracleBackend(shim)).execute(query)
        if plist is None:
            return []
        doc_ids = np.asarray(sorted(d for d, _ in plist), dtype=np.int64)
        meta = self._doc_meta(doc_ids)
        return [{"doc_id": int(d), "url": meta[int(d)][0]} for d in doc_ids]
