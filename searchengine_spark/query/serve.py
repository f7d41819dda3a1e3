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
    def __init__(self, path: str, cache_terms: int = 4096) -> None:
        self.path = path
        self.postings = ds.dataset(os.path.join(path, "postings"))
        self.lexicon = ds.dataset(os.path.join(path, "lexicon"))
        self.docs = ds.dataset(os.path.join(path, "docs"))
        self.meta = json.load(open(os.path.join(path, "_manifests", "meta.json")))
        # hot-term posting cache (decoded doc/tf/dl arrays) — the RAM
        # cache a real serving shard keeps; 0 disables
        self._cache_cap = cache_terms
        self._term_cache: dict[str, list] = {}

    # -- lookups -----------------------------------------------------------
    def term_stats(self, terms: list[str]) -> dict[str, int]:
        t = self.lexicon.to_table(
            columns=["term", "df"], filter=pc.field("term").isin(terms)
        )
        return dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))

    def _blocks(self, terms: list[str]):
        return self.postings.to_table(
            columns=["term", "docs_vb", "tfs_vb", "dls_vb"],
            filter=pc.field("term").isin(terms),
        )

    def _doc_meta(self, doc_ids: np.ndarray) -> dict[int, tuple]:
        """Metadata for the ≤k winners only — an isin filter row-group
        prunes the url-bearing docs scan instead of ranging over it."""
        if doc_ids.size == 0:
            return {}
        t = self.docs.to_table(
            columns=["doc_id", "url", "dl", "ld"],
            filter=pc.field("doc_id").isin([int(d) for d in doc_ids]),
        )
        return {
            d: (u, dl, ld)
            for d, u, dl, ld in zip(
                t["doc_id"].to_pylist(),
                t["url"].to_pylist(),
                t["dl"].to_pylist(),
                t["ld"].to_pylist(),
            )
        }

    def _doc_norms(self, col: str, doc_ids: np.ndarray) -> np.ndarray:
        """Vector of dl or ld aligned with doc_ids (candidate set) —
        tfidf parity mode only; BM25 reads dl off the posting blocks."""
        lo, hi = int(doc_ids.min()), int(doc_ids.max())
        t = self.docs.to_table(
            columns=["doc_id", col],
            filter=(pc.field("doc_id") >= lo) & (pc.field("doc_id") <= hi),
        )
        ids = t["doc_id"].to_numpy()
        vals = t[col].to_numpy().astype(np.float64)
        order = np.argsort(ids)
        pos = np.searchsorted(ids[order], doc_ids)
        return vals[order][pos]

    def _decoded_terms(self, terms: list[str]) -> list[tuple]:
        """[(term, doc_ids, tfs, dls)] — decoded once per term, cached."""
        missing = [t for t in terms if t not in self._term_cache]
        if missing:
            blocks = self._blocks(missing)
            fresh: dict[str, list] = {t: [] for t in missing}
            for term, dvb, tvb, lvb in zip(
                blocks["term"].to_pylist(),
                blocks["docs_vb"].to_pylist(),
                blocks["tfs_vb"].to_pylist(),
                blocks["dls_vb"].to_pylist(),
            ):
                fresh[term].append(
                    (
                        decode_sorted(dvb),
                        vb_decode(tvb).astype(np.float64),
                        vb_decode(lvb).astype(np.float64),
                    )
                )
            for t, parts in fresh.items():
                if not parts:
                    continue
                entry = [
                    t,
                    np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]),
                    np.concatenate([p[2] for p in parts]),
                ]
                if len(self._term_cache) >= self._cache_cap:
                    self._term_cache.pop(next(iter(self._term_cache)))
                self._term_cache[t] = entry
        return [tuple(self._term_cache[t]) for t in terms if t in self._term_cache]

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

        decoded = self._decoded_terms(sorted(wqt))
        if not decoded:
            return []
        docs_cat = np.concatenate([d for _, d, _, _ in decoded])
        uniq, inv = np.unique(docs_cat, return_inverse=True)
        # one buffered bincount beats per-term np.add.at (unbuffered
        # scatter) by ~10x on stopword-sized candidate sets
        if scorer == "tfidf_ref":
            partials = np.concatenate(
                [(1.0 + np.log(tf)) * wqt[term] for term, _, tf, _ in decoded]
            )
            acc = np.bincount(inv, weights=partials, minlength=uniq.size)
            scores = acc / self._doc_norms("ld", uniq)
        else:  # bm25: dl decoded alongside the posting — no docs scan at all
            avgdl = float(self.meta["avgdl"])
            partials = np.concatenate(
                [
                    wqt[term]
                    * tf
                    * (BM25_K1 + 1.0)
                    / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
                    for term, _, tf, dl in decoded
                ]
            )
            scores = np.bincount(inv, weights=partials, minlength=uniq.size)

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
