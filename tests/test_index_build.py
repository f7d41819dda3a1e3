"""Spark index build vs the NumPy oracle: structure invariants + content
equality (df, tf, positions, Ld, doc ids) on a 300-page synthetic corpus
built with deliberately tiny buckets/chunks."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.varbyte import (
    decode_position_lists,
    decode_sorted,
    vb_decode,
)


def _load_engine_index(spark, built_index):
    post = spark.read.option(
        "basePath", os.path.join(built_index, "postings")
    ).parquet(os.path.join(built_index, "postings"))
    rows = post.orderBy("term", "bucket", "doc_first").collect()
    idx = {}
    for r in rows:
        docs = decode_sorted(bytes(r["docs_vb"]))
        tfs = vb_decode(bytes(r["tfs_vb"])).astype(int)
        poss = decode_position_lists(bytes(r["pos_vb"]), tfs)
        entry = idx.setdefault(r["term"], [])
        # (bucket, doc_first) ascending == docID ascending: blocks simply
        # concatenate (a bucket may span several physical blocks when a
        # segment/chunk boundary cuts it — their doc ranges are disjoint)
        for d, ps in zip(docs, poss):
            entry.append((int(d), [int(x) for x in ps]))
    return idx


def test_engine_index_matches_oracle(spark, built_index, oracle_index):
    engine = _load_engine_index(spark, built_index)
    oracle = {t: [(d, p) for d, p in v] for t, v in oracle_index.index.items()}
    assert set(engine) == set(oracle)
    for t in oracle:
        assert engine[t] == oracle[t], f"postings differ for {t!r}"


def test_local_and_shuffle_postings_agree(spark, built_index, small_corpus_pdf, tmp_path):
    """The zero-shuffle per-segment build and the groupBy(term,bucket)
    build must produce the SAME logical index (same postings, tfs,
    positions per term in docID order), differing only in physical block
    granularity."""
    from searchengine_spark.index.build import IndexBuilder

    out = str(tmp_path / "shuffle_idx")
    pages = spark.createDataFrame(small_corpus_pdf).repartition(8)
    IndexBuilder(spark, out, bucket_docs=64, local_postings=False).build(pages)
    local = _load_engine_index(spark, built_index)  # built with default (local)
    shuf = _load_engine_index(spark, out)
    assert set(local) == set(shuf)
    for t in local:
        assert local[t] == shuf[t], f"postings differ for {t!r}"


def test_docs_table_matches_oracle(spark, built_index, oracle_index):
    docs = spark.read.parquet(os.path.join(built_index, "docs")).select(
        "doc_id", "url", "dl", "ld"
    )
    rows = {r["doc_id"]: r for r in docs.collect()}
    assert len(rows) == oracle_index.n_docs
    for d in range(oracle_index.n_docs):
        assert rows[d]["url"] == oracle_index.urls[d]
        assert rows[d]["dl"] == oracle_index.dl[d]
        assert rows[d]["ld"] == oracle_index.ld[d], f"Ld differs doc {d}"


def test_block_invariants(spark, built_index):
    post = spark.read.option(
        "basePath", os.path.join(built_index, "postings")
    ).parquet(os.path.join(built_index, "postings"))
    rows = post.collect()
    assert rows
    for r in rows:
        docs = decode_sorted(bytes(r["docs_vb"]))
        tfs = vb_decode(bytes(r["tfs_vb"])).astype(int)
        assert len(docs) == r["df_b"] == len(tfs)
        assert int(docs[0]) == r["doc_first"] and int(docs[-1]) == r["doc_last"]
        assert np.all(np.diff(docs) > 0), "docIDs strictly ascending in block"
        assert int(tfs.max()) == r["max_tf"]
        assert int(tfs.sum()) == r["cf_b"]
        assert r["bucket"] == r["doc_first"] // 64 == r["doc_last"] // 64
        assert abs(r["max_wdt"] - (1.0 + np.log(r["max_tf"]))) < 1e-12


def test_lexicon_df(spark, built_index, oracle_index):
    lex = spark.read.parquet(os.path.join(built_index, "lexicon"))
    rows = {r["term"]: r for r in lex.collect()}
    assert set(rows) == set(oracle_index.index)
    for t, plist in oracle_index.index.items():
        assert rows[t]["df"] == len(plist)
        assert rows[t]["cf"] == sum(len(p) for _, p in plist)


def test_build_from_html_only(spark, small_corpus_pdf, built_index, tmp_path):
    """Pages carrying ONLY html (text null) index identically: the build
    extracts text via the Arrow UDF (byte-identity invariant)."""
    from searchengine_spark.index.build import IndexBuilder
    from searchengine_spark.query.exec import IndexHandle, ranked_topk

    sub = small_corpus_pdf.head(80).copy()
    pages = spark.createDataFrame(sub).withColumn(
        "text", F.lit(None).cast("string")
    )
    out = str(tmp_path / "html_idx")
    IndexBuilder(spark, out, bucket_docs=64).build(pages)

    ref_pages = spark.createDataFrame(sub)
    out2 = str(tmp_path / "text_idx")
    IndexBuilder(spark, out2, bucket_docs=64).build(ref_pages)
    for q in ["fast data", "state-of"]:
        a = [(r["url"], round(r["score"], 9))
             for r in ranked_topk(IndexHandle(spark, out), q, k=10, scorer="bm25").collect()]
        b = [(r["url"], round(r["score"], 9))
             for r in ranked_topk(IndexHandle(spark, out2), q, k=10, scorer="bm25").collect()]
        assert a == b, q


def test_resume_skips_committed_chunks(spark, small_corpus_pdf, built_index):
    """Re-running build over an already-complete directory must do no
    chunk work (all manifests committed) and leave results identical."""
    from searchengine_spark.index.build import IndexBuilder

    manifests = sorted(os.listdir(os.path.join(built_index, "_manifests")))
    b = IndexBuilder(spark, built_index, bucket_docs=64, chunk_docs=128)
    pages = spark.createDataFrame(small_corpus_pdf)
    stats = b.build(pages)
    assert stats["n_docs"] == 300
    assert sorted(os.listdir(os.path.join(built_index, "_manifests"))) == manifests
    # every chunk manifest carries lineage + metrics
    for m in manifests:
        payload = json.load(open(os.path.join(built_index, "_manifests", m)))
        if payload.get("stage") == "postings":
            assert payload["postings_per_sec"] > 0
            assert payload["lineage"]["bucket_docs"] == 64
