"""Block-max pruning correctness: WAND top-k must be identical (docs AND
scores) to full evaluation — the safety property classic tiering lacks."""

import pytest

from searchengine_spark.query.exec import IndexHandle, ranked_topk
from searchengine_spark.query.wand import ranked_topk_wand

QUERIES = [
    "spark",
    "fast data",
    "spark stream window",
    "the",  # stopword: every bucket has it, UB pruning must still be exact
    "state-of",
    "merge sort join hash scan filter group order",
    "zzzzabsent",
    "vanilla-shake customer",
]


@pytest.fixture(scope="module")
def handle(spark, built_index):
    return IndexHandle(spark, built_index)


@pytest.mark.parametrize("scorer", ["tfidf_ref", "bm25"])
@pytest.mark.parametrize("q", QUERIES)
def test_wand_equals_full(handle, q, scorer):
    stats: dict = {}
    got = [
        (r["doc_id"], r["score"])
        for r in ranked_topk_wand(handle, q, k=20, scorer=scorer, probe=2, stats=stats).collect()
    ]
    want = [
        (r["doc_id"], r["score"])
        for r in ranked_topk(handle, q, k=20, scorer=scorer).collect()
    ]
    assert got == want, (q, scorer, stats, got[:5], want[:5])
    if got:
        assert stats["n_buckets"] > 0
        assert stats["pruned"] >= 0
        assert stats["probed"] + stats["survivors"] + stats["pruned"] == stats["n_buckets"]


def test_wand_prunes_on_clustered_corpus(spark, tmp_path):
    """On a topic-clustered corpus (heterogeneous per-bucket maxima) WAND
    must prune a substantial fraction of buckets and stay exact."""
    from searchengine_spark.corpus import generate_pages, topic_terms
    from searchengine_spark.index.build import IndexBuilder

    out = str(tmp_path / "clustered_idx")
    pages = generate_pages(spark, 2000, parallelism=8, clustered=True)
    IndexBuilder(spark, out, bucket_docs=128).build(pages)
    idx = IndexHandle(spark, out)
    q = " ".join(topic_terms(5, 3))
    stats: dict = {}
    got = [
        (r["doc_id"], r["score"])
        for r in ranked_topk_wand(idx, q, k=10, scorer="bm25", probe=3, stats=stats).collect()
    ]
    want = [
        (r["doc_id"], r["score"])
        for r in ranked_topk(idx, q, k=10, scorer="bm25").collect()
    ]
    assert got == want
    assert stats["pruned"] / stats["n_buckets"] > 0.3, stats


def test_wand_prunes_selective_query(handle):
    """A rare term confined to few buckets must actually prune blocks once
    the probe fills k (k=1 makes θ high enough on the 300-doc corpus)."""
    stats: dict = {}
    ranked_topk_wand(handle, "vanilla-shake", k=1, scorer="bm25", probe=1, stats=stats).collect()
    assert stats["pruned"] > 0, stats
