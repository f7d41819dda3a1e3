"""Sharded serving must be indistinguishable from a single index.

Two (and three) doc-range shards are built independently with
``IndexBuilder(id_base=...)`` over url-ordered slices of the SAME
300-page corpus as the session ``built_index``, so shard doc_ids line
up with the unsharded index's dense ids. The sharded reader
(query/sharded.py) must then return bit-identical scores and identical
doc lists for the full ranked + boolean battery — this is the proof
that global-statistics injection (N, avgdl, summed df via ext_stats)
removes every shard-layout dependence from scoring.
"""

import pytest

from searchengine_spark.query.serve import LocalIndexReader
from searchengine_spark.query.sharded import ShardedIndexReader

QUERIES = [
    "the",
    "fast data",
    "spark stream window",
    "state-of",
    "the the",
    "zzzzabsent",
    "merge sort join hash scan filter group order",
]

BOOL_QUERIES = [
    "spark merge",
    "spark + merge + vector",
    "spark -slow",
    '"state of"',
    '"fast key" table',
    "snake_case spark",
]

# url-ordered split points; multiples of bucket_docs=64 as id_base requires
SPLITS_2 = [0, 192, 300]
SPLITS_3 = [0, 64, 192, 300]


def _build_shards(spark, pdf, tmp_path_factory, splits, bucket_docs=64):
    from searchengine_spark.index.build import IndexBuilder

    pdf = pdf.sort_values("url").reset_index(drop=True)
    paths = []
    for lo, hi in zip(splits, splits[1:]):
        out = str(tmp_path_factory.mktemp(f"shard_{lo}"))
        pages = spark.createDataFrame(pdf.iloc[lo:hi])
        b = IndexBuilder(spark, out, bucket_docs=bucket_docs, id_base=lo)
        stats = b.build(pages)
        assert stats["n_docs"] == hi - lo
        paths.append(out)
    return paths


@pytest.fixture(scope="module")
def single(built_index):
    return LocalIndexReader(built_index)


@pytest.fixture(scope="module")
def sharded2(spark, small_corpus_pdf, tmp_path_factory):
    return ShardedIndexReader(
        _build_shards(spark, small_corpus_pdf, tmp_path_factory, SPLITS_2)
    )


@pytest.fixture(scope="module")
def sharded3(spark, small_corpus_pdf, tmp_path_factory):
    return ShardedIndexReader(
        _build_shards(spark, small_corpus_pdf, tmp_path_factory, SPLITS_3)
    )


def test_global_stats_aggregation(single, sharded2):
    assert sharded2.n_docs == int(single.meta["n_docs"])
    assert sharded2.avgdl == float(single.meta["avgdl"])
    terms = ["the", "spark", "data", "zzzzabsent"]
    assert sharded2.term_stats(terms) == single.term_stats(terms)


@pytest.mark.parametrize("scorer", ["tfidf_ref", "bm25"])
@pytest.mark.parametrize("q", QUERIES)
def test_sharded_ranked_bit_identical(single, sharded2, q, scorer):
    want = single.ranked_topk(q, k=20, scorer=scorer)
    got = sharded2.ranked_topk(q, k=20, scorer=scorer)
    assert [(r["doc_id"], r["score"], r["url"]) for r in got] == [
        (r["doc_id"], r["score"], r["url"]) for r in want
    ], q


@pytest.mark.parametrize("q", QUERIES[:4])
def test_three_uneven_shards(single, sharded3, q):
    want = single.ranked_topk(q, k=20, scorer="bm25")
    got = sharded3.ranked_topk(q, k=20, scorer="bm25")
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ], q


@pytest.mark.parametrize("q", BOOL_QUERIES)
def test_sharded_boolean(single, sharded2, q):
    got = [r["doc_id"] for r in sharded2.boolean_query(q)]
    want = [r["doc_id"] for r in single.boolean_query(q)]
    assert got == want, q


@pytest.fixture(scope="module")
def orchestrated(spark, small_corpus_pdf, tmp_path_factory):
    """build_sharded: boundaries + bases computed BY the orchestrator
    (sampled url quantiles, bucket-aligned prefix-sum bases with gaps),
    not hand-picked splits."""
    from searchengine_spark.index.sharding import build_sharded

    out_root = str(tmp_path_factory.mktemp("sharded_auto"))
    pages = spark.createDataFrame(small_corpus_pdf)
    res = build_sharded(spark, pages, out_root, n_shards=3, bucket_docs=64)
    return res


def test_build_sharded_layout(orchestrated):
    res = orchestrated
    assert sum(res["counts"]) == 300
    assert all(b % 64 == 0 for b in res["bases"])
    # disjoint, increasing id ranges (gaps allowed by design)
    for b, c, nb in zip(res["bases"], res["counts"], res["bases"][1:]):
        assert b + c <= nb


@pytest.mark.parametrize("scorer", ["tfidf_ref", "bm25"])
@pytest.mark.parametrize("q", QUERIES[:5])
def test_build_sharded_scores_layout_independent(single, orchestrated, q, scorer):
    """Shard doc_ids here DIFFER from the single index (quantile ranges,
    base gaps) — yet (url, score) lists must match exactly, proving the
    global-stats injection makes scores independent of the id/shard
    layout entirely."""
    sharded = ShardedIndexReader(orchestrated["shards"])
    want = [(r["url"], r["score"]) for r in single.ranked_topk(q, k=20, scorer=scorer)]
    got = [(r["url"], r["score"]) for r in sharded.ranked_topk(q, k=20, scorer=scorer)]
    assert got == want, q


def test_build_sharded_boolean_same_urls(single, orchestrated):
    sharded = ShardedIndexReader(orchestrated["shards"])
    for q in BOOL_QUERIES[:3]:
        want = sorted(r["url"] for r in single.boolean_query(q))
        got = sorted(r["url"] for r in sharded.boolean_query(q))
        assert got == want, q


def _mk_pages(rows):
    import datetime

    import pandas as pd

    return pd.DataFrame(
        [
            {
                "url": u,
                "warc_ts": datetime.datetime(2020, 1, 1),
                "lang": "en",
                "text": t,
            }
            for u, t in rows
        ]
    )


@pytest.fixture(scope="module")
def skewed_shards(spark, tmp_path_factory):
    """3 shards where one owns all the high-tf 'zebra' docs — the shape
    where shard-level UB pruning must actually skip shards."""
    from searchengine_spark.index.build import IndexBuilder

    rows0 = [
        (f"a{i:03d}", "zebra zebra zebra zebra common words here")
        for i in range(30)
    ]
    rows1 = [
        (f"m{i:03d}", ("zebra " if i == 0 else "") + "common words too")
        for i in range(30)
    ]
    rows2 = [(f"t{i:03d}", "plain common words also") for i in range(30)]
    paths = []
    for k, rows in enumerate([rows0, rows1, rows2]):
        out = str(tmp_path_factory.mktemp(f"skew{k}"))
        IndexBuilder(spark, out, bucket_docs=64, id_base=64 * k).build(
            spark.createDataFrame(_mk_pages(rows))
        )
        paths.append(out)
    return paths


def test_shard_prune_skips_and_stays_exact(skewed_shards):
    # max_workers=1 → one shard per wave: the cascade actually runs.
    seq = ShardedIndexReader(skewed_shards, max_workers=1)
    full = ShardedIndexReader(skewed_shards)
    st: dict = {}
    got = seq.ranked_topk("zebra", k=5, stats=st)
    want = full.ranked_topk("zebra", k=5, shard_prune=False)
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    assert st["evaluated"] + st["skipped"] == 3
    # the low-tf shards' UB sits far below θ from the high-tf shard
    assert st["skipped"] >= 1, st


@pytest.mark.parametrize("scorer", ["tfidf_ref", "bm25"])
@pytest.mark.parametrize("q", QUERIES[:5])
def test_shard_prune_exact_sequential(single, sharded2, spark, small_corpus_pdf, tmp_path_factory, q, scorer):
    """Sequential cascade (wave=1) over the 2-shard split must still be
    bit-identical to the single index for the whole battery — pruning
    is exact, not approximate."""
    seq = ShardedIndexReader(
        [s.path for s in sharded2.shards], max_workers=1
    )
    want = single.ranked_topk(q, k=20, scorer=scorer)
    got = seq.ranked_topk(q, k=20, scorer=scorer)
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ], q


def test_root_refuses_overlapping_shards(sharded2, built_index):
    # the unsharded index claims [0, 300) and shard A claims [0, 192):
    # combining them would alias doc_ids — the root must refuse at open
    with pytest.raises(ValueError, match="overlap"):
        ShardedIndexReader([built_index, sharded2.shards[0].path])


def test_id_base_must_be_bucket_aligned(spark, tmp_path_factory):
    from searchengine_spark.index.build import IndexBuilder

    with pytest.raises(ValueError, match="multiple of bucket_docs"):
        IndexBuilder(
            spark,
            str(tmp_path_factory.mktemp("bad")),
            bucket_docs=64,
            id_base=100,
        )
