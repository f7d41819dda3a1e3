"""Boolean/phrase engine vs the pure-Python oracle backend — same planner,
independent backends (SURVEY §2.4/§2.7). Queries exercise every J1-J5
merge and the reference parser's observable quirks."""

import pytest

from searchengine_spark.oracle.boolmodel import boolean_query_oracle
from searchengine_spark.query.boolean import (
    boolean_query,
    optimize_query,
    validate_query,
)
from searchengine_spark.query.exec import IndexHandle

QUERIES = [
    # J1 AND
    "spark merge",
    "merge sort join",
    "the a",
    # J2 OR
    "spark + merge",
    "spark + merge + vector",
    "fast data + slow query",
    # J3 NOT
    "spark -slow",
    "-slow spark",
    "spark merge -slow -fast",
    # J4 phrase (index-side hyphen expansion makes "state of" adjacent)
    '"state of"',
    '"fast key"',
    '"fast key" table',
    '"the a"',
    '"batch batch"',
    '"spark stream window"',
    '-"the a" spark',
    '"zzz yyy" spark',  # empty phrase group silently dropped (:92-99)
    # null-propagation quirks
    "spark zzzmissing",  # absent positive nulls the AND (:173-174)
    "spark -zzzmissing",  # absent NOT nulls the AND too (:158-159)
    "spark + zzzmissing",  # null OR branch skipped (:49-53)
    "zzzmissing + zzzalso",
    # validation (Q4): every OR branch needs a positive literal
    "-spark",
    "spark + -slow",
    # hyphen deletion (Q5) and tokenizer quirks
    "vanilla-shake",
    "ice-cream-cone spark",
    "snake_case spark",  # '_' dropped by optimizeQuery re-tokenization
    "don't stop",
    '"don\'t stop"',
    "b2b 42",
    # single term
    "spark",
    "zzzmissing",
    "",
    "   ",
    # positives dropped by optimizeQuery re-tokenization → the reference
    # NPEs (BooleanQueryParser.java:453); we define no-match
    "((( -spark",
    "--- -merge",
]


@pytest.fixture(scope="module")
def handle(spark, built_index):
    return IndexHandle(spark, built_index)


def test_optimize_query_reorders_and_retokenizes():
    assert optimize_query("-slow spark") == "spark -slow"
    assert optimize_query('-"a b" fast "c d" -not') == 'fast "c d" -not -"a b"'
    assert optimize_query("snake_case spark") == "snake case spark"


def test_validate_query():
    assert validate_query("spark")
    assert not validate_query("-spark")
    assert validate_query("spark -slow")
    assert not validate_query("spark + -slow")
    assert validate_query('"a b" -c')
    assert not validate_query('-"a b"')


@pytest.mark.parametrize("q", QUERIES)
def test_boolean_vs_oracle(handle, oracle_index, q):
    got = [
        r["doc_id"] for r in boolean_query(handle, q, with_urls=False).collect()
    ]
    want = boolean_query_oracle(oracle_index, q)
    assert got == want, (q, got[:20], want[:20])


def test_boolean_returns_urls(handle, oracle_index):
    rows = boolean_query(handle, "spark merge").collect()
    assert all(r["url"] == oracle_index.urls[r["doc_id"]] for r in rows)


def test_near_query(handle, oracle_index):
    from searchengine_spark.query.boolean import near_query
    from searchengine_spark.text.tokenizer import normalize_query_token

    ta, tb = normalize_query_token("fast"), normalize_query_token("key")
    for k in (1, 3):
        got = [r["doc_id"] for r in near_query(handle, "fast", "key", k, with_urls=False).collect()]
        want = sorted(
            d
            for d, pa in oracle_index.index.get(ta, [])
            for db, pb in oracle_index.index.get(tb, [])
            if d == db and any(p + kk in pb for p in pa for kk in range(1, k + 1))
        )
        assert got == sorted(set(want)), (k, got, want)
    # NEAR/1 ≡ phrase J4
    phrase = [r["doc_id"] for r in boolean_query(handle, '"fast key"', with_urls=False).collect()]
    near1 = [r["doc_id"] for r in near_query(handle, "fast", "key", 1, with_urls=False).collect()]
    assert phrase == near1
