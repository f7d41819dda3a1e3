"""Local replica of the driver's correctness gate: every queries() entry
runs on Spark at sf0.01 and must match its oracle_sql() on DuckDB
(row count + schema + order-insensitive values)."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _canon(v):
    """Driver-faithful canonical repr: the driver value-hashes each cell's
    repr, so an int64 976742 vs float64 976742.0 MUST fail here too (that
    exact dtype drift was round 1's events_json hash-fail), and floats
    compare bit-exact post-rounding — no tolerance."""
    item = getattr(v, "item", None)
    if item is not None:
        v = item()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return repr(v)


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        name,
        spark_pdf.columns,
        duck_pdf.columns,
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    assert len(a) == len(b), f"{name}: rowcount {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            cx, cy = _canon(x), _canon(y)
            assert cx == cy, f"{name}.{c}[{i}]: spark={cx} duck={cy}"


ALL = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    assert sql is not None, f"{name} lacks an oracle"
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(sql).fetchdf()
    assert len(spark_pdf) > 0 or name in ("jaccard_pairs", "phrase_adjacent"), (
        f"{name}: empty result — weak test"
    )
    _compare(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "url", "score"} <= set(df.columns)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
