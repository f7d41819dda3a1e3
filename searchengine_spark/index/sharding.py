"""Shard-parallel index builds: split a pages table into url ranges and
build one independent index per range, each over a disjoint
bucket-aligned doc_id range.

This is the orchestration layer over ``IndexBuilder(id_base=...)`` —
the shape a 10^12-doc build actually runs as: each shard is its own
build job (own cluster run, own failure/retry domain, own resumable
manifests), and the serving root (`query/sharded.py`) combines them
with global statistics. Nothing about correctness needs the shards'
id ranges to be globally DENSE — scoring uses corpus COUNTS (N, df,
total_dl), never id arithmetic — so each shard's base just rounds up
past the previous shard's end to the next bucket boundary and the gap
is dead id space. That keeps base computation a pure prefix sum of
per-range counts: no global re-numbering pass over the corpus, and a
shard can be REBUILT with more docs later without renumbering its
neighbours (it owns [base_k, base_{k+1})).

Ranges come from url quantiles (``approx_percentile`` over the key
column only — a thin scan), then one exact count per range (same thin
scan, predicate-pushed) fixes the bases. At web scale both passes are
metadata-cheap relative to the build itself; the counts also give the
builder's density net its closed forms per shard.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import DEFAULT_BUCKET_DOCS, IndexBuilder


def shard_boundaries(
    pages: DataFrame,
    n_shards: int,
    key: str = "url",
    sample_rows: int = 20_000,
    seed: int = 7,
) -> list[str]:
    """Interior split keys (len ≤ n_shards-1); shard k is [b_{k-1}, b_k)
    with open ends. Boundaries come from quantiles of a bounded key
    SAMPLE (the same approach Spark's RangePartitioner uses — string
    keys have no percentile_approx), so boundary quality degrades
    gracefully, never the cost: two thin key-only scans regardless of
    corpus size. Duplicate sample quantiles (tiny or skewed inputs) are
    collapsed — callers may get fewer, wider shards."""
    if n_shards < 2:
        return []
    total = pages.select(key).count()
    if total == 0:
        return []
    frac = min(1.0, sample_rows / total)
    ks = sorted(
        r[0]
        for r in pages.select(key).sample(False, frac, seed=seed).collect()
    )
    if not ks:
        return []
    out: list[str] = []
    for i in range(1, n_shards):
        b = ks[min(len(ks) - 1, i * len(ks) // n_shards)]
        if not out or b > out[-1]:
            out.append(b)
    return out


def _range_filter(key: str, lo: str | None, hi: str | None):
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(key) >= lo)
    if hi is not None:
        cond = cond & (F.col(key) < hi)
    return cond


def build_sharded(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    n_shards: int,
    bucket_docs: int = DEFAULT_BUCKET_DOCS,
    key: str = "url",
    **builder_kwargs,
) -> dict:
    """Build ``n_shards`` independent indexes under ``out_root/shard=k``.

    Returns {"shards": [paths...], "bases": [...], "counts": [...],
    "stats": [...]} — feed the paths to
    ``query.sharded.ShardedIndexReader``. Each shard build is itself
    resumable (IndexBuilder manifests); re-invoking after a crash skips
    completed shards' committed stages.
    """
    bounds = shard_boundaries(pages, n_shards, key)
    edges = [None, *bounds, None]
    ranges = list(zip(edges[:-1], edges[1:]))
    # one exact count per range on the key column only (thin, pushed);
    # empty ranges (degenerate sample boundaries) are dropped outright
    counted = [
        (r, pages.where(_range_filter(key, *r)).select(key).count())
        for r in ranges
    ]
    counted = [(r, c) for r, c in counted if c > 0]
    ranges = [r for r, _ in counted]
    counts = [c for _, c in counted]
    bases, acc = [], 0
    for c in counts:
        bases.append(acc)
        # next shard starts at the next bucket boundary past our end —
        # the gap is dead id space, harmless by design (see module doc)
        acc = int(math.ceil((acc + c) / bucket_docs) * bucket_docs)
    paths, stats = [], []
    for k, ((lo, hi), base, c) in enumerate(zip(ranges, bases, counts)):
        out = os.path.join(out_root, f"shard={k}")
        b = IndexBuilder(
            spark, out, bucket_docs=bucket_docs, id_base=base, **builder_kwargs
        )
        st = b.build(pages.where(_range_filter(key, lo, hi)))
        if st["n_docs"] != c:
            raise RuntimeError(
                f"shard {k}: built {st['n_docs']} docs, range count was {c} "
                "— input changed between the count pass and the build"
            )
        paths.append(out)
        stats.append(st)
    return {"shards": paths, "bases": bases, "counts": counts, "stats": stats}
