"""Tiered-labeler skew-bound evidence (VERDICT r4 #3): label ONE
synthetic hot term with --postings postings (default 10^8) through the
real streamed label stage (index/tiered._labels_streamed → flat-buffer
JDK heap replay) inside a Python worker whose memory is HARD-CAPPED via
spark.executor.pyspark.memory, and validate the result exactly.

    python jobs/tier_label_scale.py [--postings 100000000]
        [--mem-cap-mb 8192] [--style ties|zipf] [--out BENCH/...json]

What this proves: the parity-only tiered labeler's per-term task is
memory-BOUNDED at flat-buffer cost (docs 8 + tfs 8 + heap 16 + pops/out
~12 ≈ 40 B/posting peak, ~4 GB at 10^8 — not the object-heap ~100+
B/posting, and positions never enter the task), and fast enough to be
real (offers ~2M/s; polls stop at the tier-2 boundary — everything
still heaped is tier 3 by definition). The cap is enforced by the
worker's RLIMIT: the kernel itself asserts a finite RLIMIT_AS before
labeling, so a silently-uncapped run FAILS rather than proving nothing.

Validation is exact, not statistical:
  - style=ties (all tf equal — the worst tie-run shape, one run
    straddling both tier boundaries): the JDK pop order has a closed
    form (offers never sift among equals, each poll promotes the LAST
    slot to the root and ties break immediately), so pops =
    [0, n-1, n-2, …] and tier membership is asserted element-exactly:
    tier1 = {0} ∪ [n-t1+1, n-1], tier2 = [n-t1-t2+1, n-t1], rest 3,
    with t1 = ⌈n/10⌉, t2 = ⌈n/3⌉. The same closed form is
    cross-checked against the object heap at small n first.
  - style=zipf (tf = (doc_id % 997) + 1): exact quota counts per tier,
    plus per-tf-histogram consistency — every tf strictly above the
    tier-1 boundary tf must be entirely tier 1, etc. (membership inside
    the boundary tf-run is heap-order-dependent; counts there are
    asserted to make the quotas exact).

At 10^9+ postings/term the single sequential task remains the declared
bit-fidelity floor (VERDICT r4, CLAUDE.md): ~40 GB and ~1-4 h for one
such term. The headline serving path (flat/WAND/BM25) never runs this
labeler; it exists for rank-identity with the reference's ACTIVE tiered
configuration (TieredIndexWriter.java:91-208).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--postings", type=int, default=100_000_000)
    ap.add_argument("--mem-cap-mb", type=int, default=8192)
    ap.add_argument("--style", choices=("ties", "zipf"), default="ties")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    # closed-form sanity vs the object heap at small n BEFORE burning the
    # big run (the fuzz suite pins this too; cheap to re-assert here)
    from searchengine_spark.index.javapq import assign_tiers

    for n_small in (10, 1000, 4096):
        want = assign_tiers(list(range(n_small)), [1] * n_small)
        got = _ties_closed_form(n_small)
        assert np.array_equal(np.asarray(want, dtype=np.int32), got), n_small

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("tier-label-scale")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.executor.pyspark.memory", f"{args.mem_cap_mb}m")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000000")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    n = args.postings
    t1 = math.ceil(n / 10)
    t2 = math.ceil(n / 3)
    slim = spark.range(0, n, 1, args.cpus).select(
        F.lit("the").alias("term"),
        F.col("id").alias("doc_id"),
        (
            (F.col("id") % 997 + 1) if args.style == "zipf" else F.lit(1)
        ).cast("int").alias("tf"),
    )

    from searchengine_spark.index.tiered import (
        LABEL_SCHEMA,
        _label_tier_one,
        _labels_streamed,
    )

    def label_one_capped(term, docs, tfs):
        # self-validating cap: prove the worker really runs under a
        # finite address-space rlimit before doing the big work
        import resource

        soft, _hard = resource.getrlimit(resource.RLIMIT_AS)
        if soft == resource.RLIM_INFINITY:
            raise AssertionError(
                "worker RLIMIT_AS is unlimited - spark.executor.pyspark.memory "
                "cap did not reach the Python worker; the run proves nothing"
            )
        return _label_tier_one(term, docs, tfs)

    t0 = time.time()
    labels = _labels_streamed(slim, label_one_capped, LABEL_SCHEMA)
    if args.style == "ties":
        # element-exact membership via the closed form, verified
        # DISTRIBUTED (no driver collect of 10^8 rows): count rows whose
        # label disagrees with the closed-form tier of their doc_id
        expect = (
            F.when(
                (F.col("doc_id") == 0) | (F.col("doc_id") >= n - t1 + 1), 1
            )
            .when(F.col("doc_id") >= n - t1 - t2 + 1, 2)
            .otherwise(3)
        )
        agg = labels.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("tier") != expect).cast("long")).alias("mismatch"),
            F.sum((F.col("tier") == 1).cast("long")).alias("n1"),
            F.sum((F.col("tier") == 2).cast("long")).alias("n2"),
            F.sum((F.col("tier") == 3).cast("long")).alias("n3"),
        ).collect()[0]
        assert agg["mismatch"] == 0, agg
    else:
        # exact quotas + histogram consistency: tiers must be a
        # descending-tf prefix partition up to the two boundary tf runs.
        # tf is a pure function of doc_id here, so recompute it instead
        # of joining two 10^8-row frames
        hist = (
            labels.withColumn("tf", (F.col("doc_id") % 997 + 1).cast("int"))
            .groupBy("tf", "tier")
            .count()
        )
        rows = hist.collect()
        by_tf: dict[int, dict[int, int]] = {}
        for r in rows:
            by_tf.setdefault(r["tf"], {})[r["tier"]] = r["count"]
        agg_counts = {1: 0, 2: 0, 3: 0}
        for c in by_tf.values():
            for tier, k in c.items():
                agg_counts[tier] += k
        assert agg_counts[1] == t1 and agg_counts[2] == t2, agg_counts
        assert agg_counts[3] == n - t1 - t2, agg_counts
        # monotonicity: once a tf value contains any tier-t posting, no
        # STRICTLY SMALLER tf may contain a tier-(<t) posting
        min_tf_in = {
            t: min((tf for tf, c in by_tf.items() if c.get(t)), default=None)
            for t in (1, 2)
        }
        for tf, c in by_tf.items():
            if min_tf_in[1] is not None and tf < min_tf_in[1]:
                assert not c.get(1), (tf, c)
            if min_tf_in[2] is not None and tf < min_tf_in[2]:
                assert not c.get(2), (tf, c)
        agg = {
            "rows": sum(agg_counts.values()),
            "mismatch": 0,
            "n1": agg_counts[1],
            "n2": agg_counts[2],
            "n3": agg_counts[3],
        }
    wall = time.time() - t0

    result = {
        "postings": n,
        "style": args.style,
        "mem_cap_mb": args.mem_cap_mb,
        "cpus": args.cpus,
        "wall_sec": round(wall, 1),
        "postings_per_sec": round(n / wall, 0),
        "tier_counts": {
            "1": int(agg["n1"]),
            "2": int(agg["n2"]),
            "3": int(agg["n3"]),
        },
        "quotas": {"t1": t1, "t2": t2, "t3": n - t1 - t2},
        "exact_membership_mismatches": int(agg["mismatch"]) if args.style == "ties" else None,
        "rows": int(agg["rows"]),
        "validated": "closed-form element-exact" if args.style == "ties" else "quota+histogram exact",
    }
    assert result["tier_counts"] == {
        "1": t1, "2": t2, "3": n - t1 - t2
    }, result
    line = json.dumps(result, sort_keys=True)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()


def _ties_closed_form(n: int):
    """Tier labels for an all-equal-tf term of n postings: pops =
    [0, n-1, n-2, …] (see module docstring)."""
    import math as _math

    import numpy as np

    t1 = _math.ceil(n / 10)
    t2 = _math.ceil(n / 3)
    out = np.full(n, 3, dtype=np.int32)
    pops = np.concatenate(
        ([0], np.arange(n - 1, 0, -1))
    )[: min(t1 + t2, n)]
    out[pops[:t1]] = 1
    out[pops[t1:]] = 2
    return out


if __name__ == "__main__":
    main()
