"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Covers the BASELINE.json metric surface:
  - index-build docs/sec over a deterministic synthetic pages corpus
    (reference-faithful tokenize→index pipeline)
  - ranked top-k serving: batch throughput (q/s over the 225-query
    Cranfield-shaped set — comparable to the reference's 29.95 q/s
    single-thread batch number) and interactive p50/p95 latency
  - per-query wall times for the SQL-oracle analytics suite at
    $SPARK_GRAFT_SF_DIR

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_DOCS (default 20000),
SPARK_GRAFT_SCALING=1 adds a local[8]-vs-local[32] build-throughput
scaling measurement (the sandbox stand-in for N vs 4N executors).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


_SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def _build_and_query(
    cpus: int,
    n_docs: int,
    run_queries: bool,
    bucket_docs: int = 1 << 12,
    build_reps: int = 1,
    query_reps: int = 3,
) -> dict:
    """Time the build reading a PRE-MATERIALIZED pages table (the real
    input shape — corpus synthesis is staged to parquet untimed), index
    dir on tmpfs (the sandbox stand-in for per-executor local disks).

    This VM's benchmarks are ±15-25% noisy (hypervisor sharing), so every
    reported number is a MEDIAN of reps taken inside this function, with
    the min–max band recorded alongside (round-1 lesson: single-shot
    numbers did not reproduce under the driver)."""
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from searchengine_spark.corpus import generate_pages, generate_queries
    from searchengine_spark.index.build import IndexBuilder
    from searchengine_spark.query.exec import IndexHandle, ranked_topk, ranked_topk_batch
    from searchengine_spark.session import get_spark

    spark = get_spark(f"bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    out: dict = {"cpus": cpus, "n_docs": n_docs}
    pages_dir = tempfile.mkdtemp(prefix=f"bench_pages_{cpus}_", dir=_SCRATCH)
    idx_dirs = []
    try:
        generate_pages(spark, n_docs, parallelism=cpus * 2).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
        build_secs = []
        for rep in range(build_reps):
            idx_dir = tempfile.mkdtemp(
                prefix=f"bench_index_{cpus}_{rep}_", dir=_SCRATCH
            )
            idx_dirs.append(idx_dir)
            t0 = time.time()
            IndexBuilder(spark, idx_dir, bucket_docs=bucket_docs).build(pages)
            build_secs.append(time.time() - t0)
            if rep < build_reps - 1:
                shutil.rmtree(idx_dir, ignore_errors=True)
        build_sec = _median(build_secs)
        out["build_sec"] = build_sec
        out["build_docs_per_sec"] = n_docs / build_sec
        out["build_docs_per_sec_band"] = [
            n_docs / max(build_secs),
            n_docs / min(build_secs),
        ]
        idx_dir = idx_dirs[-1]

        if run_queries:
            idx = IndexHandle(spark, idx_dir)
            idx.postings = idx.postings.cache()
            idx.docs = idx.docs.cache()
            idx.lexicon = idx.lexicon.cache()
            idx.postings.count(), idx.docs.count(), idx.lexicon.count()
            qs = generate_queries(225)
            # batch throughput (one job, all queries); rep 0 = warm-up
            batch_secs = []
            for rep in range(query_reps + 1):
                t0 = time.time()
                nres = ranked_topk_batch(idx, qs, k=20, scorer="bm25").count()
                if rep > 0:
                    batch_secs.append(time.time() - t0)
            out["batch_qps"] = len(qs) / _median(batch_secs)
            out["batch_qps_band"] = [
                len(qs) / max(batch_secs),
                len(qs) / min(batch_secs),
            ]
            out["batch_result_rows"] = nres
            # interactive latency over a sample — Spark job path
            lats = []
            for qid, q in qs[:20]:
                t0 = time.time()
                ranked_topk(idx, q, k=20, scorer="bm25").collect()
                lats.append(time.time() - t0)
            lats.sort()
            out["interactive_p50_sec"] = lats[len(lats) // 2]
            out["interactive_p95_sec"] = lats[int(len(lats) * 0.95) - 1]
            # …and the Spark-free serving tier over the same index:
            # median-of-reps percentiles after a warm-up pass
            from searchengine_spark.query.serve import LocalIndexReader

            reader = LocalIndexReader(idx_dir)
            for qid, q in qs[:50]:
                reader.ranked_topk(q, k=20, scorer="bm25")  # warm cache
            p50s, p95s, qpss = [], [], []
            for rep in range(query_reps):
                slats = []
                for qid, q in qs[:50]:
                    t0 = time.time()
                    reader.ranked_topk(q, k=20, scorer="bm25")
                    slats.append(time.time() - t0)
                slats.sort()
                p50s.append(slats[len(slats) // 2])
                p95s.append(slats[int(len(slats) * 0.95) - 1])
                qpss.append(len(slats) / sum(slats))
            out["serve_p50_sec"] = _median(p50s)
            out["serve_p95_sec"] = _median(p95s)
            out["serve_p50_band"] = [min(p50s), max(p50s)]
            out["serve_qps"] = _median(qpss)
    finally:
        for d in idx_dirs:
            shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(pages_dir, ignore_errors=True)
        spark.stop()
    return out


def _serve_clustered(cpus: int, n_docs: int) -> dict:
    """Serving-tier block-max pruning evidence on the topic-clustered
    corpus (the heterogeneous shape where upper-bound pruning pays):
    median p50 over topic-selective queries with pruning ON vs OFF, plus
    the measured pruned-bucket fraction."""
    from searchengine_spark.corpus import generate_pages, topic_terms
    from searchengine_spark.index.build import IndexBuilder
    from searchengine_spark.query.serve import LocalIndexReader
    from searchengine_spark.session import get_spark

    spark = get_spark(
        f"bench-clustered-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    idx_dir = tempfile.mkdtemp(prefix="bench_clustered_", dir=_SCRATCH)
    try:
        pages = generate_pages(spark, n_docs, parallelism=cpus * 2, clustered=True)
        IndexBuilder(spark, idx_dir, bucket_docs=1 << 8).build(pages)
    finally:
        spark.stop()
    try:
        reader = LocalIndexReader(idx_dir)
        queries = [" ".join(topic_terms(t % 16, 2 + t % 3)) for t in range(48)]
        for q in queries:  # warm metadata (lexicon/stats/doc-meta RAM)
            reader.ranked_topk(q, k=20, prune=True)
            reader.ranked_topk(q, k=20, prune=False)

        def _p50(fn):
            lats = []
            for q in queries:
                t0 = time.time()
                fn(q)
                lats.append(time.time() - t0)
            lats.sort()
            return round(lats[len(lats) // 2], 5)

        pruned_frac = []

        def _pruned_stats(q):
            st: dict = {}
            reader.ranked_topk(q, k=20, prune=True, stats=st)
            if st.get("n_buckets"):
                pruned_frac.append(st.get("pruned", 0) / st["n_buckets"])

        def _cold(fn):
            def run(q):
                reader._block_cache.clear()  # big-shard regime: blobs
                fn(q)                        # can't all stay RAM-hot

            return run

        out = {
            "n_docs": n_docs,
            # warm: every blob decoded+cached — pruning's UB pass is pure
            # overhead here, reported anyway for honesty
            "p50_warm_pruned_sec": _p50(
                lambda q: reader.ranked_topk(q, k=20, prune=True)
            ),
            "p50_warm_full_sec": _p50(
                lambda q: reader.ranked_topk(q, k=20, prune=False)
            ),
            # cold: pruning skips the blob fetch+decode of pruned buckets
            # — the regime block-max exists for
            "p50_cold_pruned_sec": _p50(
                _cold(lambda q: _pruned_stats(q))
            ),
            "p50_cold_full_sec": _p50(
                _cold(lambda q: reader.ranked_topk(q, k=20, prune=False))
            ),
        }
        out["mean_pruned_fraction"] = round(
            sum(pruned_frac) / max(len(pruned_frac), 1), 3
        )
        return out
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    result = _build_and_query(cpus, n_docs, run_queries=True, build_reps=3)
    serve_clustered = _serve_clustered(cpus, n_docs)

    # analytics suite at the given sf dir (fresh session reused from above
    # is gone; start one sized for the suite)
    import __spark_entry__ as entry_mod
    from searchengine_spark.session import get_spark

    spark = get_spark("bench-suite", master=f"local[{cpus}]", shuffle_partitions=cpus)
    per_query: dict[str, float] = {}
    try:
        for name, fn in entry_mod.queries().items():
            t0 = time.time()
            fn(spark, sf_dir).count()
            per_query[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        # N vs 4N cores on the SAME input (sandbox stand-in for N vs 4N
        # executors), medians of 3 builds each. Default pair 2→8: the
        # matched-workload multiprocessing control (BENCH/BASELINE.md §3)
        # shows this single shared-memory-bus host itself caps the
        # tokenize kernel at ~0.67 for 4→16 and ~0.88 for 2→8, so pairs
        # at higher N measure host memory-bus saturation, not the
        # engine. On a real cluster each executor brings its own bus.
        # NOISE FLOOR (measured, BASELINE.md §3): identical back-to-back
        # runs on this VM swing up to 78% — treat any single efficiency
        # number as a sample from a ±0.2 interval, never a verdict.
        n_lo = int(os.environ.get("SPARK_GRAFT_SCALING_N", "2"))
        # 400k docs: large enough that per-build fixed costs (range
        # sample + id-count jobs, ~3.5 s) amortize the way they would on
        # any at-scale corpus
        docs_s = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", str(max(n_docs, 400000))))
        lo = _build_and_query(
            n_lo, docs_s, run_queries=False, bucket_docs=1 << 14, build_reps=3
        )
        hi = _build_and_query(
            n_lo * 4, docs_s, run_queries=False, bucket_docs=1 << 14, build_reps=3
        )
        result["scaling"] = {
            "n_docs": docs_s,
            f"docs_per_sec_{n_lo}": lo["build_docs_per_sec"],
            f"docs_per_sec_{n_lo * 4}": hi["build_docs_per_sec"],
            f"band_{n_lo}": lo["build_docs_per_sec_band"],
            f"band_{n_lo * 4}": hi["build_docs_per_sec_band"],
            "efficiency": (hi["build_docs_per_sec"] / lo["build_docs_per_sec"]) / 4.0,
        }

    line = {
        "metric": "index_build_docs_per_sec",
        "value": round(result["build_docs_per_sec"], 2),
        "unit": "docs/sec",
        "queries": per_query,
        "sf": sf,
        "detail": {
            "build_sec": round(result["build_sec"], 2),
            "build_docs_per_sec_band": [
                round(x, 1) for x in result.get("build_docs_per_sec_band", [])
            ],
            "bench_docs": n_docs,
            "batch_qps": round(result.get("batch_qps", 0.0), 2),
            "batch_qps_band": [
                round(x, 2) for x in result.get("batch_qps_band", [])
            ],
            "interactive_p50_sec": round(result.get("interactive_p50_sec", 0.0), 3),
            "interactive_p95_sec": round(result.get("interactive_p95_sec", 0.0), 3),
            "serve_p50_sec": round(result.get("serve_p50_sec", 0.0), 4),
            "serve_p95_sec": round(result.get("serve_p95_sec", 0.0), 4),
            "serve_p50_band": [
                round(x, 4) for x in result.get("serve_p50_band", [])
            ],
            "serve_qps": round(result.get("serve_qps", 0.0), 1),
            "serve_clustered": serve_clustered,
            "scaling": result.get("scaling"),
        },
    }
    print(json.dumps(line))


if __name__ == "__main__":
    sys.exit(main())
