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


def _build_and_query(
    cpus: int, n_docs: int, run_queries: bool, bucket_docs: int = 1 << 12
) -> dict:
    """Time the build reading a PRE-MATERIALIZED pages table (the real
    input shape — corpus synthesis is staged to parquet untimed), index
    dir on tmpfs (the sandbox stand-in for per-executor local disks)."""
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from searchengine_spark.corpus import generate_pages, generate_queries
    from searchengine_spark.index.build import IndexBuilder
    from searchengine_spark.query.exec import IndexHandle, ranked_topk, ranked_topk_batch
    from searchengine_spark.session import get_spark

    spark = get_spark(f"bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    out: dict = {"cpus": cpus, "n_docs": n_docs}
    idx_dir = tempfile.mkdtemp(prefix=f"bench_index_{cpus}_", dir=_SCRATCH)
    pages_dir = tempfile.mkdtemp(prefix=f"bench_pages_{cpus}_", dir=_SCRATCH)
    try:
        generate_pages(spark, n_docs, parallelism=cpus * 2).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
        t0 = time.time()
        IndexBuilder(spark, idx_dir, bucket_docs=bucket_docs).build(pages)
        build_sec = time.time() - t0
        out["build_sec"] = build_sec
        out["build_docs_per_sec"] = n_docs / build_sec

        if run_queries:
            idx = IndexHandle(spark, idx_dir)
            idx.postings = idx.postings.cache()
            idx.docs = idx.docs.cache()
            idx.lexicon = idx.lexicon.cache()
            idx.postings.count(), idx.docs.count(), idx.lexicon.count()
            qs = generate_queries(225)
            # batch throughput (one job, all queries)
            t0 = time.time()
            nres = ranked_topk_batch(idx, qs, k=20, scorer="bm25").count()
            batch_sec = time.time() - t0
            out["batch_queries_sec"] = batch_sec
            out["batch_qps"] = len(qs) / batch_sec
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
            # …and the Spark-free serving tier over the same index
            from searchengine_spark.query.serve import LocalIndexReader

            reader = LocalIndexReader(idx_dir)
            reader.ranked_topk("warm up", k=20)
            slats = []
            for qid, q in qs[:50]:
                t0 = time.time()
                reader.ranked_topk(q, k=20, scorer="bm25")
                slats.append(time.time() - t0)
            slats.sort()
            out["serve_p50_sec"] = slats[len(slats) // 2]
            out["serve_p95_sec"] = slats[int(len(slats) * 0.95) - 1]
            out["serve_qps"] = len(slats) / sum(slats)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(pages_dir, ignore_errors=True)
        spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    result = _build_and_query(cpus, n_docs, run_queries=True)

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
        # executors). Default pair 4→16: the host advertises 32 vCPUs but
        # saturates near 24 busy threads (driver + OS share the box), so
        # 8→32 measures hypervisor contention, not the engine — both
        # pairs are reported in BENCH/BASELINE.md.
        n_lo = int(os.environ.get("SPARK_GRAFT_SCALING_N", "4"))
        docs_s = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", str(max(n_docs, 200000))))
        lo = _build_and_query(n_lo, docs_s, run_queries=False, bucket_docs=1 << 14)
        hi = _build_and_query(n_lo * 4, docs_s, run_queries=False, bucket_docs=1 << 14)
        result["scaling"] = {
            "n_docs": docs_s,
            f"docs_per_sec_{n_lo}": lo["build_docs_per_sec"],
            f"docs_per_sec_{n_lo * 4}": hi["build_docs_per_sec"],
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
            "bench_docs": n_docs,
            "batch_qps": round(result.get("batch_qps", 0.0), 2),
            "interactive_p50_sec": round(result.get("interactive_p50_sec", 0.0), 3),
            "interactive_p95_sec": round(result.get("interactive_p95_sec", 0.0), 3),
            "serve_p50_sec": round(result.get("serve_p50_sec", 0.0), 4),
            "serve_p95_sec": round(result.get("serve_p95_sec", 0.0), 4),
            "serve_qps": round(result.get("serve_qps", 0.0), 1),
            "scaling": result.get("scaling"),
        },
    }
    print(json.dumps(line))


if __name__ == "__main__":
    sys.exit(main())
