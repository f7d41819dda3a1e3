"""SparkSession construction with engine defaults.

Centralizes the configs that matter at scale so jobs/tests/bench share
one tuned profile:
  - AQE on (runtime re-plan, skew-join backstop)
  - Arrow on (all our UDFs are pandas/Arrow — per-row Python is banned)
  - shuffle partitions sized by caller (local tests: cores; cluster:
    ~2-3x total cores via spark-submit conf)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # our posting blocks target ~128KB rows; keep Arrow batches large
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.parquet.compression.codec": "zstd",
    # session timezone pinned for deterministic warc_ts round-trips
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}

# shuffle/spill files on tmpfs — the sandbox stand-in for per-executor
# local disks (this VM's /tmp is one shared spinning vda; a cluster never
# funnels every executor's spill through one disk)
_local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
if _local_dir is None and os.path.isdir("/dev/shm"):
    _local_dir = "/dev/shm/spark-local"
if _local_dir:
    ENGINE_CONFS["spark.local.dir"] = _local_dir


def get_spark(
    app: str = "searchengine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = SparkSession.builder.appName(app)
    b = b.master(master or f"local[{cpus}]")
    for k, v in ENGINE_CONFS.items():
        b = b.config(k, v)
    b = b.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8))
    )
    b = b.config("spark.default.parallelism", str(cpus))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
