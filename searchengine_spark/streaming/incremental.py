"""Incremental index ingest via Structured Streaming.

The reference is strictly batch (SURVEY §2.7 ABSENT list) — this is the
web-scale extension a crawl pipeline needs: pages parquet files landing
in a directory are indexed as they arrive. Each micro-batch becomes one
postings chunk in the SAME on-disk layout as the batch IndexBuilder
(build.py), with its own lineage/metrics manifest, so:

  * a streaming-built index serves identical query results to a
    batch-built one over the same pages (tested),
  * restart-safety comes from the stream checkpoint (source offsets) plus
    the per-chunk manifests (exactly-once commit on top of at-least-once
    foreachBatch: a replayed batch_id overwrites its own postings chunk
    AND its own docs/batch=<id> partition idempotently before the
    manifest lands — both sinks are per-batch overwrite, never append),
  * doc_ids stay dense: each batch's ids start at the running total
    (recorded in the stream manifest chain).

Overlapping (term, bucket) blocks across chunks are by design — readers
union blocks; doc ranges across batches are disjoint so postings stay
consistent and per-term df = Σ df_b still holds.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import (
    DEFAULT_BUCKET_DOCS,
    assign_dense_ids,
    build_postings_local,
    ensure_layout,
)
from ..text.udfs import tokenized_docs_arrow

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


class StreamingIndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        bucket_docs: int = DEFAULT_BUCKET_DOCS,
    ) -> None:
        self.spark = spark
        self.out = out_dir
        self.bucket_docs = bucket_docs
        # refuse to resume into a pre-layout-2 directory (flat docs appends
        # + int32 max_tf would mix with this code's output; ADVICE r2 #2)
        ensure_layout(out_dir)

    def _manifest(self, name: str) -> str:
        return os.path.join(self.out, "_manifests", f"{name}.json")

    def _n_docs_so_far(self) -> int:
        mdir = os.path.join(self.out, "_manifests")
        total = 0
        for f in os.listdir(mdir):
            if f.startswith("stream_batch_") and f.endswith(".json"):
                total += json.load(open(os.path.join(mdir, f)))["rows"]
        return total

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        name = f"stream_batch_{batch_id:06d}"
        if os.path.exists(self._manifest(name)):  # replayed batch: done
            return
        t0 = time.time()
        start = self._n_docs_so_far()
        with_ids = assign_dense_ids(
            batch_df.select("url", "warc_ts", "lang", "text"),
            order_col="url",
            start=start,
        )
        docs = tokenized_docs_arrow(
            with_ids.select("doc_id", "url", "warc_ts", "lang", "text"),
            passthrough=("doc_id", "url", "warc_ts", "lang"),
        ).persist()
        n = docs.count()
        # density net (same closed form as IndexBuilder.build, ADVICE r3):
        # the no-persist fast path in assign_dense_ids assumes the scan
        # partitioning is identical between its stats job and this reuse —
        # if a micro-batch ever re-partitions in between, ids go non-dense;
        # fail HERE, before the batch manifest commits. docs is persisted,
        # so this agg reads the cache, not the source.
        if n:
            row = docs.agg(
                F.min("doc_id").alias("id_min"),
                F.max("doc_id").alias("id_max"),
                F.sum("doc_id").alias("id_sum"),
            ).first()
            if not (
                row["id_min"] == start
                and row["id_max"] == start + n - 1
                and row["id_sum"] == n * start + n * (n - 1) // 2
            ):
                raise RuntimeError(
                    f"stream batch {batch_id}: doc ids not dense "
                    f"(min={row['id_min']} max={row['id_max']} "
                    f"sum={row['id_sum']} n={n}, expected start={start}) — "
                    "scan partitioning changed between the id-stats job "
                    "and this batch's reuse"
                )
        # per-batch partition + overwrite = idempotent replay: a crash
        # between this write and the manifest commit makes the restarted
        # batch overwrite ITS OWN directory instead of appending duplicate
        # doc rows (same protocol as the postings chunk below)
        docs.write.mode("overwrite").parquet(
            os.path.join(self.out, "docs", f"batch={batch_id}")
        )
        post = build_postings_local(
            docs.select("doc_id", "dl", "ld", "terms"), self.bucket_docs
        )
        cdir = os.path.join(self.out, "postings", f"chunk=stream_{batch_id}")
        post.write.mode("overwrite").parquet(cdir)  # idempotent on replay
        docs.unpersist()
        if with_ids._sg_persisted is not None:
            with_ids._sg_persisted.unpersist()
        payload = {
            "stage": "stream_batch",
            "batch_id": batch_id,
            "rows": n,
            "doc_range": [start, start + n],
            "elapsed_sec": time.time() - t0,
            "docs_per_sec": n / max(time.time() - t0, 1e-9),
            "lineage": {"bucket_docs": self.bucket_docs},
        }
        tmp = self._manifest(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest(name))

    def run_available(
        self, pages_dir: str, max_files_per_trigger: int | None = None
    ) -> None:
        """Drain everything currently in pages_dir (availableNow), then
        stop — deterministic for tests; drop the trigger for continuous
        ingest in production."""
        reader = (
            self.spark.readStream.schema(PAGES_SCHEMA)
        )
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(pages_dir)
        q = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option(
                "checkpointLocation", os.path.join(self.out, "_stream_checkpoint")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def finalize(self) -> dict:
        """Recompute lexicon + meta over all chunks ingested so far,
        making the directory a valid IndexHandle target."""
        spark = self.spark
        post = spark.read.option(
            "basePath", os.path.join(self.out, "postings")
        ).parquet(os.path.join(self.out, "postings"))
        lex = post.groupBy("term").agg(
            F.sum("df_b").cast("long").alias("df"),
            F.sum("cf_b").cast("long").alias("cf"),
            F.max("max_tf").alias("max_tf"),
            F.max("max_wdt").alias("max_wdt"),
            F.count(F.lit(1)).alias("n_blocks"),
        )
        lex.write.mode("overwrite").parquet(os.path.join(self.out, "lexicon"))
        docs = spark.read.parquet(os.path.join(self.out, "docs"))
        row = docs.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total_dl")
        ).collect()[0]
        meta = {
            "n_docs": row["n"],
            "total_dl": int(row["total_dl"] or 0),
            "avgdl": (row["total_dl"] or 0) / max(row["n"], 1),
            "bucket_docs": self.bucket_docs,
            "mode": "streaming",
        }
        for name, payload in (("meta", meta), ("lexicon", {"stage": "lexicon"}), ("docs", {"stage": "docs", "rows": row["n"]})):
            tmp = self._manifest(name) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(payload, f, indent=1, sort_keys=True)
            os.replace(tmp, self._manifest(name))
        return meta
