"""Watermarked event-time windowed aggregation (Structured Streaming).

The reference has no streaming surface (SURVEY §2.7 ABSENT); this is the
engine extension for live crawl/event telemetry: files landing in a
directory stream through a tumbling event-time window with a late-data
watermark. The batch-mode shape of the same aggregation is the driver
query ``events_windowed`` (__spark_entry__.py) — the streaming result
over a drained directory must equal it (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    sink_table: str = "windowed_counts",
    output_mode: str = "complete",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain events_dir (availableNow) through a watermarked tumbling
    window into an in-memory sink; returns the result DataFrame.
    Production swaps the trigger for continuous micro-batches and the
    sink for an append table.

    ``output_mode="append"`` + ``max_files_per_trigger=1`` exposes the
    watermark's LATE-DATA semantics: files stream one per micro-batch in
    modification-time order, the watermark advances between batches
    (max event time − delay), rows older than the current watermark are
    DROPPED, and a window only emits once the watermark passes its end —
    the exactly-once contract a 100-TB telemetry pipeline relies on
    (tested in tests/test_extensions.py::test_streaming_watermark_drops_late_rows)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)
    # watermarks require TIMESTAMP (with tz); session tz is pinned UTC so
    # the NTZ values map 1:1
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)
