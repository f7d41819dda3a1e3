"""Custom stateful streaming operator via ``applyInPandasWithState``.

A per-user running profile (event count, value sum, last-seen timestamp)
maintained in the state store across micro-batches — the
arbitrary-stateful-processing surface (GroupState) that windowed
aggregations can't express. Drained with availableNow the final state
must equal the batch groupBy over the same events (tested); in
production the trigger streams and the timeout expires idle users.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import EVENTS_SCHEMA

STATE_SCHEMA = "n long, sum_value double, last_ts long"
OUTPUT_SCHEMA = "user_id long, n long, sum_value double, last_ts long"


def _update_user(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, sv, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        sv += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].astype("int64").max() // 1_000_000_000))
    state.update((n, sv, last))
    yield pd.DataFrame(
        {"user_id": [user_id], "n": [n], "sum_value": [sv], "last_ts": [last]}
    )


def user_profiles_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    sink_table: str = "user_profiles",
) -> DataFrame:
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)  # force several micro-batches
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "ts", "value")
    )
    profiles = stream.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        profiles.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # memory sink in update mode appends every emission; the LAST row per
    # user is the final state
    sink = spark.table(sink_table)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
