"""Thin storage seam (SURVEY.md §7.1).

BASELINE.json's input hint is an Iceberg table; this sandbox has no
Iceberg runtime jars (verified absent — no network, no spark.jars.packages
resolution), so the engine reads/writes identical-schema Parquet behind
this seam. Every call site goes through these two functions; pointing the
engine at Iceberg is a one-file change (table identifiers instead of
paths + ``USING iceberg``), and the chunked build in
:mod:`searchengine_spark.index.build` maps 1:1 onto Iceberg per-partition
append commits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _use_iceberg(spark: SparkSession) -> bool:
    return (
        spark.conf.get("spark.sql.catalog.engine", None) is not None
        and os.environ.get("SPARK_GRAFT_ICEBERG", "") == "1"
    )


def read_table(spark: SparkSession, location: str) -> DataFrame:
    if _use_iceberg(spark):
        return spark.read.table(location)
    return spark.read.parquet(location)


def write_table(
    df: DataFrame, location: str, mode: str = "overwrite", sort_cols: list[str] | None = None
) -> None:
    w = df.write.mode(mode)
    if _use_iceberg(df.sparkSession):
        w.saveAsTable(location)
    else:
        w.parquet(location)
