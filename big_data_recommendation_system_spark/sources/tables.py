"""Parquet table loaders for the driver testdata star schema.

At 100 TB these reads are the dominant cost; everything here is a plain
``spark.read.parquet`` so Catalyst gets full predicate pushdown, column
pruning and partition discovery (replacing the reference's hand-rolled
object listing in processing/utils/storage_manager.py:36-65).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
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

# Dimensions small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = {"region", "nation", "supplier"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table stores nanosecond parquet timestamps, which Spark
    cannot represent (TimestampType is microseconds). Read nanos as long
    and truncate to micros — the DuckDB oracle mirrors this with
    ``CAST(ts AS TIMESTAMP)`` (TIMESTAMP_NS → TIMESTAMP truncation).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
