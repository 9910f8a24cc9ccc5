"""SparkSession factory.

Defaults are tuned for the test harness (local[N], single JVM) but every
knob is the one you would also set on a 1000-executor cluster:

- AQE on: runtime partition coalescing + skew-join splitting, which is the
  scale path for the hot-key distributions the reference's clickstream data
  exhibits (a few very active users/products).
- shuffle.partitions sized to cores locally; on a real cluster AQE's
  coalescePartitions makes the static number mostly irrelevant.
- session timezone pinned to UTC: the reference normalizes timestamps to
  UTC (reference processing/test_clickstream.py:245 `utc=True`) and the
  DuckDB oracle compares naive-UTC timestamps.
- Arrow on: every Pandas UDF / applyInPandas boundary is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "bdrs-spark", cpus: int | None = None) -> SparkSession:
    """Return (create if needed) the engine's SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r12 OPTIMIZATION (guide §2.2: partitions sized by data, not by
        # a constant): let AQE re-optimize CACHED plans too — off by
        # default only to protect consumers that rely on a cached frame's
        # partitioning for exchange elision, which this engine never does
        # (substrate consumers re-shuffle by their own keys). Without it
        # every persisted substrate freezes at the static shuffle-
        # partition count: the CC edge cache held 42 rows in 64
        # partitions and each propagation round scheduled 64 near-empty
        # tasks per stage (measured, OPTIMIZATION_r12.md). Scale-neutral:
        # AQE targets advisoryPartitionSizeInBytes, so big substrates
        # keep many partitions.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
