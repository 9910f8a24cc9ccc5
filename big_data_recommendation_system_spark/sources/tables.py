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

# spread_small_scan sizing: one task per this many compressed parquet
# bytes (see the function docstring for the scale argument).
_SPREAD_BYTES_PER_TASK = int(
    os.environ.get("SPARK_GRAFT_SPREAD_BYTES_PER_TASK", str(128 * 1024))
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Parallelize heavy per-row compute over an under-parallel scan.

    The test corpus ships each table as ONE parquet file with ONE row
    group, so the scan cannot be file-split (Spark assigns row groups,
    not byte ranges, to tasks) and every narrow transformation chained
    onto it runs on a single core. Operators whose per-row work is
    expensive (64-dim embedding folds, signature hashing, synthetic-feed
    regex/format) call this AFTER their pushdown-able filters to spread
    the rows across the session's parallelism.

    Deliberately NOT applied inside ``load_table``: a blanket
    repartition would sit between later filters and the scan, blocking
    predicate pushdown — the wrong trade at production scale.

    Guard shape (r8 ADVICE): the plan-free ``df.inputFiles()`` probe is
    used only as a cheap POSITIVE signal — exactly one input file means
    the scan cannot exceed its row-group count (one, in this corpus),
    so repartition without planning a job. Any other file count proves
    nothing in either direction (Spark bin-packs many small files into
    few scan partitions via maxPartitionBytes/openCostInBytes, and a
    few large splittable files can already scan wide), so fall through
    to the exact ``getNumPartitions`` probe rather than guessing from
    raw file counts. A production multi-file corpus therefore pays one
    plan-analysis probe, never a blind shuffle; the single-file test
    corpus stays probe-free on the hot path.

    Partition count (r12 VERDICT #5): DATA-PROPORTIONAL, not a flat
    ``defaultParallelism`` — ceil(file bytes / bytes-per-task) capped by
    parallelism (guide §2.2: partitions sized by data). The r12 driver's
    8-vs-32-core block showed the flat spread scheduling 32 near-empty
    tasks over hundreds-of-KB files and losing ~2× to the 8-core run on
    exactly these paths (srp_signatures 0.38, embedding_quantize 0.50,
    silver_events 0.57 scaling ratios). Bytes-per-task is a compressed-
    parquet proxy for the heavy per-row work these callers do;
    overridable via $SPARK_GRAFT_SPREAD_BYTES_PER_TASK (local default
    128 KiB ≈ fully-parallel lineitem/q1 at sf0.1, single-digit task
    counts for the KB-scale tables). On a production multi-file scan
    the cap makes this identical to the old behavior (bytes/task >>
    threshold), so nothing cluster-scale changes."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # non-file plans: exact probe below
        files = []
    if len(files) == 1:
        n = target
        if files[0].startswith("file:"):
            from urllib.parse import unquote, urlparse

            try:
                size = os.path.getsize(unquote(urlparse(files[0]).path))
                n = max(1, min(target, -(-size // _SPREAD_BYTES_PER_TASK)))
            except OSError:
                pass  # unreadable locally: keep the parallelism spread
        if n == 1:
            # one task of data: the one-row-group scan is already a
            # single partition — an exchange would add cost, not spread
            return df
        return df.repartition(n)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table stores nanosecond parquet timestamps. Spark's
    TimestampType is microseconds, and how the nanos column surfaces is
    version-dependent: Spark 4.1+ reads it natively as TIMESTAMP_NTZ,
    older Sparks need ``nanosAsLong`` and a manual nanos→micros truncate.
    Branch on the loaded dtype so both work. The cast targets LTZ
    ``timestamp`` (session TZ is pinned UTC in session.py) — downstream
    ``unix_micros`` rejects TIMESTAMP_NTZ. The DuckDB oracle mirrors the
    truncation with ``CAST(ts AS TIMESTAMP)`` (TIMESTAMP_NS → TIMESTAMP).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes)["ts"].startswith("timestamp"):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
