"""Silver/gold sinks (reference: storage_manager.py:108-146 parquet writes,
main_pipeline.py:364-374 checkpoint JSON blobs).

- ``write_silver``: date-partitioned snappy parquet, the reference's
  ``<table>/date=YYYY-MM-DD/`` layout (storage_manager.py:119-129) via
  native ``partitionBy`` — downstream readers get partition pruning on
  ``date`` for free.
- ``record_run``: run metadata appended to a ``_pipeline_runs`` parquet
  table instead of per-run JSON blobs — queryable with the same engine
  (A6 trend stats read it directly).

Small-file hygiene (the reference accumulated 1,274 ten-record files —
logs/bronze_to_silver.log): writes coalesce to ``files_per_partition``
output files per date partition, and ``compact_silver`` rewrites an
existing table to the target file count.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_silver(
    df: DataFrame,
    path: str,
    date_col: str = "date",
    mode: str = "append",
    files_per_partition: int = 1,
) -> None:
    (
        df.repartition(files_per_partition, F.col(date_col))
        .write.mode(mode)
        .partitionBy(date_col)
        .parquet(path)
    )


def compact_silver(spark: SparkSession, path: str, files_per_partition: int = 1) -> None:
    """Rewrite a date-partitioned table to bounded file counts."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(files_per_partition, F.col("date")).write.mode(
        "overwrite"
    ).partitionBy("date").parquet(tmp)
    # swap via rename-aside: a crash at any point leaves either the old or
    # the new table intact (never a destroyed one); true atomic swap is
    # storage-specific (object-store manifest commit), this is the local
    # filesystem equivalent
    import shutil

    old = path.rstrip("/") + "__old"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)


def record_run(
    spark: SparkSession,
    path: str,
    run_info: dict,
) -> None:
    """Append one run-metadata row (S9) to the _pipeline_runs table."""
    row = {
        "run_ts": time.time(),
        "payload": json.dumps(run_info, sort_keys=True),
        **{
            k: v
            for k, v in run_info.items()
            if isinstance(v, (int, float, str, bool))
        },
    }
    spark.createDataFrame([row]).write.mode("append").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write (S7 scale extension): co-locates rows by hash
    of ``bucket_cols`` at WRITE time so every later equi-join or
    aggregation on those columns runs with ZERO exchange — the shuffle is
    paid once, when the data lands, instead of per query.

    At 100 TB this is the difference between re-shuffling the fact table
    for every user-keyed join and reading pre-bucketed files; pick
    ``n_buckets`` so each bucket file stays in the 128 MB - 1 GB band.
    Requires a catalog (``saveAsTable``) — Spark's bucketing metadata
    lives in the table definition, not the files.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )
