"""Bronze JSON-lines source (reference: storage_manager.py:67-106 — per-line
json.loads with bad-line skip and lineage columns).

Spark-first: one ``spark.read.schema(...).json(paths)`` in PERMISSIVE mode.
Malformed lines degrade per-row into the corrupt-record column (exactly the
reference's per-line skip, but vectorized); lineage is
``input_file_name()`` + a processing timestamp, replacing the reference's
``_source_file/_source_line/_processed_at`` dict injection
(storage_manager.py:93-95; per-object line numbers don't survive
parallel splits, so the lineage grain is the file).

At scale this is the right shape: the JSON scan parallelizes per file
split, the declared schema avoids a schema-inference pass, and Catalyst
prunes unreferenced topic columns at the scanner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import CORRUPT_COL, TOPIC_SCHEMAS


def read_bronze(spark: SparkSession, topic: str, paths: str | list[str]) -> DataFrame:
    """Read a topic's JSON-lines bronze files with lineage columns.
    Returns all rows; use ``split_corrupt`` to separate bad lines."""
    schema = TOPIC_SCHEMAS[topic]
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(paths)
    )
    return df.withColumns(
        {
            "_source_file": F.input_file_name(),
            "_processed_at": F.current_timestamp(),
        }
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad): bad = rows whose line failed JSON parsing.

    Materializes the scan (eager localCheckpoint — no per-call
    CacheManager entry to leak): Spark disallows queries referencing only
    the corrupt column over a raw JSON scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the materialized full-row copy
    satisfies that — and both halves re-read the batch anyway; same
    one-read-two-uses shape as the reference pipeline."""
    from ..operators.substrate import scoped_materialized

    df = scoped_materialized(df)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return good, bad
