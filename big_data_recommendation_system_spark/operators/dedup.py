"""Deduplication operator family (SURVEY.md §2.5 — a first-class family
in the reference; near-duplicate text dedup lives in text_dedup.py).

- ``dedup_exact``       (X1, main_pipeline.py:254-255) — drop duplicates by
  key columns; implemented as dropDuplicates, which Spark executes as a
  hash aggregation (map-side partial first, so duplicate-heavy data never
  shuffles in full).
- ``keep_latest``       (X2, main_pipeline.py:303,354) — last-write-wins
  snapshot per key. NOT dropDuplicates (arbitrary row!): a row_number
  window over (key ORDER BY ts DESC, tiebreak) — the deterministic
  semantics the reference gets from sort+keep='last'.
- ``dedup_compound``    (X3, gold_pipeline.py:135-157) — keep-first by
  compound key with a deterministic order column.

All helpers take explicit order/tiebreak columns: at 100 TB run-to-run
determinism requires a total order, never file order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.silver import silver_cte, silver_events


def dedup_exact(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    return df.dropDuplicates(list(keys))


def keep_latest(df: DataFrame, keys: Sequence[str], order: Sequence[Column]) -> DataFrame:
    """One row per key: the greatest row under ``order`` (pass e.g.
    [col('ts').desc(), col('event_id').desc()])."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_compound(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """Keep-first per compound key under a deterministic order."""
    return keep_latest(df, keys, order)


# --- registry queries over the testdata events table ----------------------

_SILVER_COLS = ["user_id", "event_id", "ts", "event_type", "value", "event_date"]


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 keep-latest snapshot: each user's most recent cleaned event."""
    silver = silver_events(spark, sf_dir)
    return keep_latest(
        silver, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select(*_SILVER_COLS)


LATEST_EVENT_PER_USER_SQL = silver_cte("""
SELECT user_id, event_id, ts, event_type, value, event_date
FROM silver
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
""")


def first_event_per_user_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 compound-key keep-first: first event per (user, type, day)."""
    silver = silver_events(spark, sf_dir)
    return dedup_compound(
        silver,
        ["user_id", "event_type", "event_date"],
        [F.col("ts").asc(), F.col("event_id").asc()],
    ).select(*_SILVER_COLS)


FIRST_EVENT_PER_USER_TYPE_DAY_SQL = silver_cte("""
SELECT user_id, event_id, ts, event_type, value, event_date
FROM silver
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id, event_type, event_date ORDER BY ts ASC, event_id ASC
) = 1
""")


def dedup_exact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup by event_id (events are unique already — the check
    is that the operator is a no-op on clean data, as in the reference's
    steady state)."""
    silver = silver_events(spark, sf_dir)
    return dedup_exact(silver.select("event_id", "user_id", "event_type"), ["event_id"])


DEDUP_EXACT_EVENTS_SQL = silver_cte("""
SELECT event_id, user_id, event_type FROM silver
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY event_id) = 1
""")
