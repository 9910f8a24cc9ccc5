"""Window-function operators (SURVEY.md §2.9) + gap-based sessionization.

The reference computes per-session sequence numbers and lag deltas with
pandas sort+cumcount/diff (main_pipeline.py:249-251,
clisckstream_transformer.py:60-61); its streaming processor keeps unbounded
per-user session state (kafka_streams_processor.py:61-68). Batch
sessionization here is the classic gap-and-island: lag → new-session flag →
running sum. One shuffle on user_id; every window below reuses that same
partitioning, so Catalyst plans a single Exchange for the whole stack.

Determinism: every window orders by (ts, event_id) — a total order — so
results are stable across partitionings and match the oracle row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import SESSION_GAP_MINUTES
from ..plans.silver import silver_cte, silver_events

_GAP_SECONDS = SESSION_GAP_MINUTES * 60


def with_sequence(df: DataFrame, key: str = "user_id") -> DataFrame:
    """W1: 1-based event sequence per key, ordered by (ts, event_id)."""
    w = Window.partitionBy(key).orderBy("ts", "event_id")
    return df.withColumn("seq", F.row_number().over(w).cast("long"))


def with_time_since_last(df: DataFrame, key: str = "user_id") -> DataFrame:
    """W2: seconds since the key's previous event (null for the first)."""
    w = Window.partitionBy(key).orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return df.withColumn(
        "time_since_last", (us - F.lag(us).over(w)) / F.lit(1000000.0)
    )


def with_trailing_events(df: DataFrame, key: str = "user_id", n: int = 5) -> DataFrame:
    """W5: comma-joined trailing-n event types (the streaming processor's
    recent_event_sequence, kafka_streams_processor.py:141-142)."""
    w = Window.partitionBy(key).orderBy("ts", "event_id").rowsBetween(-(n - 1), 0)
    return df.withColumn(
        "recent_events", F.concat_ws(",", F.collect_list("event_type").over(w))
    )


def sessionize(df: DataFrame, key: str = "user_id", gap_seconds: int = _GAP_SECONDS) -> DataFrame:
    """Assign gap-based session numbers per key (bounded-state batch
    equivalent of the reference's unbounded streaming session dict)."""
    w = Window.partitionBy(key).orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_session = F.when(
        (us - F.lag(us).over(w)) > F.lit(gap_seconds * 1000000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_no", F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1
    )


# --- registry queries ------------------------------------------------------


def event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W2+W5 stacked on one user_id partitioning (single Exchange)."""
    silver = silver_events(spark, sf_dir)
    out = with_trailing_events(with_time_since_last(with_sequence(silver)))
    return out.select(
        "user_id", "event_id", "ts", "event_type", "seq", "time_since_last", "recent_events"
    )


EVENT_SEQUENCES_SQL = silver_cte("""
SELECT
  user_id,
  event_id,
  ts,
  event_type,
  ROW_NUMBER() OVER w AS seq,
  (epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0 AS time_since_last,
  string_agg(event_type, ',') OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
  ) AS recent_events
FROM silver
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization rolled up to one row per session."""
    silver = silver_events(spark, sf_dir)
    events = sessionize(silver)
    return (
        events.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_weight").alias("session_engagement"),
            (
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / F.lit(1000000.0)
            ).alias("duration_seconds"),
        )
    )


USER_SESSIONS_SQL = silver_cte(f"""
, flagged AS (
  SELECT user_id, ts, event_id, event_weight,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {_GAP_SECONDS * 1000000}
         THEN 1 ELSE 0 END AS new_session
  FROM silver
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id, event_weight,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(event_weight) AS BIGINT) AS session_engagement,
  (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0 AS duration_seconds
FROM numbered
GROUP BY user_id, session_no
""")


def user_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8/D9: qcut-style quartile + percent_rank over per-user total value
    (gold_pipeline.py:252-260; product_features_transformer.py:64-65).

    Scale path: the aggregated one-row-per-user frame is still ~10^8-9
    rows at 100 TB of events — far too big for an unpartitioned
    ``Window.orderBy`` (single WindowExec task). The exact rank comes from
    operators/ranking.py (range-repartition + local row_number + prefix
    offsets); NTILE/PERCENT_RANK are then pure arithmetic on that rank,
    bit-identical to the plain-window form the oracle SQL uses.
    """
    from .ranking import (
        RANK_COL,
        TOTAL_COL,
        ntile_from_rank,
        percent_rank_from_rank,
        with_global_rank,
    )

    silver = silver_events(spark, sf_dir)
    totals = silver.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value")
    )
    ranked = with_global_rank(totals, ["total_value", "user_id"])
    rank, n = F.col(RANK_COL), F.col(TOTAL_COL)
    return ranked.select(
        "user_id",
        "total_value",
        ntile_from_rank(rank, n, 4).cast("long").alias("value_quartile"),
        percent_rank_from_rank(rank, n).alias("value_pct_rank"),
    )


USER_VALUE_QUARTILES_SQL = silver_cte("""
, totals AS (
  SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
  FROM silver GROUP BY user_id
)
SELECT
  user_id,
  total_value,
  NTILE(4) OVER w AS value_quartile,
  PERCENT_RANK() OVER w AS value_pct_rank
FROM totals
WINDOW w AS (ORDER BY total_value, user_id)
""")


def trailing_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per event, how many of the same user's events
    fall in the trailing hour (event-time, not row-count — the batch form
    of the streaming sliding window R3). rangeBetween over epoch micros."""
    silver = silver_events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3600 * 1000000, 0)
    )
    return silver.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
        F.sum("event_weight").over(w).cast("long").alias("engagement_last_hour"),
    )


TRAILING_HOUR_COUNTS_SQL = silver_cte("""
SELECT
  user_id,
  event_id,
  ts,
  COUNT(*) OVER w AS events_last_hour,
  CAST(SUM(event_weight) OVER w AS BIGINT) AS engagement_last_hour
FROM silver
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
""")
