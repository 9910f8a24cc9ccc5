"""Silver→gold aggregation plans (reference behavioral spec:
processing/silver-to-gold/gold_pipeline.py:168-339).

The reference derives four analytics tables from the cleaned clickstream
with single-threaded pandas groupbys; here each is one declarative
aggregation over ``clean_events``:

- ``user_summary``        (A1, gold_pipeline.py:168-221) — per-user counts,
  distinct counts, engagement sums, activity binning, and the per-user
  *mode* of event_type with the reference's deterministic tie-break
  (highest count, then lexicographically smallest value).
- ``daily_stats``         (A3, gold_pipeline.py:273-313) — per-day rollup;
  the reference's left-join for mobile counts becomes a conditional
  aggregation (no join, no extra shuffle).
- ``engagement_metrics``  (A4, gold_pipeline.py:315-339) — per-event-type
  rollup with share-of-total via an unpartitioned window (W6).

Scale notes: all three shuffle exactly once on their group key. The mode
computation is a second aggregation pre-shuffled on the same key
(user_id), so AQE/exchange-reuse keeps it cheap; at 100 TB the
(user_id, event_type) pre-aggregation is map-side combined before the
shuffle, so the wide row never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ACTIVITY_BINS, ACTIVITY_LABELS
from ..functions.pandas_parity import cut_right_closed, decimal_avg, decimal_sum
from .silver import silver_cte, silver_events

_ACTIVITY_CASE = """CASE
      WHEN total_events > 0 AND total_events <= 5 THEN 'low'
      WHEN total_events > 5 AND total_events <= 15 THEN 'medium'
      WHEN total_events > 15 AND total_events <= 30 THEN 'high'
      WHEN total_events > 30 THEN 'very_high'
    END"""


def user_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = silver_events(spark, sf_dir)

    base = silver.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("event_type").alias("event_types"),
        F.countDistinct("event_date").alias("active_days"),
        F.sum("event_weight").alias("total_engagement"),
        decimal_sum(F.col("value")).alias("total_value"),
        decimal_avg(F.col("value")).alias("avg_value"),
    )

    # Per-user mode of event_type, deterministic tie-break: count DESC,
    # event_type ASC — min(struct(-cnt, event_type)) does both in one agg,
    # shuffling only the pre-aggregated (user_id, event_type) pairs.
    mode = (
        silver.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("user_id")
        .agg(F.min(F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("event_type").alias("et"))).alias("m"))
        .select("user_id", F.col("m.et").alias("top_event_type"))
    )

    return (
        base.join(mode, "user_id")
        .withColumn(
            "activity_level",
            cut_right_closed(F.col("total_events"), ACTIVITY_BINS, ACTIVITY_LABELS),
        )
        .withColumn(
            "events_per_day",
            F.col("total_events").cast("double") / F.col("active_days"),
        )
        .select(
            "user_id",
            "total_events",
            "event_types",
            "active_days",
            "total_engagement",
            "total_value",
            "avg_value",
            "top_event_type",
            "activity_level",
            "events_per_day",
        )
    )


USER_SUMMARY_SQL = silver_cte(f"""
, base AS (
  SELECT
    user_id,
    COUNT(*) AS total_events,
    COUNT(DISTINCT event_type) AS event_types,
    COUNT(DISTINCT event_date) AS active_days,
    CAST(SUM(event_weight) AS BIGINT) AS total_engagement,
    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS avg_value
  FROM silver GROUP BY user_id
), mode AS (
  SELECT user_id, event_type AS top_event_type
  FROM (SELECT user_id, event_type, COUNT(*) AS cnt FROM silver GROUP BY 1, 2)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) = 1
)
SELECT
  base.user_id,
  total_events,
  event_types,
  active_days,
  total_engagement,
  total_value,
  avg_value,
  top_event_type,
  {_ACTIVITY_CASE} AS activity_level,
  CAST(total_events AS DOUBLE) / active_days AS events_per_day
FROM base JOIN mode ON base.user_id = mode.user_id
""")


def daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = silver_events(spark, sf_dir)
    return (
        silver.groupBy("event_date")
        .agg(
            F.countDistinct("user_id").alias("daily_active_users"),
            F.count(F.lit(1)).alias("total_events"),
            F.sum("event_weight").alias("total_engagement"),
            decimal_sum(F.col("value")).alias("total_value"),
            # reference's mobile left-join (J2) re-expressed as conditional
            # aggregation — same result, one fewer shuffle
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "purchase_events"
            ),
            F.max(F.col("is_weekend")).alias("is_weekend"),
        )
        .withColumn(
            "events_per_user",
            F.col("total_events").cast("double") / F.col("daily_active_users"),
        )
        .withColumn(
            "purchase_pct",
            F.col("purchase_events") * F.lit(100.0) / F.col("total_events"),
        )
    )


DAILY_STATS_SQL = silver_cte("""
SELECT
  event_date,
  COUNT(DISTINCT user_id) AS daily_active_users,
  COUNT(*) AS total_events,
  CAST(SUM(event_weight) AS BIGINT) AS total_engagement,
  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_events,
  MAX(is_weekend) AS is_weekend,
  CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id) AS events_per_user,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) * 100.0 / COUNT(*) AS purchase_pct
FROM silver
GROUP BY event_date
""")


def engagement_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = silver_events(spark, sf_dir)
    from pyspark.sql.window import Window

    agg = silver.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("unique_users"),
        F.count(F.lit(1)).alias("total_events"),
        F.sum("event_weight").alias("total_engagement"),
        decimal_avg(F.col("value")).alias("avg_value"),
    )
    total = Window.partitionBy()
    return agg.withColumn(
        "event_pct",
        F.col("total_events") * F.lit(100.0) / F.sum("total_events").over(total),
    )


ENGAGEMENT_METRICS_SQL = silver_cte("""
SELECT
  event_type,
  COUNT(DISTINCT user_id) AS unique_users,
  COUNT(*) AS total_events,
  CAST(SUM(event_weight) AS BIGINT) AS total_engagement,
  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS avg_value,
  COUNT(*) * 100.0 / SUM(COUNT(*)) OVER () AS event_pct
FROM silver
GROUP BY event_type
""")
