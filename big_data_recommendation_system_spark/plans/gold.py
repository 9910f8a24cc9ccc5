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


# --- RFM segmentation -------------------------------------------------------


def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation over purchase
    events — the classic e-commerce marketing rollup the reference's
    user_summary (gold_pipeline.py:220-260) stops one step short of.
    Per purchasing user: days since last purchase (relative to the
    corpus max day), purchase count, total value, a 1–4 NTILE score per
    dimension (4 = best: most recent / most frequent / highest spend),
    and the concatenated 'r-f-m' segment label.

    Scale shape: one purchase rollup keyed on user_id; each score is an
    exact global rank from operators/ranking.py (range repartition +
    local row_number + broadcast prefix offsets — NO single-partition
    NTILE window); the corpus max day is a broadcast 1-row aggregate.
    NTILE is then pure arithmetic on the rank, bit-identical to the
    plain-window form the oracle uses."""
    from ..operators.ranking import (
        RANK_COL,
        TOTAL_COL,
        ntile_from_rank,
        with_global_rank,
    )

    silver = silver_events(spark, sf_dir)
    purchases = silver.filter(F.col("event_type") == "purchase")
    per_user = purchases.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_value"),
    )
    maxd = purchases.agg(F.max(F.to_date("ts")).alias("_maxd"))
    base = per_user.crossJoin(F.broadcast(maxd)).select(
        "user_id",
        F.datediff(F.col("_maxd"), F.col("last_day")).cast("long").alias(
            "recency_days"
        ),
        "n_purchases",
        "total_value",
    )

    def score(df: DataFrame, order_cols: list[str], name: str) -> DataFrame:
        ranked = with_global_rank(df, order_cols)
        return ranked.withColumn(
            name,
            ntile_from_rank(F.col(RANK_COL), F.col(TOTAL_COL), 4).cast(
                "long"
            ),
        ).drop(RANK_COL, TOTAL_COL)

    # 4 = best: recency orders DESC on days (fewest days → last bucket),
    # frequency/monetary order ASC (highest → last bucket)
    scored = score(
        base.withColumn("_neg_recency", -F.col("recency_days")),
        ["_neg_recency", "user_id"],
        "r_score",
    ).drop("_neg_recency")
    scored = score(scored, ["n_purchases", "user_id"], "f_score")
    scored = score(scored, ["total_value", "user_id"], "m_score")
    return scored.select(
        "user_id",
        "recency_days",
        "n_purchases",
        "total_value",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws(
            "-", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("rfm_segment"),
    ).orderBy("user_id")


USER_RFM_SEGMENTS_SQL = silver_cte("""
, purchases AS (SELECT * FROM silver WHERE event_type = 'purchase')
, per_user AS (
  SELECT user_id,
    MAX(CAST(ts AS DATE)) AS last_day,
    CAST(COUNT(*) AS BIGINT) AS n_purchases,
    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
  FROM purchases GROUP BY user_id
)
, base AS (
  SELECT user_id,
    CAST(date_diff('day', last_day, (SELECT MAX(CAST(ts AS DATE)) FROM purchases)) AS BIGINT) AS recency_days,
    n_purchases, total_value
  FROM per_user
)
SELECT user_id, recency_days, n_purchases, total_value,
  CAST(NTILE(4) OVER (ORDER BY -recency_days, user_id) AS BIGINT) AS r_score,
  CAST(NTILE(4) OVER (ORDER BY n_purchases, user_id) AS BIGINT) AS f_score,
  CAST(NTILE(4) OVER (ORDER BY total_value, user_id) AS BIGINT) AS m_score,
  CAST(NTILE(4) OVER (ORDER BY -recency_days, user_id) AS VARCHAR) || '-' ||
  CAST(NTILE(4) OVER (ORDER BY n_purchases, user_id) AS VARCHAR) || '-' ||
  CAST(NTILE(4) OVER (ORDER BY total_value, user_id) AS VARCHAR) AS rfm_segment
FROM base
ORDER BY user_id
""")
