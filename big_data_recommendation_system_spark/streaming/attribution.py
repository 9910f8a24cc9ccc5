"""Stream-stream attribution join — the two-stream stateful operator the
reference cannot express at all (its consumer loop is single-topic):
attribute each purchase to the same user's most recent qualifying view
within the attribution window.

Spark executes this as a watermarked stream-stream inner join: both
sides buffer state, and the time-interval join condition plus the
watermarks bound that state (rows older than
watermark + attribution window are evicted). Without the interval
condition the state would grow forever — the condition is load-bearing,
not a filter."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_MINUTES = 60
STREAM_WATERMARK = "30 minutes"


def attribution_join(events: DataFrame) -> DataFrame:
    """(possibly streaming) silver events → one row per (view, purchase)
    pair where the purchase happened within ATTRIBUTION_MINUTES after
    the view, same user. Downstream pick-latest-view dedup is a
    separate keyed choice; the join emits the full candidate set."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_event_id"),
        )
        .withWatermark("view_ts", STREAM_WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", STREAM_WATERMARK)
    )
    return views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {ATTRIBUTION_MINUTES} MINUTES")
        ),
    ).select(
        "user_id",
        "view_event_id",
        "view_ts",
        "purchase_event_id",
        "purchase_ts",
        "purchase_value",
    )


def view_purchase_attribution(spark, sf_dir: str) -> DataFrame:
    """Batch registration of the SAME operator (withWatermark is a no-op
    on batch frames): attribution pairs over the cleaned events table,
    oracle-checked — so the streaming operator's join semantics sit
    under the hard correctness signal, not just the e2e equality test."""
    from ..plans.silver import silver_events

    return attribution_join(silver_events(spark, sf_dir)).orderBy(
        "user_id", "view_ts", "purchase_ts"
    )


def _attribution_sql() -> str:
    from ..plans.silver import silver_cte

    return silver_cte(f"""
, views AS (
  SELECT user_id, ts AS view_ts, event_id AS view_event_id
  FROM silver WHERE event_type = 'view'
), purchases AS (
  SELECT user_id AS p_user_id, ts AS purchase_ts,
    event_id AS purchase_event_id, value AS purchase_value
  FROM silver WHERE event_type = 'purchase'
)
SELECT user_id, view_event_id, view_ts, purchase_event_id, purchase_ts, purchase_value
FROM views JOIN purchases
  ON user_id = p_user_id
 AND purchase_ts >= view_ts
 AND purchase_ts <= view_ts + INTERVAL {ATTRIBUTION_MINUTES} MINUTE
ORDER BY user_id, view_ts, purchase_ts
""")


VIEW_PURCHASE_ATTRIBUTION_SQL = _attribution_sql()


def attribution_delay_stats(spark, sf_dir: str) -> DataFrame:
    """Conversion-timing distribution on top of the attribution join:
    per purchase day, how many attributed (view, purchase) pairs and the
    min/median/p90/max view→purchase delay in seconds — the
    funnel-latency report that sizes the attribution window itself.

    Determinism: delays are exact integer microseconds (unix_micros on
    LTZ timestamps); percentiles interpolate over integers with the same
    linear rule in both engines (the value_percentiles_by_type
    precedent) and the /1e6 rescale is a single final division.
    Scale shape: the wide work is the attribution join (already keyed on
    user_id); this adds one rollup on purchase day — calendar-bounded
    output."""
    pairs = view_purchase_attribution(spark, sf_dir)
    d = pairs.select(
        F.to_date("purchase_ts").alias("day"),
        (
            F.unix_micros("purchase_ts") - F.unix_micros("view_ts")
        ).alias("delay_us"),
    )
    return (
        d.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.min("delay_us").cast("double") / 1e6).alias("min_s"),
            (F.expr("percentile(delay_us, 0.5)") / 1e6).alias("p50_s"),
            (F.expr("percentile(delay_us, 0.9)") / 1e6).alias("p90_s"),
            (F.max("delay_us").cast("double") / 1e6).alias("max_s"),
        )
        .orderBy("day")
    )


ATTRIBUTION_DELAY_STATS_SQL = f"""
WITH pairs AS ({VIEW_PURCHASE_ATTRIBUTION_SQL.replace("ORDER BY user_id, view_ts, purchase_ts", "")})
SELECT CAST(purchase_ts AS DATE) AS day,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(MIN(epoch_us(purchase_ts) - epoch_us(view_ts)) AS DOUBLE) / 1e6 AS min_s,
  quantile_cont(epoch_us(purchase_ts) - epoch_us(view_ts), 0.5) / 1e6 AS p50_s,
  quantile_cont(epoch_us(purchase_ts) - epoch_us(view_ts), 0.9) / 1e6 AS p90_s,
  CAST(MAX(epoch_us(purchase_ts) - epoch_us(view_ts)) AS DOUBLE) / 1e6 AS max_s
FROM pairs
GROUP BY CAST(purchase_ts AS DATE)
ORDER BY day
"""
