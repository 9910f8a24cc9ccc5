"""Reference-parity silver→gold tables, against
processing/silver-to-gold/gold_pipeline.py:168-339 (clickstream-shaped
input; every gold table derives from clickstream only — SURVEY.md §2.7).

All numeric aggregates are rounded to 2 decimals like the reference
(gold_pipeline.py:184,237,291,327 — Spark round = HALF_UP; the reference's
numpy round is banker's, a documented semantic choice in our favor of SQL
convention). Double sums go through decimal for order-independence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import ACTIVITY_BINS, ACTIVITY_LABELS
from ..functions.pandas_parity import (
    cut_right_closed,
    decimal_avg,
    decimal_sum,
    round1_neutral,
    round2_neutral,
)

POPULARITY_TIER_LABELS = ["low", "medium", "high", "viral"]


def _mode(df: DataFrame, key: str, value: str, alias: str) -> DataFrame:
    """Per-key mode with the deterministic tie-break (count DESC, value
    ASC) — reference pandas mode ties resolve alphabetically
    (gold_pipeline.py:205-215)."""
    return (
        df.filter(F.col(value).isNotNull())
        .groupBy(key, value)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(key)
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("neg"), F.col(value).alias("v"))
            ).alias("m")
        )
        .select(key, F.col("m.v").alias(alias))
    )


def user_summary(clickstream: DataFrame) -> DataFrame:
    """A1 (gold_pipeline.py:168-221). 2-decimal rounds use the
    engine-neutral floor(x*100+0.5)/100 form (round2_neutral) so the
    registered oracle twin hashes identically — F.round and DuckDB ROUND
    disagree on .5 double boundaries; all inputs here are positive so
    the form is exactly the reference's half-up."""
    base = clickstream.groupBy("user_id").agg(
        F.count("ts").alias("total_events"),
        F.countDistinct("product_id").alias("products_viewed"),
        F.countDistinct("session_id").alias("total_sessions"),
        round2_neutral(decimal_sum(F.col("event_weight").cast("double"))).alias(
            "total_engagement"
        ),
        round2_neutral(decimal_sum(F.col("product_price"))).alias(
            "total_value_browsed"
        ),
        round2_neutral(decimal_avg(F.col("product_price"))).alias(
            "avg_price_interest"
        ),
    )
    device = _mode(clickstream, "user_id", "device_type", "preferred_device")
    category = _mode(clickstream, "user_id", "product_category", "top_category")
    return (
        base.join(device, "user_id", "left")
        .join(category, "user_id", "left")
        .withColumn(
            "events_per_session",
            round2_neutral(
                F.col("total_events")
                / F.greatest(F.col("total_sessions"), F.lit(1)).cast("double")
            ),
        )
        .withColumn(
            "activity_level",
            cut_right_closed(F.col("total_events"), ACTIVITY_BINS, ACTIVITY_LABELS),
        )
        .withColumn("created_date", F.current_date().cast("string"))
    )


def product_summary(clickstream: DataFrame) -> DataFrame:
    """A2 (gold_pipeline.py:223-271): weighted popularity score
    (:245-249), qcut tier with constant fallback (:252-260),
    first(category) (:263-265)."""
    base = clickstream.groupBy("product_id").agg(
        F.countDistinct("user_id").alias("unique_viewers"),
        F.count(F.lit(1)).alias("total_interactions"),
        F.countDistinct("session_id").alias("unique_sessions"),
        F.round(decimal_sum(F.col("event_weight").cast("double")), 2).alias(
            "total_engagement"
        ),
        round2_neutral(decimal_avg(F.col("product_price"))).alias("avg_price"),
        F.first("product_category", ignorenulls=True).alias("category"),
    )
    scored = base.withColumn(
        "popularity_score",
        F.round(
            0.5 * F.col("unique_viewers")
            + 0.3 * F.col("total_interactions")
            + 0.2 * F.col("total_engagement"),
            2,
        ),
    )
    # qcut(4) ≈ ntile over a deterministic total order; the reference
    # falls back to a constant 'medium' when bins collapse
    # (gold_pipeline.py:259-260). The guard is a LAZY scalar aggregate
    # (broadcast cross-join, evaluated per-row) — no driver-side
    # ``.first()`` materializing the plan mid-build — and the ntile comes
    # from the scalable exact ranker, not an unpartitioned window.
    from ..operators.ranking import (
        RANK_COL,
        TOTAL_COL,
        ntile_from_rank,
        with_global_rank,
    )

    ranked = with_global_rank(scored, ["popularity_score", "product_id"])
    # the guard aggregates over RANKED (backed by the ranker's persisted
    # ranged frame) rather than `scored`: aggregating `scored` directly
    # would execute the whole upstream clickstream chain a second time
    nd = ranked.agg(F.countDistinct("popularity_score").alias("_nd"))
    tile = ntile_from_rank(F.col(RANK_COL), F.col(TOTAL_COL), 4)
    tier = F.when(
        F.col("_nd") >= 4,
        F.element_at(
            F.array(*[F.lit(x) for x in POPULARITY_TIER_LABELS]),
            tile.cast("int"),
        ),
    ).otherwise(F.lit("medium"))
    return (
        ranked.crossJoin(F.broadcast(nd))
        .withColumn("popularity_tier", tier)
        .withColumn("created_date", F.current_date().cast("string"))
        .drop(RANK_COL, TOTAL_COL, "_nd")
    )


def daily_stats(clickstream: DataFrame) -> DataFrame:
    """A3 (gold_pipeline.py:273-313); the mobile left-join (:304-307)
    becomes a conditional aggregation — same values, one shuffle.
    Rounds are engine-neutral (see user_summary)."""
    return (
        clickstream.withColumn("event_date", F.to_date("ts"))
        .groupBy("event_date")
        .agg(
            F.countDistinct("user_id").alias("daily_active_users"),
            F.countDistinct("product_id").alias("products_viewed"),
            F.countDistinct("session_id").alias("total_sessions"),
            F.count(F.lit(1)).alias("total_events"),
            round2_neutral(decimal_sum(F.col("event_weight").cast("double"))).alias(
                "total_engagement"
            ),
            F.sum(F.when(F.col("is_mobile"), 1).otherwise(0)).alias("mobile_events"),
        )
        .withColumn(
            "events_per_user",
            round2_neutral(
                F.col("total_events") / F.col("daily_active_users").cast("double")
            ),
        )
        .withColumn(
            "mobile_pct",
            # the reference rounds this to ONE decimal (gold_pipeline.py:307)
            round1_neutral(F.col("mobile_events") * 100.0 / F.col("total_events")),
        )
        .withColumn("created_date", F.current_date().cast("string"))
    )


def engagement_metrics(clickstream: DataFrame) -> DataFrame:
    """A4 (gold_pipeline.py:315-339) with share-of-total via window (W6)."""
    agg = clickstream.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("unique_users"),
        F.count(F.lit(1)).alias("total_events"),
        round2_neutral(decimal_sum(F.col("event_weight").cast("double"))).alias(
            "total_engagement"
        ),
    )
    return agg.withColumn(
        "event_pct",
        # the reference rounds this to ONE decimal (gold_pipeline.py:333)
        round1_neutral(
            F.col("total_events")
            * 100.0
            / F.sum("total_events").over(Window.partitionBy())
        ),
    ).withColumn("created_date", F.current_date().cast("string"))
