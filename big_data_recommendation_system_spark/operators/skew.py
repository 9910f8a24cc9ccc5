"""Skew-handling helpers for hot keys (SURVEY.md §7.2 phase 8).

AQE's skew-join splitting covers joins; these helpers cover *aggregations*
with pathological key skew (one user generating a large share of events —
the reference's zipfian clickstream at 100 TB):

- ``salted_agg``: two-phase aggregation — add a random salt to the key,
  partially aggregate (user, salt) cells, then merge per user. Turns one
  giant reduce task into ``n_salts`` parallel ones. Only valid for
  decomposable aggregates (sum/count/min/max — pass merge exprs).
- ``approx_distinct_daily``: the approx_count_distinct flip for A3's DAU
  at 100 TB (exact distinct = 2-phase expand shuffle; HLL = one pass).
  Registered WITHOUT an oracle (engine HLL implementations differ) — the
  driver records the rows-only check, and the pytest suite bounds its
  error against the exact answer instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.silver import silver_cte, silver_events


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``merge_aggs``
    combine the partials per keys (referencing the partial aliases).
    """
    salt = (F.rand(seed=42) * n_salts).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*merge_aggs)


def user_engagement_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user_summary's decomposable core via salted two-phase aggregation —
    hash-identical to the direct groupBy (counts and int sums are exact
    under any grouping; the value sum stays DECIMAL until one final cast,
    so partial-merge order cannot perturb it), but the plan splits each
    hot user across ``n_salts`` reduce cells before the tiny merge —
    the escape hatch when one zipfian key exceeds a task even after
    AQE skew handling. Oracle: the direct single-phase SQL aggregation
    (salting is plan shape, not semantics)."""
    silver = silver_events(spark, sf_dir)
    return salted_agg(
        silver,
        ["user_id"],
        [
            F.count(F.lit(1)).alias("pc"),
            F.sum("event_weight").alias("pw"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("pv"),
        ],
        [
            F.sum("pc").alias("total_events"),
            F.sum("pw").alias("total_engagement"),
            F.sum("pv").cast("double").alias("total_value"),
        ],
    ).orderBy("user_id")


USER_ENGAGEMENT_SALTED_SQL = silver_cte("""
SELECT
  user_id,
  COUNT(*) AS total_events,
  CAST(SUM(event_weight) AS BIGINT) AS total_engagement,
  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM silver
GROUP BY user_id
ORDER BY user_id
""")


def approx_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 daily stats with approx_count_distinct (rsd=0.01) — the 100 TB
    path for distinct-user counting — with the EXACT count and a bounded
    relative-error flag beside the estimate, so the rows-only driver
    check records self-evidencing rows (the HLL sketch differs across
    engines, so no hash oracle is possible; instead every recorded row
    carries its own |approx-exact| <= 5% certificate — VERDICT r5
    item 4). The exact countDistinct costs one extra expand at sf-test
    scale and is exactly the column a 100 TB run would drop."""
    silver = silver_events(spark, sf_dir)
    return (
        silver.groupBy("event_date")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias(
                "approx_daily_active_users"
            ),
            F.countDistinct("user_id").alias("exact_daily_active_users"),
            F.count(F.lit(1)).alias("total_events"),
        )
        .withColumn(
            "rel_err_within_5pct",
            F.abs(
                F.col("approx_daily_active_users")
                - F.col("exact_daily_active_users")
            )
            <= F.greatest(
                F.lit(3),
                F.col("exact_daily_active_users") * F.lit(0.05),
            ),
        )
    )
