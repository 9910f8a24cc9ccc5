"""Point-in-interval (temporal) join: enrich a fact row with the
dimension attribute that was valid AT the fact's timestamp, against an
SCD2-style interval table ([effective_from, effective_to), NULL-open
current interval — operators/merge.py:scd2_intervals).

Scale shape: the interval predicates RIDE the key equi-join — Spark
plans a hash join on ``key`` and evaluates the two timestamp bounds as
residual join conditions, so there is no BroadcastNestedLoop / cartesian
range join anywhere (the trap with a naive ``ON ts BETWEEN a AND b``
join without an equi key). Per-key interval counts are small (bounded by
change frequency), so the residual filter is cheap; skewed hot keys are
AQE's problem, same as any other fact-dim equi-join.

DuckDB oracle: the identical LEFT JOIN with the identical residual
predicate — both engines implement [from, to) with NULL-open intervals
via ``to IS NULL OR ts < to``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table  # noqa: F401  (parity with sibling operators)


def interval_enrich(
    facts: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: Column,
    payload: list[str],
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Left-join each fact to the interval covering ``ts`` (if any).
    ``intervals`` must be non-overlapping per key (SCD2 invariant), so
    at most one right row matches — row counts are preserved."""
    dims = intervals.select(
        F.col(key).alias("__k"),
        F.col(from_col).alias("__from"),
        F.col(to_col).alias("__to"),
        *payload,
    )
    cond = (
        (facts[key] == F.col("__k"))
        & (ts >= F.col("__from"))
        & (F.col("__to").isNull() | (ts < F.col("__to")))
    )
    return facts.join(dims, cond, "left").drop("__k", "__from", "__to")


def purchases_with_prior_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event enriched with the value tier the user was in
    ONE HOUR BEFORE the purchase (point-in-interval lookup against the
    SCD2 tier history; NULL when the lookback predates the user's first
    observation). The 1-hour shift makes the lookup genuinely temporal —
    the answer is not derivable from the purchase row itself."""
    from ..operators.merge import scd2_intervals
    from ..plans.silver import silver_events

    silver = silver_events(spark, sf_dir)
    tiers = scd2_intervals(
        silver.select("user_id", "value_tier", "ts", "event_id"),
        "user_id",
        "value_tier",
    ).withColumnRenamed("value_tier", "tier_then")
    purchases = silver.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value", "value_tier"
    )
    lookback = F.col("ts") - F.expr("interval 1 hour")
    out = interval_enrich(
        purchases, tiers, "user_id", lookback, ["tier_then"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("value_tier").alias("tier_now"),
        "tier_then",
        (
            F.col("tier_then").isNotNull()
            & (F.col("tier_then") != F.col("value_tier"))
        ).alias("tier_changed_last_hour"),
    ).orderBy("event_id")


def _purchases_with_prior_tier_sql() -> str:
    from ..plans.silver import silver_cte

    return silver_cte("""
, ordered AS (
  SELECT user_id, value_tier, ts, event_id,
    LAG(value_tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier
  FROM silver
), changed AS (
  SELECT user_id, value_tier, ts, event_id FROM ordered
  WHERE prev_tier IS NULL OR value_tier != prev_tier
), tiers AS (
  SELECT user_id, value_tier AS tier_then,
    ts AS effective_from,
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to
  FROM changed
), purchases AS (
  SELECT event_id, user_id, ts, value, value_tier
  FROM silver WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.value,
  p.value_tier AS tier_now,
  t.tier_then,
  (t.tier_then IS NOT NULL AND t.tier_then != p.value_tier)
    AS tier_changed_last_hour
FROM purchases p
LEFT JOIN tiers t
  ON p.user_id = t.user_id
  AND p.ts - INTERVAL 1 HOUR >= t.effective_from
  AND (t.effective_to IS NULL OR p.ts - INTERVAL 1 HOUR < t.effective_to)
ORDER BY p.event_id
""")


PURCHASES_WITH_PRIOR_TIER_SQL = _purchases_with_prior_tier_sql()
