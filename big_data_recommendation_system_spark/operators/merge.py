"""Keyed upsert (MERGE) — incremental table maintenance without a lake
format: late-arriving corrections replace current rows by key, new keys
append. This is the operation a silver table needs when upstream emits
corrections (the reference re-processes whole files instead —
main_pipeline.py's full-refresh loop; this is the incremental form that
survives 100 TB, equivalent to ``MERGE WHEN MATCHED UPDATE / WHEN NOT
MATCHED INSERT`` with whole-row updates).

Plan shape: one LEFT ANTI join of base against the update keys + a
unionByName — both sides hash-partition on the key once, there is no
full-outer-join wide row, and the anti side streams (no row rewrite for
unmatched base rows until the sink). Updates must be key-unique; feed
them through keep-latest (operators/dedup.py) upstream when they are
not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``updates`` replace same-key rows of ``base``; new keys
    append. Column sets must match (unionByName)."""
    return base.join(
        updates.select(*keys).distinct(), keys, "left_anti"
    ).unionByName(updates)


CORRECTION_CUTOFF = "2024-01-25"


def events_upsert_corrections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert scenario over events: the last days of the window arrive
    again as corrections (value restated ×2); the merged table keeps
    every event exactly once — corrected rows where a correction exists,
    original rows elsewhere."""
    events = load_table(spark, sf_dir, "events")
    updates = events.filter(
        F.col("ts") >= F.lit(CORRECTION_CUTOFF).cast("timestamp")
    ).withColumn("value", F.col("value") * 2)
    return upsert(events, updates, ["event_id"]).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


EVENTS_UPSERT_SQL = f"""
WITH updates AS (
  SELECT event_id, ts, user_id, event_type, value * 2 AS value, props
  FROM events
  WHERE ts >= TIMESTAMP '{CORRECTION_CUTOFF} 00:00:00'
)
SELECT b.event_id, b.ts, b.user_id, b.event_type, b.value, b.props
FROM events b
LEFT JOIN updates u ON b.event_id = u.event_id
WHERE u.event_id IS NULL
UNION ALL
SELECT event_id, ts, user_id, event_type, value, props FROM updates
"""


def scd2_intervals(
    rows: DataFrame,
    key: str,
    attr: str,
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an observation
    stream: collapse consecutive equal values of ``attr`` per ``key``
    (ordered by ``ts_col``, ``tiebreak``) into validity intervals
    [effective_from, effective_to), open-ended for the current value.

    One shuffle on ``key``; change-point detection (lag), interval close
    (lead) and the current flag all ride the same per-key window
    partitioning."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    changed = rows.withColumn("__prev", F.lag(attr).over(w)).filter(
        F.col("__prev").isNull() | (F.col(attr) != F.col("__prev"))
    )
    w2 = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    return (
        changed.withColumn("effective_to", F.lead(ts_col).over(w2))
        .select(
            F.col(key),
            F.col(attr),
            F.col(ts_col).alias("effective_from"),
            "effective_to",
            F.col("effective_to").isNull().alias("is_current"),
        )
    )


def user_tier_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each user's value tier as observed in the cleaned
    event stream — when did a user move between spend tiers, and which
    interval is current."""
    from ..plans.silver import silver_events

    silver = silver_events(spark, sf_dir).select(
        "user_id", "value_tier", "ts", "event_id"
    )
    return scd2_intervals(silver, "user_id", "value_tier").orderBy(
        "user_id", "effective_from"
    )


def _user_tier_scd2_sql() -> str:
    from ..plans.silver import silver_cte

    return silver_cte("""
, ordered AS (
  SELECT user_id, value_tier, ts, event_id,
    LAG(value_tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier
  FROM silver
), changed AS (
  SELECT user_id, value_tier, ts, event_id FROM ordered
  WHERE prev_tier IS NULL OR value_tier != prev_tier
)
SELECT user_id, value_tier,
  ts AS effective_from,
  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM changed
ORDER BY user_id, effective_from
""")


USER_TIER_SCD2_SQL = _user_tier_scd2_sql()
