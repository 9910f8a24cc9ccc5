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
