"""Cohort retention analysis over the events table — the acquisition-
cohort × day-offset activity matrix (the product-analytics rollup the
reference's gold layer stops short of; its user_summary keeps only
first/last seen).

Plan shape (the one that scales):
- first-touch per user: one hash agg on user_id
- activity: distinct (user_id, day) — hash agg on the compound key
- the two join on user_id (co-partitioned: both sides were just hashed
  on user_id-prefixed keys), then a tiny (cohort_day, k) rollup.
No windows, no fact-to-fact shuffle beyond the two aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

MAX_OFFSET_DAYS = 7


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (cohort_day, day_offset 0..MAX_OFFSET_DAYS): how many of the
    users first seen on cohort_day were active again day_offset days
    later, and the retention rate against the cohort size."""
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    cohort_sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = days.join(first, "user_id").withColumn(
        "day_offset", F.datediff("day", "cohort_day").cast("long")
    )
    retained = (
        joined.filter(F.col("day_offset").between(0, MAX_OFFSET_DAYS))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    return (
        retained.join(F.broadcast(cohort_sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_retained",
            "cohort_size",
            (
                F.col("n_retained").cast("double") / F.col("cohort_size")
            ).alias("retention_rate"),
        )
        .orderBy("cohort_day", "day_offset")
    )


COHORT_RETENTION_SQL = f"""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
),
cohort_sizes AS (
  SELECT cohort_day, COUNT(*) AS cohort_size FROM first GROUP BY cohort_day
),
retained AS (
  SELECT f.cohort_day,
    CAST(date_diff('day', f.cohort_day, d.day) AS BIGINT) AS day_offset,
    COUNT(*) AS n_retained
  FROM days d JOIN first f ON d.user_id = f.user_id
  WHERE date_diff('day', f.cohort_day, d.day) BETWEEN 0 AND {MAX_OFFSET_DAYS}
  GROUP BY 1, 2
)
SELECT r.cohort_day, r.day_offset, r.n_retained, c.cohort_size,
  CAST(r.n_retained AS DOUBLE) / c.cohort_size AS retention_rate
FROM retained r JOIN cohort_sizes c ON r.cohort_day = c.cohort_day
ORDER BY r.cohort_day, r.day_offset
"""


def daily_type_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_date, event_type): every margin — per-day,
    per-type, per-cell, grand total — in one grouping-sets expansion
    (map-side, no repeated scans)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(F.to_date("ts").alias("event_date"), "event_type")
        .cube("event_date", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.coalesce(F.col("event_date").cast("string"), F.lit("ALL")).alias(
                "event_date"
            ),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
        )
        .orderBy("event_date", "event_type")
    )


DAILY_TYPE_CUBE_SQL = """
SELECT
  COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS event_date,
  COALESCE(event_type, 'ALL') AS event_type,
  COUNT(*) AS n_events
FROM events
GROUP BY CUBE (CAST(ts AS DATE), event_type)
ORDER BY event_date, event_type
"""


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day staged conversion funnel with temporal ordering: a click
    counts only at-or-after the user's first view that day, a purchase
    only at-or-after that click. Three hash aggregations, all keyed on
    (user_id, day) — the stages re-join co-partitioned (no extra
    exchange after the first shuffle), then a tiny per-day rollup.

    This is the multi-stage temporal pattern (funnel) that a plain
    groupBy-count gets WRONG (counting same-day purchases that happened
    before the view)."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id", F.to_date("ts").alias("day"), "event_type", "ts"
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("tv"))
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .join(views, ["user_id", "day"])
        .filter(F.col("ts") >= F.col("tv"))
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("tc"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(clicks, ["user_id", "day"])
        .filter(F.col("ts") >= F.col("tc"))
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("tp"))
    )
    staged = views.join(clicks, ["user_id", "day"], "left").join(
        purchases, ["user_id", "day"], "left"
    )
    return (
        staged.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_viewed"),
            F.count("tc").alias("n_clicked"),
            F.count("tp").alias("n_purchased"),
        )
        .select(
            "day",
            "n_viewed",
            "n_clicked",
            "n_purchased",
            (F.col("n_clicked").cast("double") / F.col("n_viewed")).alias(
                "click_rate"
            ),
            (F.col("n_purchased").cast("double") / F.col("n_viewed")).alias(
                "purchase_rate"
            ),
        )
        .orderBy("day")
    )


CONVERSION_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type, ts FROM events
),
views AS (
  SELECT user_id, day, MIN(ts) AS tv FROM e
  WHERE event_type = 'view' GROUP BY user_id, day
),
clicks AS (
  SELECT e.user_id, e.day, MIN(e.ts) AS tc
  FROM e JOIN views v ON e.user_id = v.user_id AND e.day = v.day
  WHERE e.event_type = 'click' AND e.ts >= v.tv
  GROUP BY e.user_id, e.day
),
purchases AS (
  SELECT e.user_id, e.day, MIN(e.ts) AS tp
  FROM e JOIN clicks c ON e.user_id = c.user_id AND e.day = c.day
  WHERE e.event_type = 'purchase' AND e.ts >= c.tc
  GROUP BY e.user_id, e.day
),
staged AS (
  SELECT v.user_id, v.day, c.tc, p.tp
  FROM views v
  LEFT JOIN clicks c ON v.user_id = c.user_id AND v.day = c.day
  LEFT JOIN purchases p ON v.user_id = p.user_id AND v.day = p.day
)
SELECT day,
  COUNT(*) AS n_viewed,
  COUNT(tc) AS n_clicked,
  COUNT(tp) AS n_purchased,
  CAST(COUNT(tc) AS DOUBLE) / COUNT(*) AS click_rate,
  CAST(COUNT(tp) AS DOUBLE) / COUNT(*) AS purchase_rate
FROM staged
GROUP BY day
ORDER BY day
"""


# --- top event-type paths ---------------------------------------------------

PATH_PREFIX_LEN = 5
PATH_TOP_K = 50


def session_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the most common ordered event-type sequences (first
    5 events per user-day, '>'-joined), with how many user-days follow
    each path — the navigation-flow view behind funnel design, which the
    reference's per-step conversion_funnel collapses away.

    Plan shape: ONE hash aggregation on (user_id, day) building the
    ordered array map-side (collect_list + array_sort inside the agg —
    per-group data only, never a corpus-wide window), then a tiny
    (path, count) rollup and TakeOrdered. Ties are broken by event_id so
    the path string is deterministic under any partitioning."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.struct("ts", "event_id", "event_type").alias("s"),
    )
    per_day = e.groupBy("user_id", "day").agg(
        F.array_sort(F.collect_list("s")).alias("seq")
    )
    path = F.array_join(
        F.transform(
            F.slice("seq", 1, PATH_PREFIX_LEN), lambda x: x["event_type"]
        ),
        ">",
    )
    return (
        per_day.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
        .orderBy(F.desc("n_user_days"), F.asc("path"))
        .limit(PATH_TOP_K)
    )


SESSION_FUNNEL_PATHS_SQL = f"""
WITH per_day AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
    array_to_string(
      list_slice(list(event_type ORDER BY ts, event_id), 1, {PATH_PREFIX_LEN}),
      '>') AS path
  FROM events
  GROUP BY user_id, CAST(ts AS DATE)
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_user_days
FROM per_day
GROUP BY path
ORDER BY n_user_days DESC, path ASC
LIMIT {PATH_TOP_K}
"""
