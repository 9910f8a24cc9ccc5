"""Time-series resampling: calendar gap-fill + carry-forward over the
``events`` table.

A daily rollup keyed on (event_type, day) silently drops days with no
events — downstream trend/alerting logic then sees a shorter series,
not a zero. The gap-fill operator densifies the series against an
explicit calendar spine and forward-fills slowly-moving values:

1. rollup: one shuffle on (event_type, day), decimal-stable mean;
2. spine: global [min_day, max_day] from a scalar agg (broadcast — two
   rows of metadata, never a re-scan) × distinct event types via
   ``sequence()``/``explode`` — the spine is |days| × |types| rows of
   pure metadata, tiny at any data scale;
3. left join rollup onto spine (broadcast of the day range is implicit:
   the join is keyed on (event_type, day) and AQE sees the small side);
4. ``last(..., ignorenulls)`` over (type, day) carries the last
   observed mean across gap days — one partitioned window, no
   unpartitioned window anywhere.

The 100 TB shape: the only full-data pass is the first rollup; spine
construction and the fill window run on the rolled-up frame
(|types| × |days| rows — calendar-bounded metadata, same argument as
dq_trend).

Reference parity: none (the reference's daily_stats drops empty days);
beyond-the-reference time-series operator per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.pandas_parity import decimal_avg
from ..sources.tables import load_table


def daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-(event_type, day) daily series: observed count (0 on
    gap days), observed mean (NULL on gap days), carry-forward mean,
    and the is_gap flag."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type"), F.to_date("ts").alias("day"), F.col("value")
    )
    # one full-data pass; bounds and the type list derive from the tiny
    # rolled-up frame (scoped materialization, three consumers, no
    # per-call CacheManager leak), never a re-scan
    from ..operators.substrate import scoped_materialized

    daily = scoped_materialized(
        ev.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_avg(F.col("value")).alias("avg_value"),
        )
    )
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    types = daily.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    joined = spine.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_ff"),
        F.col("n_events").isNull().alias("is_gap"),
    ).orderBy("event_type", "day")


DAILY_GAPFILL_SQL = """
WITH ev AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
  FROM events
),
daily AS (
  SELECT event_type, day, COUNT(*) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS avg_value
  FROM ev GROUP BY event_type, day
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
spine AS (
  SELECT t.event_type, CAST(gs.day AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN bounds
  CROSS JOIN LATERAL unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS gs(day)
)
SELECT s.event_type, s.day,
  COALESCE(d.n_events, 0) AS n_events,
  d.avg_value,
  last_value(d.avg_value IGNORE NULLS) OVER (
    PARTITION BY s.event_type ORDER BY s.day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_ff,
  d.n_events IS NULL AS is_gap
FROM spine s LEFT JOIN daily d
  ON s.event_type = d.event_type AND s.day = d.day
ORDER BY s.event_type, s.day
"""


# --- burst detection --------------------------------------------------------

BURST_TRAIL_DAYS = 7
BURST_MIN_TRAIL = 3
BURST_Z = 2.0


def daily_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending/anomaly detection: per (event_type, day), the z-score of
    the day's event count against the trailing window of up to 7 prior
    OBSERVED days (row frame — gap days are the gapfill operator's
    concern), flagged when z ≥ 2. Days with fewer than 3 trailing
    observations emit NULL (no baseline), as does a zero-variance trail.

    Determinism: z = (k·x − Σx)/√(k·Σx² − (Σx)²) — the numerator and
    the radicand are exact integer window sums, so the only float ops
    are one sqrt and one division (bit-deterministic IEEE in both
    engines under any partitioning).

    Scale shape: one full-data rollup on (event_type, day); the window
    runs over the rolled-up frame — |types| × |days| calendar-bounded
    rows, same argument as dq_trend/gapfill."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return burst_scores(daily)


def burst_scores(daily: DataFrame) -> DataFrame:
    """The scoring stage alone, over any (event_type, day, n_events)
    frame — shared between the batch operator above and the streaming
    operator's equivalence test (streaming/burst.py)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-BURST_TRAIL_DAYS, -1)
    )
    k = F.count(F.lit(1)).over(w)
    sx = F.sum("n_events").over(w)
    sxx = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    var_num = k * sxx - sx * sx
    z = F.when(
        (k >= BURST_MIN_TRAIL) & (var_num > 0),
        (k * F.col("n_events") - sx).cast("double")
        / F.sqrt(var_num.cast("double")),
    )
    return (
        daily.select(
            "event_type",
            "day",
            "n_events",
            k.cast("long").alias("trail_days"),
            F.coalesce(sx, F.lit(0)).cast("long").alias("trail_sum"),
            z.alias("burst_z"),
            (z >= BURST_Z).alias("is_burst"),
        )
        .orderBy("event_type", "day")
    )


DAILY_BURST_DETECTION_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
win AS (
  SELECT event_type, day, n_events,
    COUNT(*) OVER w AS k,
    SUM(n_events) OVER w AS sx,
    SUM(n_events * n_events) OVER w AS sxx
  FROM daily
  WINDOW w AS (
    PARTITION BY event_type ORDER BY day
    ROWS BETWEEN {BURST_TRAIL_DAYS} PRECEDING AND 1 PRECEDING
  )
)
SELECT event_type, day, n_events,
  CAST(k AS BIGINT) AS trail_days,
  CAST(COALESCE(sx, 0) AS BIGINT) AS trail_sum,
  CASE WHEN k >= {BURST_MIN_TRAIL} AND k * sxx - sx * sx > 0 THEN
    CAST(k * n_events - sx AS DOUBLE) / sqrt(CAST(k * sxx - sx * sx AS DOUBLE))
  END AS burst_z,
  CASE WHEN k >= {BURST_MIN_TRAIL} AND k * sxx - sx * sx > 0 THEN
    CAST(k * n_events - sx AS DOUBLE) / sqrt(CAST(k * sxx - sx * sx AS DOUBLE))
      >= {BURST_Z}
  END AS is_burst
FROM win
ORDER BY event_type, day
"""


# --- open-order backlog (interval counting) ---------------------------------


def order_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog per day: how many orders have been placed but
    not yet fully shipped (an order is open from o_orderdate through its
    last lineitem ship date). The interval-counting pattern: convert
    each interval to a +1/−1 delta, roll deltas up per day, and take a
    running total over the calendar — NEVER a day × open-interval join
    (quadratic in backlog depth).

    Scale shape: one join orders⋈lineitem on the order key for the last
    ship date (co-partitioned keys), one delta rollup, then the running
    sum over the calendar-bounded daily frame (|days| rows of metadata —
    the single-partition window is on the tiny rollup, same argument as
    dq_trend). Orders with no lineitems never close — excluded by the
    inner join, stated here."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("start_day")
    )
    last_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.max(F.to_date("l_shipdate")).alias("close_day"))
    )
    spans = orders.join(last_ship, "o_orderkey")
    deltas = spans.select(
        F.col("start_day").alias("day"), F.lit(1).alias("delta")
    ).union(
        spans.select(
            F.date_add("close_day", 1).alias("day"), F.lit(-1).alias("delta")
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("net"))
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        daily.select(
            "day", F.sum("net").over(w).cast("long").alias("open_orders")
        )
        .orderBy("day")
    )


ORDER_BACKLOG_DAILY_SQL = """
WITH spans AS (
  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS start_day,
         MAX(CAST(l.l_shipdate AS DATE)) AS close_day
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
),
deltas AS (
  SELECT start_day AS day, 1 AS delta FROM spans
  UNION ALL
  SELECT close_day + INTERVAL 1 DAY AS day, -1 AS delta FROM spans
),
daily AS (SELECT CAST(day AS DATE) AS day, SUM(delta) AS net FROM deltas GROUP BY day)
SELECT day,
  CAST(SUM(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
    AS open_orders
FROM daily
ORDER BY day
"""
