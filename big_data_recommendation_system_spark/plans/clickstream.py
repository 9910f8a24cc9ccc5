"""Reference-shaped pipeline under the DuckDB oracle.

The reference's *working* pipeline (processing/bronze-to-silver/
main_pipeline.py:201-362 and silver-to-gold/gold_pipeline.py:223-271)
consumes clickstream/users/products topics that don't exist in the driver
testdata. This module derives those shapes DETERMINISTICALLY from the
testdata star schema — identical expressions on the Spark side and in the
DuckDB oracle SQL — so the actual reference transforms
(plans/reference_silver.py, plans/reference_gold.py) run under the hard
rows+schema+hash check, not just pytest parity on synthesized fixtures.

Derivations (mirrored line-for-line in the SQL CTEs below):

- clickstream  ← events   (product from the JSON ``k`` prop; device/
  category rotations keyed on event_id; deliberate NULL/garbage
  injections exercise the required-drop, ts-coerce and enum filters)
- users        ← orders   (each order is a profile snapshot → keep-latest
  per user is a real multi-row dedup; string `age` exercises the lenient
  numeric coerce)
- products     ← lineitem ⋈ part (each shipment is a product snapshot;
  negative-price injection exercises the positive filter; padded
  upper-case p_type exercises initcap(trim))

Nondeterministic audit stamps (silver_processed_at, created_date) are
excluded from the registered projections; pytest parity covers them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import (
    ACTIVITY_BINS,
    ACTIVITY_LABELS,
    EVENT_VOCAB_OLD,
    EVENT_WEIGHTS_OLD,
    PRICE_TIER_BINS,
    PRICE_TIER_LABELS,
    VALUE_SEGMENT_BINS,
    VALUE_SEGMENT_LABELS,
)
from ..sources.tables import load_table, spread_small_scan
from .reference_gold import (
    POPULARITY_TIER_LABELS,
    daily_stats,
    engagement_metrics,
    product_summary,
    user_summary,
)
from .reference_silver import clean_clickstream, clean_products, clean_users

_DEVICES = ["mobile", "Desktop", "TABLET", "phone"]
_CATEGORIES = ["electronics", "books", "home_garden", "toys", "sports"]
_PROP_K = r'"k":\s*(\d+)'
# fixed "now" so account_age_days is reproducible against the oracle
_NOW = "2026-01-01 00:00:00"


def _cut_sql(col: str, bins: Sequence[float], labels: Sequence[str]) -> str:
    """SQL twin of functions.pandas_parity.cut_right_closed."""
    arms = []
    for lo, hi, label in zip(bins[:-1], bins[1:], labels):
        hi_cond = "" if hi == float("inf") else f" AND {col} <= {hi}"
        arms.append(f"WHEN {col} > {lo}{hi_cond} THEN '{label}'")
    return "CASE " + " ".join(arms) + " END"


_WEIGHT_OLD_SQL = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in sorted(EVENT_WEIGHTS_OLD.items())
)
_VOCAB_OLD_SQL = ", ".join(f"'{v}'" for v in EVENT_VOCAB_OLD)
_DEVICES_SQL = ", ".join(f"'{d}'" for d in _DEVICES)
_CATEGORIES_SQL = ", ".join(f"'{c}'" for c in _CATEGORIES)
_TIER_LABELS_SQL = ", ".join(f"'{t}'" for t in POPULARITY_TIER_LABELS)


# --- clickstream ← events --------------------------------------------------


def synth_clickstream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the regex/format/when-chain synthesis below is the heavy
    # per-row work, and downstream clean_* filters act on SYNTHESIZED
    # columns (nothing pushdown-able is lost) — see spread_small_scan
    e = spread_small_scan(load_table(spark, sf_dir, "events"))
    pk = F.regexp_extract("props", _PROP_K, 1).try_cast("int")
    user = (
        F.when(F.col("event_id") % 97 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("u"), F.col("user_id").cast("string")))
    )
    ts_str = (
        F.when(F.col("event_id") % 101 == 0, F.lit("not-a-timestamp"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )
    return e.select(
        "event_id",
        user.alias("user_id"),
        F.concat(F.lit("P"), pk.cast("string")).alias("product_id"),
        F.when(F.col("event_type") == "signup", F.lit("add_to_cart"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        ts_str.alias("timestamp"),
        F.concat(user, F.lit("-"), F.to_date("ts").cast("string")).alias("session_id"),
        F.element_at(
            F.array(*[F.lit(d) for d in _DEVICES]),
            (F.col("event_id") % 4 + 1).cast("int"),
        ).alias("device_type"),
        F.col("value").alias("product_price"),
        F.element_at(
            F.array(*[F.lit(c) for c in _CATEGORIES]),
            (F.coalesce(pk, F.lit(0)) % 5 + 1).cast("int"),
        ).alias("product_category"),
    )


_CS_CTE = f"""
WITH cs0 AS (
  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value,
         TRY_CAST(regexp_extract(props, '{_PROP_K}', 1) AS INT) AS pk
  FROM events
), cs AS (
  SELECT
    event_id,
    CASE WHEN event_id % 97 = 0 THEN NULL
         ELSE 'u' || CAST(user_id AS VARCHAR) END AS user_id,
    'P' || CAST(pk AS VARCHAR) AS product_id,
    CASE WHEN event_type = 'signup' THEN 'add_to_cart' ELSE event_type END AS event_type,
    CASE WHEN event_id % 101 = 0 THEN 'not-a-timestamp'
         ELSE strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END AS timestamp,
    (CASE WHEN event_id % 97 = 0 THEN NULL
          ELSE 'u' || CAST(user_id AS VARCHAR) END)
      || '-' || CAST(CAST(ts AS DATE) AS VARCHAR) AS session_id,
    ([{_DEVICES_SQL}])[CAST(event_id % 4 + 1 AS INT)] AS device_type,
    value AS product_price,
    ([{_CATEGORIES_SQL}])[CAST(COALESCE(pk, 0) % 5 + 1 AS INT)] AS product_category
  FROM cs0
)"""

_CC_CTE = f"""{_CS_CTE}
, cc0 AS (
  SELECT *, TRY_CAST(timestamp AS TIMESTAMP) AS ts
  FROM cs
  WHERE user_id IS NOT NULL AND product_id IS NOT NULL
    AND event_type IS NOT NULL AND timestamp IS NOT NULL
), cc AS (
  SELECT event_id, user_id, product_id, event_type, session_id, device_type,
         product_price, product_category, ts,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
         dayname(ts) AS day_of_week,
         isodow(ts) >= 6 AS is_weekend,
         CAST(CASE event_type {_WEIGHT_OLD_SQL} ELSE 1 END AS BIGINT) AS event_weight,
         lower(device_type) IN ('mobile', 'tablet') AS is_mobile,
         {_cut_sql("product_price", PRICE_TIER_BINS, PRICE_TIER_LABELS)} AS price_tier,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY session_id ORDER BY ts, event_id
         ) AS BIGINT) AS session_sequence,
         CAST(ts AS DATE) AS date
  FROM cc0
  WHERE ts IS NOT NULL AND event_type IN ({_VOCAB_OLD_SQL})
  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY event_id) = 1
)"""


def clean_clickstream_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2, T1, D1-D7, D12, W1, X1 — the reference bronze→silver
    clickstream transform (main_pipeline.py:201-263) on the synthesized
    feed, deterministic columns only."""
    out = clean_clickstream(synth_clickstream(spark, sf_dir))
    return out.select(
        "event_id",
        "user_id",
        "product_id",
        "event_type",
        "session_id",
        "device_type",
        "product_price",
        "product_category",
        "ts",
        F.col("hour").cast("long").alias("hour"),
        "day_of_week",
        "is_weekend",
        F.col("event_weight").cast("long").alias("event_weight"),
        "is_mobile",
        "price_tier",
        F.col("session_sequence").cast("long").alias("session_sequence"),
        "date",
    )


CLEAN_CLICKSTREAM_SQL = f"""{_CC_CTE}
SELECT event_id, user_id, product_id, event_type, session_id, device_type,
       product_price, product_category, ts, hour, day_of_week, is_weekend,
       event_weight, is_mobile, price_tier, session_sequence, date
FROM cc
"""


# --- product_summary (A2) over the cleaned clickstream ---------------------


def product_summary_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (gold_pipeline.py:223-271) end-to-end: synthesized feed →
    clean_clickstream → product_summary, deterministic columns only."""
    out = product_summary(clean_clickstream(synth_clickstream(spark, sf_dir)))
    return out.select(
        "product_id",
        F.col("unique_viewers").cast("long").alias("unique_viewers"),
        F.col("total_interactions").cast("long").alias("total_interactions"),
        F.col("unique_sessions").cast("long").alias("unique_sessions"),
        "total_engagement",
        "avg_price",
        "category",
        "popularity_score",
        "popularity_tier",
    )


PRODUCT_SUMMARY_SQL = f"""{_CC_CTE}
, ps0 AS (
  SELECT product_id,
    COUNT(DISTINCT user_id) AS unique_viewers,
    COUNT(*) AS total_interactions,
    COUNT(DISTINCT session_id) AS unique_sessions,
    ROUND(CAST(SUM(CAST(CAST(event_weight AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE), 2)
      AS total_engagement,
    floor((CAST(SUM(CAST(product_price AS DECIMAL(38,6))) AS DOUBLE)
           / COUNT(product_price)) * 100 + 0.5) / 100 AS avg_price,
    MIN(product_category) AS category
  FROM cc GROUP BY product_id
), ps1 AS (
  SELECT *,
    ROUND(0.5e0 * unique_viewers + 0.3e0 * total_interactions
          + 0.2e0 * total_engagement, 2) AS popularity_score
  FROM ps0
), ps2 AS (
  SELECT *,
    NTILE(4) OVER (ORDER BY popularity_score, product_id) AS _tile,
    (SELECT COUNT(DISTINCT popularity_score) FROM ps1) AS _nd
  FROM ps1
)
SELECT product_id, unique_viewers, total_interactions, unique_sessions,
  total_engagement, avg_price, category, popularity_score,
  CASE WHEN _nd >= 4 THEN ([{_TIER_LABELS_SQL}])[_tile] ELSE 'medium' END
    AS popularity_tier
FROM ps2
"""


# --- users ← orders --------------------------------------------------------


def synth_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spread_small_scan(load_table(spark, sf_dir, "orders"))
    ts = F.col("o_orderdate") + F.make_interval(
        secs=(F.col("o_orderkey") % 86400).cast("int")
    )
    user = (
        F.when(F.col("o_orderkey") % 89 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("u"), F.col("o_custkey").cast("string")))
    )
    ts_str = (
        F.when(F.col("o_orderkey") % 83 == 0, F.lit("not-a-ts"))
        .otherwise(F.date_format(ts, "yyyy-MM-dd HH:mm:ss"))
    )
    created = F.date_format(
        F.col("o_orderdate")
        - F.make_interval(days=(F.col("o_custkey") % 1000).cast("int")),
        "yyyy-MM-dd HH:mm:ss",
    )
    age = (
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("unknown"))
        .otherwise((F.col("o_custkey") % 60 + 18).cast("string"))
    )
    return o.select(
        F.col("o_orderkey").alias("record_id"),
        user.alias("user_id"),
        ts_str.alias("timestamp"),
        age.alias("age"),
        (F.col("o_orderkey") % 20).cast("string").alias("total_purchases"),
        F.col("o_totalprice").alias("total_spent"),
        created.alias("created_at"),
    )


def clean_users_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2, D7 value segments, D14 account age, X2 keep-latest — the
    reference users transform (main_pipeline.py:265-311) with a pinned
    "now" and an explicit tiebreak for run-to-run determinism."""
    out = clean_users(
        synth_users(spark, sf_dir),
        now=F.lit(_NOW).cast("timestamp"),
        tiebreak=[F.col("record_id").desc()],
    )
    return out.select(
        "record_id",
        "user_id",
        "ts",
        "age",
        "total_purchases",
        "total_spent",
        "value_segment",
        F.col("account_age_days").cast("long").alias("account_age_days"),
        "date",
    )


CLEAN_USERS_SQL = f"""
WITH us0 AS (
  SELECT o_orderkey AS record_id,
    CASE WHEN o_orderkey % 89 = 0 THEN NULL
         ELSE 'u' || CAST(o_custkey AS VARCHAR) END AS user_id,
    CASE WHEN o_orderkey % 83 = 0 THEN 'not-a-ts'
         ELSE strftime(o_orderdate + (o_orderkey % 86400) * INTERVAL 1 SECOND,
                       '%Y-%m-%d %H:%M:%S') END AS timestamp,
    CASE WHEN o_orderkey % 13 = 0 THEN 'unknown'
         ELSE CAST(o_custkey % 60 + 18 AS VARCHAR) END AS age,
    CAST(o_orderkey % 20 AS VARCHAR) AS total_purchases,
    o_totalprice AS total_spent,
    strftime(o_orderdate - (o_custkey % 1000) * INTERVAL 1 DAY,
             '%Y-%m-%d %H:%M:%S') AS created_at
  FROM orders
), us1 AS (
  SELECT *, TRY_CAST(timestamp AS TIMESTAMP) AS ts
  FROM us0
  WHERE user_id IS NOT NULL AND timestamp IS NOT NULL
), us2 AS (
  SELECT record_id, user_id, ts,
    TRY_CAST(age AS DOUBLE) AS age,
    TRY_CAST(total_purchases AS DOUBLE) AS total_purchases,
    total_spent,
    {_cut_sql("COALESCE(total_spent, 0)", VALUE_SEGMENT_BINS, VALUE_SEGMENT_LABELS)}
      AS value_segment,
    CAST(datediff('day', CAST(TRY_CAST(created_at AS TIMESTAMP) AS DATE),
                  DATE '{_NOW.split(" ")[0]}') AS BIGINT) AS account_age_days,
    CAST(ts AS DATE) AS date
  FROM us1 WHERE ts IS NOT NULL
)
SELECT record_id, user_id, ts, age, total_purchases, total_spent,
       value_segment, account_age_days, date
FROM us2
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, record_id DESC) = 1
"""


# --- products ← lineitem ⋈ part -------------------------------------------


def synth_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread_small_scan(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    rid = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    ts = F.col("l_shipdate") + F.make_interval(secs=(rid % 86400).cast("int"))
    pid = (
        F.when(rid % 93 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("P"), F.col("l_partkey").cast("string")))
    )
    ts_str = (
        F.when(rid % 89 == 0, F.lit("not-a-ts"))
        .otherwise(F.date_format(ts, "yyyy-MM-dd HH:mm:ss"))
    )
    price = F.when(
        rid % 97 == 0, -F.col("l_extendedprice") / 100
    ).otherwise(F.col("l_extendedprice") / 100)
    return j.select(
        rid.alias("record_id"),
        pid.alias("product_id"),
        ts_str.alias("timestamp"),
        price.alias("price"),
        F.concat(F.lit("  "), F.col("p_type")).alias("category"),
        F.when(F.col("l_linenumber") == 7, F.lit(0.0))
        .otherwise(F.col("l_quantity"))
        .alias("stock_quantity"),
    )


def clean_products_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2, F3 positive filter, D7 price tiers, D12 initcap(trim),
    D16 stock flag, X2 keep-latest — the reference products transform
    (main_pipeline.py:313-362)."""
    out = clean_products(
        synth_products(spark, sf_dir), tiebreak=[F.col("record_id").desc()]
    )
    return out.select(
        "record_id",
        "product_id",
        "ts",
        "price",
        "price_tier",
        "category",
        "stock_quantity",
        "is_in_stock",
        "date",
    )


CLEAN_PRODUCTS_SQL = f"""
WITH pr0 AS (
  SELECT l_orderkey * 10 + l_linenumber AS record_id,
    CASE WHEN (l_orderkey * 10 + l_linenumber) % 93 = 0 THEN NULL
         ELSE 'P' || CAST(l_partkey AS VARCHAR) END AS product_id,
    CASE WHEN (l_orderkey * 10 + l_linenumber) % 89 = 0 THEN 'not-a-ts'
         ELSE strftime(
           l_shipdate + ((l_orderkey * 10 + l_linenumber) % 86400) * INTERVAL 1 SECOND,
           '%Y-%m-%d %H:%M:%S') END AS timestamp,
    CASE WHEN (l_orderkey * 10 + l_linenumber) % 97 = 0
         THEN -l_extendedprice / 100 ELSE l_extendedprice / 100 END AS price,
    '  ' || p_type AS category,
    CASE WHEN l_linenumber = 7 THEN 0.0 ELSE l_quantity END AS stock_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
), pr1 AS (
  SELECT *, TRY_CAST(timestamp AS TIMESTAMP) AS ts
  FROM pr0
  WHERE product_id IS NOT NULL AND timestamp IS NOT NULL
), pr2 AS (
  SELECT record_id, product_id, ts, price,
    {_cut_sql("price", PRICE_TIER_BINS, PRICE_TIER_LABELS)} AS price_tier,
    array_to_string(
      list_transform(string_split(lower(trim(category)), ' '),
                     x -> upper(x[1]) || x[2:]),
      ' ') AS category,
    stock_quantity,
    stock_quantity > 0 AS is_in_stock,
    CAST(ts AS DATE) AS date
  FROM pr1 WHERE ts IS NOT NULL AND price > 0
)
SELECT record_id, product_id, ts, price, price_tier, category,
       stock_quantity, is_in_stock, date
FROM pr2
QUALIFY ROW_NUMBER() OVER (PARTITION BY product_id ORDER BY ts DESC, record_id DESC) = 1
"""


# --- remaining reference gold tables (A1/A3/A4) over the cleaned feed ------
# product_summary already runs under the driver hash (registered as
# product_summary); these three give the reference's other headline gold
# outputs (gold_pipeline.py:168-221, :273-313, :315-339) the same hard
# rows+schema+hash check. All 2-decimal rounds are the engine-neutral
# floor(x*100 + 0.5)/100 form — see reference_gold.user_summary.

_ROUND2 = "floor(({x}) * 100 + 0.5) / 100"

# mobile_pct / event_pct are ONE-decimal in the reference
# (gold_pipeline.py:307,333 use .round(1)) — same neutral form at 10×.
_ROUND1 = "floor(({x}) * 10 + 0.5) / 10"


def _r2(x: str) -> str:
    return _ROUND2.format(x=x)


def _r1(x: str) -> str:
    return _ROUND1.format(x=x)


def ref_user_summary_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (gold_pipeline.py:168-221) end-to-end under the hash:
    per-user counts, decimal engagement/value sums, mode-with-tie-break
    preferred_device / top_category, activity binning."""
    out = user_summary(clean_clickstream(synth_clickstream(spark, sf_dir)))
    return out.select(
        "user_id",
        F.col("total_events").cast("long").alias("total_events"),
        F.col("products_viewed").cast("long").alias("products_viewed"),
        F.col("total_sessions").cast("long").alias("total_sessions"),
        "total_engagement",
        "total_value_browsed",
        "avg_price_interest",
        "preferred_device",
        "top_category",
        "events_per_session",
        "activity_level",
    )


REF_USER_SUMMARY_SQL = f"""{_CC_CTE}
, base AS (
  SELECT user_id,
    CAST(COUNT(ts) AS BIGINT) AS total_events,
    CAST(COUNT(DISTINCT product_id) AS BIGINT) AS products_viewed,
    CAST(COUNT(DISTINCT session_id) AS BIGINT) AS total_sessions,
    {_r2("CAST(SUM(CAST(CAST(event_weight AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE)")}
      AS total_engagement,
    {_r2("CAST(SUM(CAST(product_price AS DECIMAL(38,6))) AS DOUBLE)")}
      AS total_value_browsed,
    {_r2("CAST(SUM(CAST(product_price AS DECIMAL(38,6))) AS DOUBLE) / COUNT(product_price)")}
      AS avg_price_interest
  FROM cc GROUP BY user_id
), dev AS (
  SELECT user_id, device_type AS preferred_device
  FROM (SELECT user_id, device_type, COUNT(*) AS cnt
        FROM cc WHERE device_type IS NOT NULL GROUP BY 1, 2)
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY cnt DESC, device_type ASC) = 1
), cat AS (
  SELECT user_id, product_category AS top_category
  FROM (SELECT user_id, product_category, COUNT(*) AS cnt
        FROM cc WHERE product_category IS NOT NULL GROUP BY 1, 2)
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY cnt DESC, product_category ASC) = 1
)
SELECT base.user_id, total_events, products_viewed, total_sessions,
  total_engagement, total_value_browsed, avg_price_interest,
  preferred_device, top_category,
  {_r2("CAST(total_events AS DOUBLE) / greatest(total_sessions, 1)")}
    AS events_per_session,
  {_cut_sql("total_events", ACTIVITY_BINS, ACTIVITY_LABELS)} AS activity_level
FROM base
LEFT JOIN dev ON base.user_id = dev.user_id
LEFT JOIN cat ON base.user_id = cat.user_id
"""


def ref_daily_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (gold_pipeline.py:273-313) under the hash: per-day rollup with
    the mobile left-join as conditional aggregation, mobile_pct."""
    out = daily_stats(clean_clickstream(synth_clickstream(spark, sf_dir)))
    return out.select(
        "event_date",
        F.col("daily_active_users").cast("long").alias("daily_active_users"),
        F.col("products_viewed").cast("long").alias("products_viewed"),
        F.col("total_sessions").cast("long").alias("total_sessions"),
        F.col("total_events").cast("long").alias("total_events"),
        "total_engagement",
        F.col("mobile_events").cast("long").alias("mobile_events"),
        "events_per_user",
        "mobile_pct",
    )


REF_DAILY_STATS_SQL = f"""{_CC_CTE}
, ds AS (
  SELECT CAST(ts AS DATE) AS event_date,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS daily_active_users,
    CAST(COUNT(DISTINCT product_id) AS BIGINT) AS products_viewed,
    CAST(COUNT(DISTINCT session_id) AS BIGINT) AS total_sessions,
    CAST(COUNT(*) AS BIGINT) AS total_events,
    {_r2("CAST(SUM(CAST(CAST(event_weight AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE)")}
      AS total_engagement,
    CAST(SUM(CASE WHEN is_mobile THEN 1 ELSE 0 END) AS BIGINT) AS mobile_events
  FROM cc GROUP BY 1
)
SELECT event_date, daily_active_users, products_viewed, total_sessions,
  total_events, total_engagement, mobile_events,
  {_r2("CAST(total_events AS DOUBLE) / daily_active_users")} AS events_per_user,
  {_r1("mobile_events * 100.0 / total_events")} AS mobile_pct
FROM ds
"""


def ref_engagement_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (gold_pipeline.py:315-339) under the hash: per-event-type
    rollup with event_pct share-of-total (W6)."""
    out = engagement_metrics(clean_clickstream(synth_clickstream(spark, sf_dir)))
    return out.select(
        "event_type",
        F.col("unique_users").cast("long").alias("unique_users"),
        F.col("total_events").cast("long").alias("total_events"),
        "total_engagement",
        "event_pct",
    )


REF_ENGAGEMENT_METRICS_SQL = f"""{_CC_CTE}
, em AS (
  SELECT event_type,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users,
    CAST(COUNT(*) AS BIGINT) AS total_events,
    {_r2("CAST(SUM(CAST(CAST(event_weight AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE)")}
      AS total_engagement
  FROM cc GROUP BY event_type
)
SELECT event_type, unique_users, total_events, total_engagement,
  {_r1("total_events * 100.0 / SUM(total_events) OVER ()")} AS event_pct
FROM em
"""
