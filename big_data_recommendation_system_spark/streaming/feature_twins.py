"""Deterministic BATCH twins of the two stateful R5 feature extractors
(feature_processor.stateful_user_features / stateful_product_features —
reference: ingestion/stream-processor/kafka_streams_processor.py:118-178).

A single-batch replay of the stateful operators over time-ordered input
with empty initial state is a pure function of the data — these twins
compute the identical per-event features with window functions only, so
the R5 feature math itself gets a DuckDB rows+schema+hash row in the
driver harness (the streaming forms are verified by replay-equivalence
tests, which cannot appear in ``queries()``).

Documented deviations from the streaming forms (both irrelevant at test
scale and to the math under test):
- ``secs_since_last`` is NULL for a user's first event (the stream emits
  NaN — Arrow float columns have no null carrier in the state path);
- the stream's state bounds (_MAX_SEEN distinct products, _MAX_VIEW_TS
  view-timestamp ring) are not applied — a batch pass needs no bound.

Scale shape: every window is keyed (user_id / user_id+session / product)
— no unpartitioned windows; the 6 per-category running counters share
one window frame so Spark evaluates them in a single WindowExec pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import SESSION_GAP_MINUTES
from ..plans.silver import silver_cte, silver_events
from .feature_processor import _CATEGORIES, _VIEW_TYPES

_GAP_US = SESSION_GAP_MINUTES * 60 * 1_000_000


def user_features_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stateful_user_features: lifetime running counters,
    >30-min-gap sessionization, per-session running category/product
    distincts, top-3 preferred categories (count desc, name asc, zeros
    excluded), trailing-5 event sequence, returning-to-product flag."""
    ev = silver_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.col("event_weight").cast("long").alias("event_weight"),
        F.coalesce(F.col("prop_k").cast("long"), F.lit(-1)).alias("prod"),
        "is_weekend",
    )
    n_cat = len(_CATEGORIES)
    cat_idx = F.when(F.col("prod") >= 0, F.col("prod") % 5).otherwise(n_cat - 1)
    ev = ev.withColumn("cat_idx", cat_idx)

    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_user_run = w_user.rowsBetween(Window.unboundedPreceding, 0)
    us = F.unix_micros("ts")
    gap = F.coalesce(
        (us - F.unix_micros(F.lag("ts").over(w_user))) > _GAP_US, F.lit(True)
    )
    ev = (
        ev.withColumn("user_event_count", F.row_number().over(w_user).cast("long"))
        .withColumn("user_total_weight", F.sum("event_weight").over(w_user_run))
        .withColumn(
            "secs_since_last",
            (us - F.unix_micros(F.lag("ts").over(w_user))) / F.lit(1e6),
        )
        .withColumn("seg", F.sum(gap.cast("long")).over(w_user_run))
    )

    w_sess = Window.partitionBy("user_id", "seg").orderBy("ts", "event_id")
    w_sess_run = w_sess.rowsBetween(Window.unboundedPreceding, 0)
    w_sess_5 = w_sess.rowsBetween(-4, 0)
    w_sess_all = Window.partitionBy("user_id", "seg")
    # first-occurrence flag of a product among qualifying view events
    w_prod = Window.partitionBy("user_id", "seg", "prod").orderBy("ts", "event_id")
    qual = F.col("event_type").isin(list(_VIEW_TYPES)) & (F.col("prod") >= 0)
    prior_qual = F.sum(qual.cast("long")).over(
        w_prod.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = qual & (F.coalesce(prior_qual, F.lit(0)) == 0)

    cat_cnts = [
        F.sum((F.col("cat_idx") == i).cast("long")).over(w_sess_run).alias(f"c{i}")
        for i in range(n_cat)
    ]
    ev = ev.select("*", *cat_cnts, F.sum(is_new.cast("long")).over(w_sess_run).alias(
        "products_viewed_count"
    ))

    # top-3 categories: sort struct(-cnt, name) asc == (cnt desc, name asc)
    cat_structs = F.array(
        *[
            F.struct(
                (-F.col(f"c{i}")).alias("neg"), F.lit(_CATEGORIES[i]).alias("name")
            )
            for i in range(n_cat)
        ]
    )
    top3 = F.slice(
        F.filter(F.sort_array(cat_structs), lambda x: x["neg"] < 0), 1, 3
    )
    pref = F.array_join(F.transform(top3, lambda x: x["name"]), ",")
    explored = F.size(F.filter(cat_structs, lambda x: x["neg"] < 0)).cast("long")

    ret = F.lit(False)
    for k in range(1, 5):
        lagged = F.lag("prod", k).over(w_sess)
        ret = ret | ((F.col("prod") == lagged) & (lagged >= 0))

    sess_start = F.min("ts").over(w_sess_all)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "user_event_count",
        "user_total_weight",
        "secs_since_last",
        sess_start.alias("session_start"),
        ((us - F.unix_micros(sess_start)) / F.lit(1e6)).alias(
            "session_duration_seconds"
        ),
        F.row_number().over(w_sess).cast("long").alias("events_in_session"),
        explored.alias("categories_explored"),
        "products_viewed_count",
        pref.alias("preferred_categories"),
        F.array_join(F.collect_list("event_type").over(w_sess_5), ",").alias(
            "recent_event_sequence"
        ),
        F.coalesce(ret, F.lit(False)).alias("is_returning_to_product"),
        F.hour("ts").cast("int").alias("hour_of_day"),
        "is_weekend",
    )


_CATS_SQL = ", ".join(f"'{c}'" for c in _CATEGORIES)
_N_CAT = len(_CATEGORIES)

_CAT_CNT_SQL = ",\n    ".join(
    f"SUM(CASE WHEN cat_idx = {i} THEN 1 ELSE 0 END) OVER w_sess_run AS c{i}"
    for i in range(_N_CAT)
)
_CAT_STRUCTS_SQL = ", ".join(
    f"{{'neg': -c{i}, 'name': '{_CATEGORIES[i]}'}}" for i in range(_N_CAT)
)
_RET_SQL = " OR ".join(
    f"(prod = lag(prod, {k}) OVER w_sess AND lag(prod, {k}) OVER w_sess >= 0)"
    for k in range(1, 5)
)

USER_FEATURES_BATCH_SQL = silver_cte(f"""
, ev AS (
  SELECT user_id, event_id, ts, event_type,
    CAST(event_weight AS BIGINT) AS event_weight,
    COALESCE(CAST(prop_k AS BIGINT), -1) AS prod,
    is_weekend,
    CASE WHEN COALESCE(CAST(prop_k AS BIGINT), -1) >= 0
         THEN COALESCE(CAST(prop_k AS BIGINT), -1) % 5
         ELSE {_N_CAT - 1} END AS cat_idx,
    epoch_us(ts) AS us
  FROM silver
), gaps AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER w_user AS BIGINT) AS user_event_count,
    CAST(SUM(event_weight) OVER w_user_run AS BIGINT) AS user_total_weight,
    (us - lag(us) OVER w_user) / 1e6 AS secs_since_last,
    CASE WHEN COALESCE(us - lag(us) OVER w_user > {_GAP_US}, TRUE)
         THEN 1 ELSE 0 END AS is_gap
  FROM ev
  WINDOW
    w_user AS (PARTITION BY user_id ORDER BY ts, event_id),
    w_user_run AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
), lifetime AS (
  SELECT *,
    SUM(is_gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS seg
  FROM gaps
), flags AS (
  SELECT *,
    (event_type IN ('view', 'click') AND prod >= 0)
      AND COALESCE(SUM(CASE WHEN event_type IN ('view', 'click') AND prod >= 0
                            THEN 1 ELSE 0 END) OVER (
            PARTITION BY user_id, seg, prod ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 0
      AS is_new
  FROM lifetime
), sess AS (
  SELECT *,
    {_CAT_CNT_SQL},
    CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) OVER w_sess_run AS BIGINT)
      AS products_viewed_count,
    MIN(ts) OVER w_sess_all AS session_start,
    CAST(ROW_NUMBER() OVER w_sess AS BIGINT) AS events_in_session,
    array_to_string(list(event_type) OVER w_sess_5, ',')
      AS recent_event_sequence,
    COALESCE({_RET_SQL}, FALSE) AS is_returning_to_product
  FROM flags
  WINDOW
    w_sess AS (PARTITION BY user_id, seg ORDER BY ts, event_id),
    w_sess_run AS (PARTITION BY user_id, seg ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING),
    w_sess_5 AS (PARTITION BY user_id, seg ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
    w_sess_all AS (PARTITION BY user_id, seg)
)
SELECT user_id, event_id, ts, event_type, user_event_count,
  user_total_weight, secs_since_last, session_start,
  (us - epoch_us(session_start)) / 1e6 AS session_duration_seconds,
  events_in_session,
  CAST(len(list_filter([{_CAT_STRUCTS_SQL}], x -> x.neg < 0)) AS BIGINT)
    AS categories_explored,
  products_viewed_count,
  array_to_string(
    list_transform(
      list_sort(list_filter([{_CAT_STRUCTS_SQL}], x -> x.neg < 0))[1:3],
      x -> x.name),
    ',') AS preferred_categories,
  recent_event_sequence,
  is_returning_to_product,
  CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
  is_weekend
FROM sess
""")


def product_features_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stateful_product_features: running view / cart /
    purchase counters keyed on the product, trailing-1h view count via a
    RANGE window on event-time micros (peers included — the same
    semantics as the stream's searchsorted over the view-ts buffer), and
    half-up 2-decimal conversion / cart rates ×100."""
    ev = (
        silver_events(spark, sf_dir)
        .filter(F.col("prop_k").isNotNull())
        .select(
            F.col("prop_k").cast("long").alias("prop_k"),
            "event_id",
            "ts",
            "event_type",
        )
    )
    is_view = F.col("event_type").isin(list(_VIEW_TYPES)).cast("long")
    is_cart = (F.col("event_type") == "signup").cast("long")
    is_buy = (F.col("event_type") == "purchase").cast("long")
    w_run = (
        Window.partitionBy("prop_k")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # trailing (ts-1h, ts] with same-timestamp peers included
    w_hour = (
        Window.partitionBy("prop_k")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-(3_600_000_000 - 1), 0)
    )
    v = F.sum(is_view).over(w_run)
    c = F.sum(is_cart).over(w_run)
    b = F.sum(is_buy).over(w_run)
    denom = F.greatest(v, F.lit(1)).cast("double")
    return ev.select(
        "prop_k",
        "event_id",
        "ts",
        "event_type",
        v.alias("product_total_views"),
        F.sum(is_view).over(w_hour).alias("product_recent_views"),
        (F.floor(b / denom * 100 * 100 + F.lit(0.5)) / 100).alias(
            "product_conversion_rate"
        ),
        (F.floor(c / denom * 100 * 100 + F.lit(0.5)) / 100).alias(
            "product_cart_rate"
        ),
    )


PRODUCT_FEATURES_BATCH_SQL = silver_cte("""
, ev AS (
  SELECT CAST(prop_k AS BIGINT) AS prop_k, event_id, ts, event_type,
    epoch_us(ts) AS us,
    CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END AS is_view,
    CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_cart,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_buy
  FROM silver WHERE prop_k IS NOT NULL
), run AS (
  SELECT prop_k, event_id, ts, event_type,
    CAST(SUM(is_view) OVER w_run AS BIGINT) AS v,
    CAST(SUM(is_cart) OVER w_run AS BIGINT) AS c,
    CAST(SUM(is_buy) OVER w_run AS BIGINT) AS b,
    CAST(SUM(is_view) OVER w_hour AS BIGINT) AS product_recent_views
  FROM ev
  WINDOW
    w_run AS (PARTITION BY prop_k ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING),
    w_hour AS (PARTITION BY prop_k ORDER BY us
               RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
)
SELECT prop_k, event_id, ts, event_type,
  v AS product_total_views,
  product_recent_views,
  floor(b / CAST(greatest(v, 1) AS DOUBLE) * 100 * 100 + 0.5) / 100
    AS product_conversion_rate,
  floor(c / CAST(greatest(v, 1) AS DOUBLE) * 100 * 100 + 0.5) / 100
    AS product_cart_rate
FROM run
""")
