"""As-of join — an operator Spark's built-ins lack, composed from
existing DataFrame ops (the preferred strategy before reaching for
Pandas UDFs).

Semantics: for each left row, attach the most recent right row with the
same key whose timestamp is ≤ the left timestamp (backward as-of, the
point-in-time-correct enrichment used for feature stores / SCD lookups).

Implementation is the scalable union + carry-forward pattern, NOT a
range join:

    union(left-tagged, right-tagged)
      → window per key ordered by (ts, right-first)
      → last_value(right payload, ignoreNulls) carried forward
      → keep left rows

One shuffle on the key, linear in |L| + |R| — a naive range join is
|L|·|R| per key before pruning. Ties (left.ts == right.ts) match the
right row (right sorts first at equal ts), the same convention as
DuckDB's ASOF JOIN (>=) which serves as the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.silver import silver_cte, silver_events


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """Backward as-of join; right ``payload`` columns are appended to
    every left row (null when no right row precedes it).

    The payload is carried as ONE struct per right row, so (a) a matched
    right row whose payload value is legitimately NULL stays NULL (a
    per-column ``last(ignorenulls)`` would skip it and attach an older
    row's value — DuckDB ASOF, the oracle convention, returns the matched
    row's NULL), and (b) multiple payload columns can never mix values
    from different right rows."""
    lcols = left.columns
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.struct(*[F.col(c) for c in payload]).alias("__pp"),
    ).withColumn("__side", F.lit(0))
    struct_type = r.schema["__pp"].dataType
    l = (
        left.withColumn("__side", F.lit(1))
        .withColumn("__ts", F.col(left_ts))
        .withColumn("__pp", F.lit(None).cast(struct_type))
    )
    l_aligned = l.select(
        key, "__ts", "__side", "__pp", *[c for c in lcols if c != key]
    )
    unioned = l_aligned.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__matched", F.last("__pp", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__matched.{c}").alias(c) for c in payload]
    )


def events_with_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each event carries the value of the
    user's most recent signup event at-or-before the event's timestamp."""
    silver = silver_events(spark, sf_dir)
    signups = silver.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("signup_ts"),
        F.col("value").alias("signup_value"),
    )
    left = silver.filter(F.col("event_type") != "signup").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return asof_join_backward(
        left,
        signups,
        key="user_id",
        left_ts="ts",
        right_ts="signup_ts",
        payload=["signup_value"],
    )


EVENTS_WITH_LAST_SIGNUP_SQL = silver_cte("""
, signups AS (
  SELECT user_id, ts AS signup_ts, value AS signup_value
  FROM silver WHERE event_type = 'signup'
), lhs AS (
  SELECT user_id, event_id, ts, event_type, value
  FROM silver WHERE event_type != 'signup'
)
SELECT lhs.user_id, event_id, ts, event_type, value, signup_value
FROM lhs ASOF LEFT JOIN signups
  ON lhs.user_id = signups.user_id AND lhs.ts >= signups.signup_ts
""")
