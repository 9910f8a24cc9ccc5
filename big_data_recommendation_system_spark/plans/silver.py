"""Bronze→silver cleaning plans (reference behavioral spec:
processing/bronze-to-silver/main_pipeline.py:201-362).

Applied to the driver testdata ``events`` table (vocabulary
view/click/purchase/signup/error) the same way the reference applies its
cleaning to clickstream events:

- required-field null drop           (F1, main_pipeline.py:212-213)
- enum membership filter             (F2, main_pipeline.py:221-222;
                                      `error` rows are the invalid vocab)
- positive-value range predicate     (F3, main_pipeline.py:332-334)
- derived time features              (D1-D4, main_pipeline.py:225-227)
- event-weight map                   (D5, main_pipeline.py:230-235)
- right-closed value binning         (D7, main_pipeline.py:241-247)
- JSON property extraction           (D20, storage_manager.py:91)

Everything is a single narrow projection + filter — no shuffle; Catalyst
pushes the null/enum/range predicates into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EVENTS_TABLE_VOCAB, EVENTS_TABLE_WEIGHTS, VALUE_TIER_BINS, VALUE_TIER_LABELS
from ..functions.pandas_parity import (
    cut_right_closed,
    dayofweek_monday0,
    event_weight,
    is_weekend,
)
from ..sources.tables import load_table

_VOCAB_SQL = ", ".join(f"'{v}'" for v in EVENTS_TABLE_VOCAB)
_WEIGHT_SQL = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in sorted(EVENTS_TABLE_WEIGHTS.items())
)


def clean_events(df: DataFrame) -> DataFrame:
    """Silver cleaning of a raw events DataFrame (composable transform)."""
    return (
        df.na.drop(subset=["user_id", "event_type", "ts"])
        .filter(F.col("event_type").isin(EVENTS_TABLE_VOCAB))
        .filter(F.col("value") > 0)
        .select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            F.hour("ts").cast("int").alias("hour"),
            dayofweek_monday0(F.col("ts")).cast("int").alias("day_of_week"),
            F.date_format("ts", "EEEE").alias("day_name"),
            is_weekend(F.col("ts")).alias("is_weekend"),
            event_weight(F.col("event_type"), EVENTS_TABLE_WEIGHTS).cast("int").alias(
                "event_weight"
            ),
            cut_right_closed(F.col("value"), VALUE_TIER_BINS, VALUE_TIER_LABELS).alias(
                "value_tier"
            ),
            F.regexp_extract("props", r'"k":\s*(\d+)', 1).try_cast("int").alias("prop_k"),
            F.to_date("ts").alias("event_date"),
        )
    )


def silver_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean_events(load_table(spark, sf_dir, "events"))


# Reusable oracle body: downstream gold/operator oracles embed this as a CTE
# so Spark's clean_events and the DuckDB oracle always agree on the input.
SILVER_EVENTS_BODY = f"""
WITH e AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
  FROM events
)
SELECT
  event_id,
  ts,
  user_id,
  event_type,
  value,
  CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
  CAST(isodow(ts) - 1 AS INT) AS day_of_week,
  dayname(ts) AS day_name,
  isodow(ts) >= 6 AS is_weekend,
  CAST(CASE event_type {_WEIGHT_SQL} ELSE 1 END AS INT) AS event_weight,
  CASE
    WHEN value > 0 AND value <= 10 THEN 'low'
    WHEN value > 10 AND value <= 50 THEN 'mid'
    WHEN value > 50 AND value <= 100 THEN 'high'
    WHEN value > 100 THEN 'premium'
  END AS value_tier,
  TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS prop_k,
  CAST(ts AS DATE) AS event_date
FROM e
WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
  AND event_type IN ({_VOCAB_SQL})
  AND value > 0
"""

SILVER_EVENTS_SQL = SILVER_EVENTS_BODY


def silver_cte(tail_sql: str) -> str:
    """Wrap a query over the cleaned events as WITH silver AS (...) <tail>."""
    return f"WITH silver AS ({SILVER_EVENTS_BODY})\n{tail_sql}"
