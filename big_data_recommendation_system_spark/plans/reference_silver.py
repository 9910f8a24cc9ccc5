"""Reference-parity bronze→silver transforms, column-for-column against
processing/bronze-to-silver/main_pipeline.py:201-362 (the reference's
*working* pipeline — SURVEY.md §0 explains why the transformers package is
not the behavioral spec).

Inputs are FIXTURES.md-shaped DataFrames (read via sources/bronze.py);
lenient casts reproduce pandas ``errors='coerce'`` (null on failure).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import (
    EVENT_VOCAB_OLD,
    EVENT_WEIGHTS_OLD,
    PRICE_TIER_BINS,
    PRICE_TIER_LABELS,
    VALUE_SEGMENT_BINS,
    VALUE_SEGMENT_LABELS,
)
from ..functions.pandas_parity import cut_right_closed, event_weight, is_weekend
from ..operators.dedup import keep_latest

# the reference admits the OLD vocabulary + remove_from_cart
# (main_pipeline.py:221-222); see config for the dual-generation maps
_ADMITTED_EVENTS = EVENT_VOCAB_OLD


def _ts(col: str = "timestamp") -> Column:
    """T1 lenient ISO-8601 parse: pandas to_datetime(errors='coerce') —
    try_to_timestamp nulls malformed input (Spark 4 ANSI to_timestamp
    would throw)."""
    return F.try_to_timestamp(F.col(col))


def _num(col: str) -> Column:
    """T2 lenient numeric: pandas to_numeric(errors='coerce')."""
    return F.col(col).try_cast("double")


def clean_clickstream(df: DataFrame) -> DataFrame:
    """main_pipeline.py:201-263, column-for-column:
    required-null drop (:212), ts coerce+drop (:216-218), enum filter
    (:221), hour/day-name/weekend (:225-227), event_weight (:230-235),
    is_mobile (:238), price_tier (:241-247), session_sequence (:249-251),
    event_id dedup (:254-255), processing stamp (:258)."""
    out = (
        df.na.drop(subset=["user_id", "product_id", "event_type", "timestamp"])
        .withColumn("ts", _ts())
        .filter(F.col("ts").isNotNull())
        .filter(F.col("event_type").isin(_ADMITTED_EVENTS))
        .withColumn("product_price", _num("product_price"))
        .withColumn("hour", F.hour("ts"))
        .withColumn("day_of_week", F.date_format("ts", "EEEE"))
        .withColumn("is_weekend", is_weekend(F.col("ts")))
        .withColumn(
            "event_weight", event_weight(F.col("event_type"), EVENT_WEIGHTS_OLD)
        )
        .withColumn(
            "is_mobile", F.lower(F.col("device_type")).isin("mobile", "tablet")
        )
        .withColumn(
            "price_tier",
            cut_right_closed(F.col("product_price"), PRICE_TIER_BINS, PRICE_TIER_LABELS),
        )
        .withColumn(
            "session_sequence",
            F.row_number().over(
                Window.partitionBy("session_id").orderBy("ts", "event_id")
            ),
        )
        .dropDuplicates(["event_id"])
        .withColumn("silver_processed_at", F.current_timestamp())
        .withColumn("date", F.to_date("ts"))
    )
    return out


def clean_users(
    df: DataFrame,
    now: Column | None = None,
    tiebreak: Sequence[Column] = (),
) -> DataFrame:
    """main_pipeline.py:265-311: required drop (:276-277), ts coerce
    (:280-281), numeric coerce (:284-287), value_segment on
    total_spent.fillna(0) (:290-296 — NOTE pandas cut sends 0 outside the
    (0,100] bin → null segment; reproduced exactly), account_age_days
    (:298-300), keep-LATEST per user (:303), stamp (:306).

    ``tiebreak``: extra order columns after ts DESC — pandas keep='last'
    resolves ties by file order, which has no distributed equivalent;
    pass a unique column for run-to-run determinism."""
    now = now if now is not None else F.current_timestamp()
    out = (
        df.na.drop(subset=["user_id", "timestamp"])
        .withColumn("ts", _ts())
        .filter(F.col("ts").isNotNull())
        .withColumn("age", _num("age"))
        .withColumn("total_purchases", _num("total_purchases"))
        .withColumn("total_spent", _num("total_spent"))
        .withColumn(
            "value_segment",
            cut_right_closed(
                F.coalesce(F.col("total_spent"), F.lit(0.0)),
                VALUE_SEGMENT_BINS,
                VALUE_SEGMENT_LABELS,
            ),
        )
        .withColumn(
            "account_age_days",
            F.datediff(now, F.try_to_timestamp(F.col("created_at"))),
        )
    )
    out = keep_latest(out, ["user_id"], [F.col("ts").desc(), *tiebreak])
    return out.withColumn("silver_processed_at", F.current_timestamp()).withColumn(
        "date", F.to_date("ts")
    )


def clean_products(df: DataFrame, tiebreak: Sequence[Column] = ()) -> DataFrame:
    """main_pipeline.py:313-362: required drop (:324-325), ts coerce
    (:328-329), price coerce + positive filter (:332-334), price_tier
    (:337-342), category initcap(trim) (:345-346), is_in_stock (:349-351),
    keep-LATEST per product (:354), stamp (:357)."""
    out = (
        df.na.drop(subset=["product_id", "timestamp"])
        .withColumn("ts", _ts())
        .filter(F.col("ts").isNotNull())
        .withColumn("price", _num("price"))
        .filter(F.col("price") > 0)
        .withColumn(
            "price_tier",
            cut_right_closed(F.col("price"), PRICE_TIER_BINS, PRICE_TIER_LABELS),
        )
        .withColumn("category", F.initcap(F.trim(F.col("category"))))
        .withColumn("stock_quantity", _num("stock_quantity"))
        .withColumn("is_in_stock", F.col("stock_quantity") > 0)
    )
    out = keep_latest(out, ["product_id"], [F.col("ts").desc(), *tiebreak])
    return out.withColumn("silver_processed_at", F.current_timestamp()).withColumn(
        "date", F.to_date("ts")
    )
