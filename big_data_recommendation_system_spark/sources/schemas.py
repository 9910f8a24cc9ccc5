"""Explicit StructTypes for the reference's four event topics
(FIXTURES.md §1-4; producers ingestion/producer/clickstream_producer.py:19-38,
ecommerce_producers.py:102-147,181-258,
recommendation_signals_producer.py:20-45).

The reference infers schema per batch from raw dicts
(main_pipeline.py:204); we declare the superset of both producer
generations as nullable fields — schema-on-read with optional columns,
PERMISSIVE mode, and a corrupt-record column for bad JSON lines
(replacing the reference's per-line json.JSONDecodeError skip,
storage_manager.py:97-98).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

CORRUPT_COL = "_corrupt_record"


def _f(name: str, dtype) -> StructField:
    return StructField(name, dtype, nullable=True)


CLICKSTREAM_SCHEMA = StructType(
    [
        _f("event_id", StringType()),
        _f("event_type", StringType()),
        _f("user_id", StringType()),
        _f("product_id", StringType()),
        _f("session_id", StringType()),
        _f("timestamp", StringType()),  # lenient: cast at silver (T1)
        _f("category", StringType()),
        _f("product_category", StringType()),
        _f("product_price", StringType()),  # lenient numeric (T2)
        _f("device_type", StringType()),
        _f("browser", StringType()),
        _f("referrer", StringType()),
        _f("page_url", StringType()),
        _f("user_agent", StringType()),
        _f("ip_address", StringType()),
        _f("location", StringType()),
        _f("price", StringType()),
        _f("quantity", StringType()),
        _f("total_amount", StringType()),
        _f("payment_method", StringType()),
        _f("search_query", StringType()),
        _f("search_results_count", StringType()),
        _f("recommendation_algorithm", StringType()),
        _f("recommended_products", ArrayType(StringType())),
        _f(CORRUPT_COL, StringType()),
    ]
)

USER_EVENTS_SCHEMA = StructType(
    [
        _f("user_id", StringType()),
        _f("timestamp", StringType()),
        _f("email", StringType()),
        _f("age", StringType()),
        _f("gender", StringType()),
        _f("location", StringType()),
        _f("signup_date", StringType()),
        _f("created_at", StringType()),
        _f("preferences", ArrayType(StringType())),
        _f("preferred_categories", ArrayType(StringType())),
        _f("total_orders", StringType()),
        _f("total_purchases", StringType()),
        _f("total_spent", StringType()),
        _f("avg_order_value", StringType()),
        _f("avg_session_duration", StringType()),
        _f("engagement_score", StringType()),
        _f("last_login", StringType()),
        _f("last_active", StringType()),
        _f("age_group", StringType()),
        _f("subscription_status", StringType()),
        _f("marketing_consent", BooleanType()),
        _f("device_type", StringType()),
        _f(CORRUPT_COL, StringType()),
    ]
)

PRODUCT_EVENTS_SCHEMA = StructType(
    [
        _f("product_id", StringType()),
        _f("timestamp", StringType()),
        _f("last_updated", StringType()),
        _f("name", StringType()),
        _f("category", StringType()),
        _f("subcategory", StringType()),
        _f("brand", StringType()),
        _f("price", StringType()),
        _f("avg_rating", StringType()),
        _f("rating", StringType()),
        _f("review_count", StringType()),
        _f("popularity_score", StringType()),
        _f("stock_quantity", StringType()),
        _f("in_stock", BooleanType()),
        _f("availability", StringType()),
        _f("description", StringType()),
        _f("features", ArrayType(StringType())),
        _f("tags", ArrayType(StringType())),
        _f("weight", StringType()),
        _f(
            "dimensions",
            StructType(
                [
                    _f("length", DoubleType()),
                    _f("width", DoubleType()),
                    _f("height", DoubleType()),
                ]
            ),
        ),
        _f("discount_percentage", IntegerType()),
        _f(CORRUPT_COL, StringType()),
    ]
)

RECOMMENDATION_SIGNALS_SCHEMA = StructType(
    [
        _f("signal_id", StringType()),
        _f("user_id", StringType()),
        _f("product_id", StringType()),
        _f("algorithm", StringType()),
        _f("confidence_score", DoubleType()),
        _f(
            "context",
            StructType(
                [
                    _f("session_id", StringType()),
                    _f("page_type", StringType()),
                    _f("time_of_day", IntegerType()),
                    _f("day_of_week", IntegerType()),
                ]
            ),
        ),
        _f(
            "features",
            StructType(
                [
                    _f("user_category_affinity", DoubleType()),
                    _f("product_popularity", DoubleType()),
                    _f("seasonal_factor", DoubleType()),
                    _f("price_sensitivity", DoubleType()),
                ]
            ),
        ),
        _f("timestamp", StringType()),
        _f(CORRUPT_COL, StringType()),
    ]
)

TOPIC_SCHEMAS = {
    "clickstream": CLICKSTREAM_SCHEMA,
    "user_events": USER_EVENTS_SCHEMA,
    "product_events": PRODUCT_EVENTS_SCHEMA,
    "recommendation_signals": RECOMMENDATION_SIGNALS_SCHEMA,
}
