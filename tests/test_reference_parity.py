"""Reference-parity E2E: seeded JSONL bronze (FIXTURES.md shapes incl. the
reference's own 4-record micro-fixture) → silver → gold, asserting the
exact semantics main_pipeline.py / gold_pipeline.py produce."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_recommendation_system_spark.plans.reference_gold import (
    daily_stats,
    engagement_metrics,
    product_summary,
    user_summary,
)
from big_data_recommendation_system_spark.plans.reference_silver import (
    clean_clickstream,
    clean_products,
    clean_users,
)
from big_data_recommendation_system_spark.sources.bronze import read_bronze, split_corrupt

CLICKSTREAM_LINES = [
    # clean events: one user, one session, ordered; price exactly on the
    # 50-edge must be 'budget' (right-closed cut)
    {"event_id": "e1", "event_type": "view", "user_id": "u1", "product_id": "p1",
     "session_id": "s1", "timestamp": "2025-09-05T12:00:00Z", "product_price": 50.0,
     "device_type": "Mobile", "product_category": "books"},
    {"event_id": "e2", "event_type": "click", "user_id": "u1", "product_id": "p1",
     "session_id": "s1", "timestamp": "2025-09-05T12:00:10Z", "product_price": 50.01,
     "device_type": "desktop", "product_category": "books"},
    {"event_id": "e3", "event_type": "purchase", "user_id": "u1", "product_id": "p1",
     "session_id": "s1", "timestamp": "2025-09-06T09:00:00Z", "product_price": 1000.0,
     "device_type": "tablet", "product_category": "books"},
    # second user, weekend (2025-09-07 is a Sunday)
    {"event_id": "e4", "event_type": "add_to_cart", "user_id": "u2", "product_id": "p2",
     "session_id": "s2", "timestamp": "2025-09-07T10:00:00Z", "product_price": 1000.01,
     "device_type": "desktop", "product_category": "sports"},
    # duplicate event_id → deduped (X1)
    {"event_id": "e4", "event_type": "add_to_cart", "user_id": "u2", "product_id": "p2",
     "session_id": "s2", "timestamp": "2025-09-07T10:00:00Z", "product_price": 1000.01,
     "device_type": "desktop", "product_category": "sports"},
    # new-generation vocabulary → filtered by the OLD-vocab pipeline (F2)
    {"event_id": "e5", "event_type": "page_view", "user_id": "u2", "product_id": "p2",
     "session_id": "s2", "timestamp": "2025-09-07T10:01:00Z"},
    # missing required product_id → dropped (F1)
    {"event_id": "e6", "event_type": "view", "user_id": "u2",
     "session_id": "s2", "timestamp": "2025-09-07T10:02:00Z"},
    # unparseable timestamp → dropped (F4)
    {"event_id": "e7", "event_type": "view", "user_id": "u2", "product_id": "p2",
     "session_id": "s2", "timestamp": "not-a-time"},
]

USER_LINES = [
    {"user_id": "u1", "timestamp": "2025-09-01T00:00:00Z", "total_spent": 100.0,
     "created_at": "2025-08-01T00:00:00Z"},
    # later snapshot wins (X2 keep-latest); total_spent 0 → NULL segment
    # (pandas cut: 0 outside (0,100])
    {"user_id": "u1", "timestamp": "2025-09-02T00:00:00Z", "total_spent": 0.0,
     "created_at": "2025-08-01T00:00:00Z"},
    {"user_id": "u2", "timestamp": "2025-09-01T12:00:00Z", "total_spent": 5000.01},
]

PRODUCT_LINES = [
    {"product_id": "p1", "timestamp": "2025-09-01T00:00:00Z", "price": 25.0,
     "category": "  home & GARDEN ", "stock_quantity": 0},
    {"product_id": "p2", "timestamp": "2025-09-01T00:00:00Z", "price": -5.0,
     "category": "toys", "stock_quantity": 3},  # non-positive price → dropped
    {"product_id": "p3", "timestamp": "2025-09-01T00:00:00Z", "price": 200.0,
     "category": "books", "stock_quantity": 7},
]


@pytest.fixture(scope="module")
def bronze_dir(spark):
    tmp = tempfile.mkdtemp(prefix="bdrs_bronze_")
    for topic, lines in [
        ("clickstream", CLICKSTREAM_LINES),
        ("user_events", USER_LINES),
        ("product_events", PRODUCT_LINES),
    ]:
        os.makedirs(os.path.join(tmp, topic))
        with open(os.path.join(tmp, topic, "part-0.json"), "w") as f:
            for rec in lines:
                f.write(json.dumps(rec) + "\n")
            if topic == "clickstream":
                f.write("{this is not json\n")  # corrupt line → PERMISSIVE
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_bronze_read_permissive(spark, bronze_dir):
    raw = read_bronze(spark, "clickstream", os.path.join(bronze_dir, "clickstream"))
    good, bad = split_corrupt(raw)
    assert bad.count() == 1  # the broken JSON line
    assert good.count() == len(CLICKSTREAM_LINES)
    assert "_source_file" in good.columns and "_processed_at" in good.columns


def test_clean_clickstream_semantics(spark, bronze_dir):
    raw, _ = split_corrupt(
        read_bronze(spark, "clickstream", os.path.join(bronze_dir, "clickstream"))
    )
    silver = clean_clickstream(raw)
    rows = {r.event_id: r for r in silver.collect()}
    # retention: e1-e4 survive; dup e4 deduped; e5 (new vocab), e6 (null
    # required), e7 (bad ts) dropped
    assert sorted(rows) == ["e1", "e2", "e3", "e4"]
    assert rows["e1"].price_tier == "budget"  # 50.0 right-closed
    assert rows["e2"].price_tier == "low"  # 50.01
    assert rows["e3"].price_tier == "high"  # 1000.0
    assert rows["e4"].price_tier == "premium"  # 1000.01
    assert rows["e1"].event_weight == 1 and rows["e3"].event_weight == 10
    assert rows["e1"].is_mobile and not rows["e2"].is_mobile and rows["e3"].is_mobile
    assert rows["e1"].day_of_week == "Friday" and not rows["e1"].is_weekend
    assert rows["e4"].day_of_week == "Sunday" and rows["e4"].is_weekend
    assert [rows[e].session_sequence for e in ["e1", "e2", "e3"]] == [1, 2, 3]
    assert rows["e1"].hour == 12


def test_clean_users_semantics(spark, bronze_dir):
    raw, _ = split_corrupt(
        read_bronze(spark, "user_events", os.path.join(bronze_dir, "user_events"))
    )
    silver = clean_users(raw)
    rows = {r.user_id: r for r in silver.collect()}
    assert len(rows) == 2  # keep-latest snapshot per user
    assert rows["u1"].ts.day == 2  # the later snapshot won
    assert rows["u1"].value_segment is None  # total_spent 0 → outside (0,100]
    assert rows["u2"].value_segment == "vip"  # 5000.01 → (5000, inf]
    assert rows["u1"].account_age_days is not None
    assert rows["u2"].account_age_days is None  # no created_at


def test_clean_products_semantics(spark, bronze_dir):
    raw, _ = split_corrupt(
        read_bronze(spark, "product_events", os.path.join(bronze_dir, "product_events"))
    )
    silver = clean_products(raw)
    rows = {r.product_id: r for r in silver.collect()}
    assert sorted(rows) == ["p1", "p3"]  # p2 dropped (price <= 0)
    assert rows["p1"].category == "Home & Garden"  # initcap(trim)
    assert rows["p1"].price_tier == "budget" and not rows["p1"].is_in_stock
    assert rows["p3"].price_tier == "low" and rows["p3"].is_in_stock


def test_reference_gold_tables(spark, bronze_dir):
    raw, _ = split_corrupt(
        read_bronze(spark, "clickstream", os.path.join(bronze_dir, "clickstream"))
    )
    silver = clean_clickstream(raw)

    us = {r.user_id: r for r in user_summary(silver).collect()}
    assert us["u1"].total_events == 3 and us["u1"].total_sessions == 1
    assert us["u1"].total_engagement == 13.0  # 1 + 2 + 10
    assert us["u1"].total_value_browsed == 1100.01
    assert us["u1"].events_per_session == 3.0
    assert us["u1"].activity_level == "low"
    # mode tie-break: Mobile/desktop/tablet all once → count DESC then
    # value ASC, and uppercase sorts before lowercase → exactly "Mobile"
    assert us["u1"].preferred_device == "Mobile"

    ps = {r.product_id: r for r in product_summary(silver).collect()}
    assert ps["p1"].unique_viewers == 1 and ps["p1"].total_interactions == 3
    assert ps["p1"].category == "books"
    assert ps["p1"].popularity_tier == "medium"  # <4 distinct scores → fallback

    ds = {str(r.event_date): r for r in daily_stats(silver).collect()}
    assert ds["2025-09-05"].total_events == 2
    assert ds["2025-09-05"].mobile_events == 1
    assert ds["2025-09-05"].mobile_pct == 50.0

    em = {r.event_type: r for r in engagement_metrics(silver).collect()}
    assert em["view"].total_events == 1 and em["view"].event_pct == 25.0


def test_micro_fixture_schema_drift(spark):
    """FIXTURES.md §5: the reference's own 4-record seed uses item_id/url
    and integer user ids — a schema-drift generation. The cleaning is
    null-safe: rows lacking product_id are dropped, not errored
    (reference guards with `if col in df.columns`, F8)."""
    lines = [
        {"user_id": 1, "event_type": "page_view", "item_id": "A",
         "timestamp": "2025-09-05T12:00:00Z", "url": "/home"},
        {"user_id": 1, "event_type": "click", "item_id": "A",
         "timestamp": "2025-09-05T12:00:10Z", "url": "/product/A"},
        {"user_id": 2, "event_type": "page_view", "item_id": "B",
         "timestamp": "2025-09-05T12:01:00Z", "url": "/home"},
        {"user_id": 1, "event_type": "purchase", "item_id": "A",
         "timestamp": "2025-09-05T12:02:00Z", "url": "/checkout"},
    ]
    tmp = tempfile.mkdtemp(prefix="bdrs_micro_")
    try:
        with open(os.path.join(tmp, "seed.json"), "w") as f:
            for rec in lines:
                f.write(json.dumps(rec) + "\n")
        raw, bad = split_corrupt(read_bronze(spark, "clickstream", tmp))
        assert bad.count() == 0
        assert raw.count() == 4  # drift fields ignored, rows parse fine
        assert clean_clickstream(raw).count() == 0  # no product_id → all drop
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compaction_bounds_files(spark, bronze_dir):
    """compact_silver rewrites the small-file mess (the reference had
    1,274 ten-record files) to one file per date partition."""
    import glob

    from big_data_recommendation_system_spark.sources.bronze import (
        read_bronze,
        split_corrupt,
    )
    from big_data_recommendation_system_spark.sources.sinks import (
        compact_silver,
        write_silver,
    )

    raw, _ = split_corrupt(
        read_bronze(spark, "clickstream", os.path.join(bronze_dir, "clickstream"))
    )
    silver = clean_clickstream(raw)
    out = tempfile.mkdtemp(prefix="bdrs_compact_") + "/t"
    try:
        # simulate many small appends
        for _ in range(4):
            write_silver(silver, out, files_per_partition=2)
        before = spark.read.parquet(out)
        n_rows, n_files = before.count(), len(glob.glob(f"{out}/date=*/*.parquet"))
        assert n_files >= 8
        compact_silver(spark, out, files_per_partition=1)
        after = spark.read.parquet(out)
        assert after.count() == n_rows
        dates = len(glob.glob(f"{out}/date=*"))
        assert len(glob.glob(f"{out}/date=*/*.parquet")) == dates
    finally:
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
