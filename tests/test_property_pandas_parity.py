"""Property-based tests (hypothesis): the pandas-parity helpers must agree
with REAL pandas semantics on randomized inputs — the strongest check for
the SURVEY §7.3 semantic traps (bin closure, Monday-0 dayofweek,
keep-latest)."""

from datetime import datetime, timedelta

import pandas as pd
import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_recommendation_system_spark.functions.pandas_parity import (
    cut_right_closed,
    dayofweek_monday0,
    event_weight,
)

BINS = [0, 50, 200, 500, 1000, float("inf")]
LABELS = ["budget", "low", "mid", "high", "premium"]

_SETTINGS = dict(
    max_examples=12,  # each example is a Spark job — keep the count sane
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.floats(min_value=-10, max_value=1500, allow_nan=False),
            st.sampled_from([0.0, 50.0, 200.0, 500.0, 1000.0, 50.0000001]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_cut_matches_pandas(spark, values):
    expected = [
        None if pd.isna(v) else v
        for v in pd.cut(pd.Series(values), bins=BINS, labels=LABELS).astype(object)
    ]
    got = [
        r.tier
        for r in spark.createDataFrame([(float(v),) for v in values], ["x"])
        .select(cut_right_closed(F.col("x"), BINS, LABELS).alias("tier"))
        .collect()
    ]
    assert got == expected


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=0, max_value=5000),  # days offset from epoch-ish
        min_size=1,
        max_size=30,
    )
)
def test_dayofweek_matches_pandas(spark, day_offsets):
    base = datetime(2015, 1, 1)
    dates = [base + timedelta(days=d) for d in day_offsets]
    expected = pd.Series(pd.to_datetime(dates)).dt.dayofweek.tolist()
    got = [
        r.dow
        for r in spark.createDataFrame([(d,) for d in dates], ["ts"])
        .select(dayofweek_monday0(F.col("ts")).alias("dow"))
        .collect()
    ]
    assert got == expected


@settings(**_SETTINGS)
@given(
    st.lists(
        st.sampled_from(["view", "click", "purchase", "unknown_thing", "search"]),
        min_size=1,
        max_size=30,
    )
)
def test_event_weight_matches_pandas_map(spark, events):
    mapping = {"view": 1, "click": 2, "purchase": 10, "search": 3}
    expected = pd.Series(events).map(mapping).fillna(1).astype(int).tolist()
    got = [
        r.w
        for r in spark.createDataFrame([(e,) for e in events], ["e"])
        .select(event_weight(F.col("e"), mapping).alias("w"))
        .collect()
    ]
    assert got == expected
