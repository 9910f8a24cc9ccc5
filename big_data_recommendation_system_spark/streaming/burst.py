"""Streaming burst detection — the stateful-streaming form of
``plans/timeseries.py::daily_burst_detection``.

Custom ``applyInPandasWithState`` operator keyed on event_type: state is
the per-day count map observed so far; each micro-batch folds its events
in and re-emits the burst score for every day it touched, scored against
the (up to) 7 nearest PRIOR observed days currently known. When input
arrives in event-time order (the ordered-replay test harness; a
watermarked production stream after late-data settling), the LAST
emission per day is scored against complete prior days and equals the
batch operator's row exactly — the e2e test pins that equality through
``plans/timeseries.py::burst_scores``.

Scale shape: state per key is two parallel arrays bounded by the
calendar (|days| entries — metadata, not data); each batch shuffles only
(event_type, day) partial counts after Spark's map-side combine of the
groupBy key. Z-scores use the same exact integer arithmetic as the batch
operator, so emissions are bit-deterministic.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans.timeseries import BURST_MIN_TRAIL, BURST_TRAIL_DAYS, BURST_Z

_BURST_STATE_SCHEMA = StructType(
    [
        StructField("days", ArrayType(IntegerType())),
        StructField("counts", ArrayType(LongType())),
    ]
)

BURST_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day", DateType()),
        StructField("n_events", LongType()),
        StructField("trail_days", LongType()),
        StructField("trail_sum", LongType()),
        StructField("burst_z", DoubleType()),
        StructField("is_burst", BooleanType()),
    ]
)


def _score(counts: dict[int, int], ordinal: int):
    """Exact-integer z for one day against its ≤7 prior observed days —
    the same (k·x − Σx)/√(k·Σx² − (Σx)²) the batch window computes."""
    prior = sorted(d for d in counts if d < ordinal)[-BURST_TRAIL_DAYS:]
    k = len(prior)
    x = counts[ordinal]
    sx = sum(counts[d] for d in prior)
    sxx = sum(counts[d] * counts[d] for d in prior)
    var_num = k * sxx - sx * sx
    if k >= BURST_MIN_TRAIL and var_num > 0:
        z = float(k * x - sx) / math.sqrt(float(var_num))
        return k, sx, z, z >= BURST_Z
    return k, sx, None, None


def _burst_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        days, counts_arr = state.get
        counts = dict(zip(days, counts_arr))
    else:
        counts = {}
    touched: Counter[int] = Counter()
    for pdf in pdfs:
        if not len(pdf):
            continue
        for d, c in pdf["ts"].dt.date.value_counts().items():
            touched[d.toordinal()] += int(c)
    for o, c in touched.items():
        counts[o] = counts.get(o, 0) + c
    ordered = sorted(counts)
    state.update((ordered, [counts[o] for o in ordered]))
    rows = []
    import datetime

    for o in sorted(touched):
        k, sx, z, flag = _score(counts, o)
        rows.append(
            (
                event_type,
                datetime.date.fromordinal(o),
                counts[o],
                k,
                sx,
                z,
                flag,
            )
        )
    if rows:
        yield pd.DataFrame(
            rows,
            columns=[
                "event_type",
                "day",
                "n_events",
                "trail_days",
                "trail_sum",
                "burst_z",
                "is_burst",
            ],
        )


def streaming_burst_flags(events: DataFrame) -> DataFrame:
    """Per-micro-batch burst emissions over a (ts, event_type, ...)
    stream; see module docstring for semantics and the ordered-replay
    equivalence contract."""
    return (
        events.select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            _burst_group,
            outputStructType=BURST_OUTPUT_SCHEMA,
            stateStructType=_BURST_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
