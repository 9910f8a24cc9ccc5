"""Scalar helpers reproducing the reference's pandas semantics in native
Spark expressions (SURVEY.md §2.4, §7.3 "genuinely hard parts").

Everything here is a Column expression — JVM-side, codegen-friendly,
zero Python UDFs. Each helper documents the pandas semantic trap it
guards against and cites the reference behavior it reproduces.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def cut_right_closed(col: Column, bins: Sequence[float], labels: Sequence[str]) -> Column:
    """``pd.cut(col, bins, labels)`` parity: intervals are right-closed
    ``(lo, hi]`` and values outside all bins map to null.

    Reference: main_pipeline.py:241-247 price tiers — a price of exactly
    50.0 must land in `budget`, which Spark's left-closed ``Bucketizer``
    gets wrong; hence chained ``when`` on `<=`.
    """
    if len(labels) != len(bins) - 1:
        raise ValueError("need len(labels) == len(bins) - 1")
    expr = F.lit(None).cast("string")
    # Build from the last bin backwards so earlier bins take precedence.
    for lo, hi, label in reversed(list(zip(bins[:-1], bins[1:], labels))):
        cond = col <= F.lit(hi) if hi != float("inf") else F.lit(True)
        expr = F.when((col > F.lit(lo)) & cond, F.lit(label)).otherwise(expr)
    return expr


def dayofweek_monday0(ts: Column) -> Column:
    """pandas ``dt.dayofweek`` parity: Monday=0 … Sunday=6.

    Spark's ``dayofweek`` is Sunday=1 … Saturday=7
    (reference trap: clisckstream_transformer.py:54 uses Monday=0 ints
    while main_pipeline.py:226 uses day names).
    """
    return (F.dayofweek(ts) + F.lit(5)) % F.lit(7)


def is_weekend(ts: Column) -> Column:
    """Saturday/Sunday flag (main_pipeline.py:227: dayofweek in [5, 6])."""
    return F.dayofweek(ts).isin(1, 7)


def map_lookup(col: Column, mapping: Mapping[str, float], default) -> Column:
    """``series.map(mapping).fillna(default)`` as a chained CASE WHEN.

    Used for event-weight maps (main_pipeline.py:230-235). A chained
    ``when`` keeps the expression inside whole-stage codegen; a
    ``create_map`` literal would also work but optimizes worse for
    small maps.
    """
    expr = F.lit(default)
    for key, value in sorted(mapping.items(), reverse=True):
        expr = F.when(col == F.lit(key), F.lit(value)).otherwise(expr)
    return expr


def event_weight(event_type: Column, weights: Mapping[str, int], default: int = 1) -> Column:
    return map_lookup(event_type, weights, default)


# --- deterministic float aggregation ---------------------------------------
# Double sums are order-dependent; across a shuffle the partial-aggregation
# order is nondeterministic, which breaks hash-equality against any oracle
# AND breaks run-to-run reproducibility at scale. Summing as decimal is
# exact and order-independent; we cast back to double for a stable schema.

_DEC = "decimal(38,6)"


def decimal_sum(col: Column) -> Column:
    """Order-independent sum of a double column (exact decimal internally)."""
    return F.sum(col.cast(_DEC)).cast("double")


def decimal_avg(col: Column) -> Column:
    """Order-independent mean: exact decimal sum, then one double division."""
    return F.sum(col.cast(_DEC)).cast("double") / F.count(col)


def round2_neutral(col: Column) -> Column:
    """Engine-neutral 2-decimal round-half-up on doubles:
    ``floor(x*100 + 0.5) / 100``.

    ``F.round(x, 2)`` re-reads the double through BigDecimal's shortest
    string form while DuckDB multiplies and rounds the raw double — the
    two disagree when x*100 sits on a .5 boundary (observed: 68.615 →
    Spark 68.62, DuckDB 68.61). This formula is plain IEEE arithmetic, so
    any engine given the same double produces the same rounded value.
    """
    return F.floor(col * 100 + F.lit(0.5)) / 100


def round1_neutral(col: Column) -> Column:
    """Engine-neutral 1-decimal round-half-up: ``floor(x*10 + 0.5) / 10``.

    The reference rounds ``mobile_pct``/``event_pct`` to ONE decimal
    (gold_pipeline.py:307,333 ``.round(1)``); this is the same
    boundary-stable formulation as :func:`round2_neutral` at that
    precision.
    """
    return F.floor(col * 10 + F.lit(0.5)) / 10
