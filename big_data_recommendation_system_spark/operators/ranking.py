"""Scalable exact global ranking — the scale path for every "ntile /
percent_rank over the whole frame" shape (qcut tiers, gold_pipeline.py
:252-260; value quartiles, product_features_transformer.py:64-65).

A plain ``Window.orderBy(...)`` with no partition funnels the entire frame
through ONE task (Spark logs ``WindowExec: No Partition Defined``) — fine
at test scale, a stall at 10^8+ rows. This module computes the identical
rank with no single-task stage:

1. ``repartitionByRange`` on the order key — a total order across ordered,
   non-overlapping partitions (the same machinery a global sort uses).
2. Local ``row_number`` per range partition (window IS partitioned).
3. Per-partition counts (≤ shuffle-partitions rows) turned into prefix
   offsets via a triangular self-join on that tiny frame — no
   unpartitioned window anywhere, so the metadata step can't become the
   bottleneck it was meant to remove.
4. ``global rank = local row_number + offset`` joined back via broadcast.

The result is bit-identical to ``row_number().over(Window.orderBy(...))``
(callers must pass a total order — include a unique tiebreak column), so
oracle SQL twins keep using the plain window form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RANK_COL = "_global_rank"
TOTAL_COL = "_global_n"

# How the ranged frame is materialized (it feeds BOTH the
# per-partition-count branch and the local-rank branch; unmaterialized,
# the upstream subtree executes once per branch AND repartitionByRange
# re-SAMPLES its bounds per execution, so the branches could disagree on
# _pid assignment). Selected via spark.conf "spark.bdrs.rank.materialize":
#
# - "localCheckpoint" (default): truncates lineage, blocks stored
#   NON-REPLICATED on executors and GC-reclaimed once the caller drops
#   the frame (no CacheManager registration to leak per call — the r7
#   ADVICE class). The trade (r8 ADVICE): an executor loss makes the
#   job FAIL (blocks are unrecoverable — callers must retry the query),
#   and it is unsafe with dynamic allocation (executors holding blocks
#   can be decommissioned). eager=True also means merely BUILDING a
#   plan executes the upstream subtree once.
# - "checkpoint": reliable checkpoint to spark.sparkContext's checkpoint
#   dir — survives executor loss; requires setCheckpointDir. The
#   hardening lever for deployments with executor churn / dynamic
#   allocation.
# - "persist": plain persist() — recomputable on executor loss, but the
#   CacheManager entry lives until an explicit unpersist, so long-lived
#   library sessions accumulate frames across calls.
_MATERIALIZE_CONF = "spark.bdrs.rank.materialize"


def _materialize_ranged(df: DataFrame) -> DataFrame:
    mode = "localCheckpoint"
    try:
        mode = df.sparkSession.conf.get(_MATERIALIZE_CONF, mode)
    except Exception:  # pragma: no cover - conf access never fails in practice
        pass
    if mode == "checkpoint":
        return df.checkpoint(eager=True)
    if mode == "persist":
        df = df.persist()
        df.count()
        return df
    return df.localCheckpoint(eager=True)


def with_global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach ``_global_rank`` (1-based, dense total-order row_number) and
    ``_global_n`` (total row count) without a single-partition window.

    ``order_cols`` must define a total order (unique tiebreak last) for the
    rank to be deterministic.
    """
    spark = df.sparkSession
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # Materialize ONCE — see _materialize_ranged for the mode trade-offs
    # (default localCheckpoint: no CacheManager leak, but an executor
    # loss FAILS the job and callers must retry; set
    # spark.bdrs.rank.materialize=checkpoint for executor-churn
    # deployments). Callers pass a narrow projection, so the
    # materialized footprint is small even at 10^9 rows.
    ranged = _materialize_ranged(
        df.repartitionByRange(parts, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # prefix-sum over ≤ `parts` rows: triangular self-join beats an
    # unpartitioned window (no WindowExec single-task stage, no warning)
    offsets = (
        counts.alias("a")
        .join(counts.alias("b"), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_opid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_offset"))
    )
    total = counts.agg(F.sum("_cnt").cast("long").alias(TOTAL_COL))
    local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.withColumn("_lrn", F.row_number().over(local))
        .join(F.broadcast(offsets), F.col("_pid") == F.col("_opid"))
        .crossJoin(F.broadcast(total))
        .withColumn(RANK_COL, (F.col("_offset") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_opid", "_offset", "_lrn")
    )


PREFIX_COL = "_prefix_sum"


def with_global_prefix_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach ``_prefix_sum`` — the EXCLUSIVE running total of
    ``value_col`` over the global order ``order_cols`` — without a
    single-partition window. Same machinery as :func:`with_global_rank`
    (range repartition → per-partition local cumsum → per-partition
    totals → triangular prefix offsets broadcast back), but summing a
    value instead of counting rows. Bit-identical to
    ``sum(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING)`` when ``order_cols`` is a total order and the values are
    integral (no float reorder drift).

    This is the scale path for sequence packing / chunk assignment: a
    plain ordered-window cumsum funnels 10^9 docs through one WindowExec
    task; this shape never materializes an unpartitioned window."""
    spark = df.sparkSession
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # materialized for the same reasons as with_global_rank: single
    # execution of the upstream subtree and a consistent sampled range
    # partitioning across both consumer branches (mode trade-offs in
    # _materialize_ranged)
    ranged = _materialize_ranged(
        df.repartitionByRange(parts, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    totals = ranged.groupBy("_pid").agg(
        F.sum(value_col).cast("long").alias("_psum")
    )
    offsets = (
        totals.alias("a")
        .join(totals.alias("b"), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_opid"))
        .agg(F.coalesce(F.sum("b._psum"), F.lit(0)).alias("_offset"))
    )
    local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.withColumn(
            "_lsum", F.coalesce(F.sum(value_col).over(local), F.lit(0))
        )
        .join(F.broadcast(offsets), F.col("_pid") == F.col("_opid"))
        .withColumn(
            PREFIX_COL, (F.col("_offset") + F.col("_lsum")).cast("long")
        )
        .drop("_pid", "_opid", "_offset", "_lsum")
    )


def ntile_from_rank(rank: Column, n_total: Column, n_buckets: int) -> Column:
    """SQL-standard NTILE from a global rank: the first ``n_total %
    n_buckets`` buckets hold ``ceil(n/b)`` rows, the rest ``floor(n/b)``.
    Matches ``F.ntile(b).over(Window.orderBy(...))`` and DuckDB NTILE
    exactly (all intermediates < 2^53, so double division is exact)."""
    b = F.lit(n_buckets)
    base = F.floor(n_total / b)
    rem = n_total % b
    big = base + 1
    cutoff = rem * big
    safe_base = F.greatest(base, F.lit(1))
    return F.when(rank <= cutoff, F.floor((rank + big - 1) / big)).otherwise(
        rem + F.floor((rank - cutoff + safe_base - 1) / safe_base)
    )


def percent_rank_from_rank(rank: Column, n_total: Column) -> Column:
    """SQL PERCENT_RANK from a global rank over a total order (no ties):
    (rank-1)/(n-1), 0.0 for a single-row frame."""
    return F.when(
        n_total > 1, (rank - F.lit(1)) / (n_total - F.lit(1))
    ).otherwise(F.lit(0.0))
