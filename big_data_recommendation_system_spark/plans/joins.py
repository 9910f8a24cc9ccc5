"""Join-type coverage beyond the reference's executed surface: semi,
anti, and scalar-subquery joins (SURVEY.md §2.10 — the reference's only
anti-join is the file watcher's set difference, J5; its intended star
schema implies the rest).

Scale shapes:
- semi/anti joins keep only the left side's columns — Spark never
  materializes the right payload, and broadcasts it when small.
- the Q17-style scalar subquery is the classic per-group-average filter:
  pre-aggregate (tiny), broadcast it back against the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pandas_parity import decimal_sum
from ..sources.tables import load_table
from .silver import silver_cte, silver_events


def users_without_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (J5): engaged users who never purchased — the
    churn-risk/retargeting slice."""
    silver = silver_events(spark, sf_dir)
    purchasers = silver.filter(F.col("event_type") == "purchase").select("user_id")
    return (
        silver.join(purchasers, "user_id", "left_anti")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.sum("event_weight").alias("total_engagement"),
        )
    )


USERS_WITHOUT_PURCHASE_SQL = silver_cte("""
SELECT user_id, COUNT(*) AS total_events, CAST(SUM(event_weight) AS BIGINT) AS total_engagement
FROM silver
WHERE user_id NOT IN (SELECT user_id FROM silver WHERE event_type = 'purchase')
GROUP BY user_id
""")


def orders_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (TPC-H Q4 shape): order-priority counts over orders that
    have at least one returned lineitem."""
    orders = load_table(spark, sf_dir, "orders")
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


ORDERS_WITH_RETURNS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery join (TPC-H Q17 shape): revenue from lineitems
    whose quantity is below 50% of their part's average quantity. The
    per-part average is a pre-aggregation broadcast against the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
            / F.count("l_quantity")
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part_avg), li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            decimal_sum(F.col("l_extendedprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH part_avg AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price,
  COUNT(*) AS n_items
FROM lineitem JOIN part_avg ON l_partkey = pk
WHERE l_quantity < 0.5 * avg_qty
"""
