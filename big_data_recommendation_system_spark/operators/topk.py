"""Top-k per group (SURVEY.md §2.6 O3 — the streaming processor's top-3
categories per user, kafka_streams_processor.py:130-131).

Implementation: pre-aggregate counts (map-side combined), then a
row_number window over the small aggregated frame. At scale this never
windows the raw fact table — only the (key, value) count pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.silver import silver_cte, silver_events


def topk_per_group(
    df: DataFrame, group: str, value: str, k: int, measure_alias: str = "cnt"
) -> DataFrame:
    """Top-k ``value``s per ``group`` by count, deterministic tie-break
    (count DESC, value ASC)."""
    counts = df.groupBy(group, value).agg(F.count(F.lit(1)).alias(measure_alias))
    w = Window.partitionBy(group).orderBy(F.desc(measure_alias), F.asc(value))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def top_event_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = silver_events(spark, sf_dir)
    return topk_per_group(silver, "user_id", "event_type", 3)


TOP_EVENT_TYPES_PER_USER_SQL = silver_cte("""
SELECT user_id, event_type, cnt, rank
FROM (
  SELECT user_id, event_type, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type ASC) AS rank
  FROM silver GROUP BY user_id, event_type
)
WHERE rank <= 3
""")
