"""Generic session-substrate plumbing shared by the text-dedup and
embedding substrate registries (operators/text_dedup.py,
operators/emb_substrate.py): frames built once per (session, corpus),
persisted, and re-persisted if an external ``clearCache()`` evicted
them. Import-neutral (no operator modules) so substrate modules never
form import cycles."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def substrate_key(spark: SparkSession, sf_dir: str, what: str) -> tuple:
    return (spark.sparkContext.applicationId, os.path.abspath(sf_dir), what)


def materialized(df: DataFrame) -> DataFrame:
    """Persist + materialize; re-persists if an external clearCache()
    evicted a previously-registered frame (storageLevel goes to NONE)."""
    if not (df.storageLevel.useMemory or df.storageLevel.useDisk):
        df = df.persist()
        df.count()
    return df
