"""Generic session-substrate plumbing shared by the text-dedup and
embedding substrate registries (operators/text_dedup.py,
operators/emb_substrate.py): frames built once per (session, corpus),
persisted, and re-persisted if an external ``clearCache()`` evicted
them. Import-neutral (no operator modules) so substrate modules never
form import cycles."""

from __future__ import annotations

import os
from typing import Callable

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


_FRAMES: dict[tuple, DataFrame] = {}


def session_frame(
    spark: SparkSession, sf_dir: str, what: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Build-once-per-(session, corpus) registration: returns the
    persisted frame, constructing it on first use and re-persisting it
    if an external clearCache() evicted a previous registration.
    Namespace ``what`` per family ('emb:…', 'bpe:…', …) so families
    can't collide."""
    key = substrate_key(spark, sf_dir, what)
    df = _FRAMES.get(key)
    if df is None:
        df = build()
    _FRAMES[key] = df = materialized(df)
    return df
