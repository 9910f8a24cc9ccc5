"""Generic session-substrate plumbing shared by the text-dedup and
embedding substrate registries (operators/text_dedup.py,
operators/emb_substrate.py): frames built once per (session, corpus),
persisted, and re-persisted if an external ``clearCache()`` evicted
them. Import-neutral (no operator modules) so substrate modules never
form import cycles.

CONSUMER CONTRACT (r12 ADVICE): the session runs with
``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true``, so
frames returned by :func:`session_frame` have AQE-MUTABLE partitioning —
partition counts, partition ids (``spark_partition_id``) and collect
order over a substrate can differ run-to-run. Consumers must not depend
on any of them: key every downstream shuffle explicitly, and where a
stable ordering is needed materialize it with an explicit
``repartitionByRange`` + checkpoint (the ranking operators' pattern) —
never by trusting the cached frame's layout."""

from __future__ import annotations

import os
import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def substrate_key(spark: SparkSession, sf_dir: str, what: str) -> tuple:
    return (spark.sparkContext.applicationId, os.path.abspath(sf_dir), what)


def materialized(df: DataFrame) -> DataFrame:
    """Persist + materialize; re-persists if an external clearCache()
    evicted a previously-registered frame (storageLevel goes to NONE).
    Materialization is a noop-sink write, not count(): count() lets
    Catalyst plan an aggregate over the InMemoryRelation and, more
    importantly, states the intent wrong — the substrate is persisted
    column-for-column, which the noop write expresses exactly (the same
    rationale as bench.py's full-materialization harness)."""
    if not (df.storageLevel.useMemory or df.storageLevel.useDisk):
        df = df.persist()
        df.write.format("noop").mode("overwrite").save()
    return df


def scoped_materialized(df: DataFrame) -> DataFrame:
    """Materialize a PER-CALL intermediate that feeds several branches of
    one returned plan, without registering it in the CacheManager: eager
    localCheckpoint. The blocks are GC-reclaimed by the ContextCleaner
    once the caller drops the frame — no unpersist bookkeeping, so
    repeated library calls cannot accumulate persisted frames (the
    r7/r8-ADVICE leak class that a bare ``.cache()`` creates).

    Trade-offs (same as operators/ranking.py's ranged-frame default):
    blocks are non-replicated, so an executor loss FAILS the job
    (callers retry) and it is unsafe with dynamic allocation; eager
    materialization runs a Spark job at plan-construction time. Use
    :func:`session_frame` instead when the frame is deterministic per
    (session, corpus) and reused ACROSS queries."""
    return df.localCheckpoint(eager=True)


# Registry of persisted substrate frames, keyed by
# (applicationId, corpus dir, name). Entries belonging to STOPPED
# sessions are dropped on every registration (their applicationId no
# longer matches any live session's), so a long-lived driver that
# cycles SparkSessions doesn't pin dead DataFrame/session references
# for the process lifetime (r8 ADVICE). The lock makes first-build
# registration race-free: without it two concurrent first calls could
# each build and persist the frame.
_FRAMES: dict[tuple, DataFrame] = {}
# RLock: builders routinely register their own upstream substrates
# (emb_dims' build calls emb_table), so registration must be reentrant
# on the owning thread.
_LOCK = threading.RLock()


def _evict_stale(app_id: str) -> None:
    for key in [k for k in _FRAMES if k[0] != app_id]:
        del _FRAMES[key]


_OBJECTS: dict[tuple, object] = {}


def session_object(
    spark: SparkSession, sf_dir: str, what: str, build: Callable[[], object]
) -> object:
    """Like :func:`session_frame` but for non-DataFrame artifacts (e.g.
    a fitted MLlib model): built once per (session, corpus), evicted
    with dead sessions, no materialization step (the object owns its
    own resources). The production analogue: a model is trained once
    per corpus snapshot and SERVED by every downstream query, not
    re-fit per report."""
    key = substrate_key(spark, sf_dir, what)
    with _LOCK:
        for k in [k for k in _OBJECTS if k[0] != key[0]]:
            del _OBJECTS[k]
        obj = _OBJECTS.get(key)
        if obj is None:
            _OBJECTS[key] = obj = build()
    return obj


def session_frame(
    spark: SparkSession, sf_dir: str, what: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Build-once-per-(session, corpus) registration: returns the
    persisted frame, constructing it on first use and re-persisting it
    if an external clearCache() evicted a previous registration.
    Namespace ``what`` per family ('emb:…', 'bpe:…', …) so families
    can't collide."""
    key = substrate_key(spark, sf_dir, what)
    with _LOCK:
        _evict_stale(key[0])
        df = _FRAMES.get(key)
        if df is None:
            df = build()
        _FRAMES[key] = df = materialized(df)
    return df
