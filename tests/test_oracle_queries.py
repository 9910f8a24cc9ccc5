"""Every registered query with an oracle must hash-match DuckDB at sf0.01 —
this mirrors the driver's t2 correctness gate exactly.

The parametrized gate (165+ serialized Spark-vs-DuckDB comparisons) is
most of the suite's wall-clock, so it carries the ``oracle`` marker: a
plain ``pytest tests/`` still runs everything (the CI/driver path is
unchanged), while the inner-loop fast path is ``pytest -m "not oracle"``.
To re-check just the queries a change touched, set
``SPARK_GRAFT_ORACLE_ONLY=name1,name2`` — the other parametrizations
skip with an explicit reason (never silently pass).
"""

import os

import pytest

from big_data_recommendation_system_spark.registry import ORACLES, QUERIES

from .oracle import compare

_ONLY = {
    n for n in os.environ.get("SPARK_GRAFT_ORACLE_ONLY", "").split(",") if n
}

# Process-level sharding for the serialized oracle gate (pytest-xdist is
# not available in this environment): SPARK_GRAFT_ORACLE_SHARD="i/N"
# keeps only every N-th parametrization (by sorted position, offset i),
# so N shells running `SPARK_GRAFT_ORACLE_SHARD=$i/N pytest -m oracle`
# cover the gate with disjoint, deterministic slices. The driver/CI path
# (no env var) is unchanged — everything runs in one process.
_SHARD = os.environ.get("SPARK_GRAFT_ORACLE_SHARD", "")


def _in_shard(name: str) -> bool:
    if not _SHARD:
        return True
    idx, n = (int(x) for x in _SHARD.split("/"))
    return sorted(ORACLES).index(name) % n == idx


@pytest.mark.oracle
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    if _ONLY and name not in _ONLY:
        pytest.skip(f"SPARK_GRAFT_ORACLE_ONLY set; {name} not in it")
    if not _in_shard(name):
        pytest.skip(f"SPARK_GRAFT_ORACLE_SHARD={_SHARD}; not this shard")
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


@pytest.mark.oracle
def test_all_queries_run_small(spark, sf_dir_small):
    """Every query (oracle or not) must at least execute at sf0.001."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir_small)
        assert df.count() >= 0, name


@pytest.mark.oracle
def test_oracled_query_schemas_are_scalar_only(spark, sf_dir_small):
    # oracle-marked as of r13: constructing all 195 query frames runs
    # the eager ranker/CC jobs (~4 min) — gate-support work that belongs
    # with the gate, not in the driver's default budget
    """No oracled query may emit a top-level array/struct/map column.

    The driver's correctness harness canonicalizes result rows with a
    pandas sort over every column; list-valued cells raise
    `TypeError: unhashable type: 'list'` and the query records an `err`
    instead of a hash row (this killed embedding_quantize in round 4).
    Serialize nested values (concat_ws / array_join on the Spark side,
    array_to_string / string_agg in the DuckDB twin) before registering.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name in sorted(ORACLES):
        schema = QUERIES[name](spark, sf_dir_small).schema
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert not offenders, offenders
