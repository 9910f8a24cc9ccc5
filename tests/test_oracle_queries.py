"""Every registered query with an oracle must hash-match DuckDB at sf0.01 —
this mirrors the driver's t2 correctness gate exactly."""

import pytest

from big_data_recommendation_system_spark.registry import ORACLES, QUERIES

from .oracle import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_all_queries_run_small(spark, sf_dir_small):
    """Every query (oracle or not) must at least execute at sf0.001."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir_small)
        assert df.count() >= 0, name
