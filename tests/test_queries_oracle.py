"""Runs EVERY registered query against its DuckDB oracle at the test SF —
the local mirror of the driver's CORRECTNESS gate."""

import pytest

from bigslice_spark.queries import ORACLE, QUERIES
from .oracle import assert_matches_duckdb


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLE:
        assert_matches_duckdb(df, duck, ORACLE[name])
    else:
        assert df.count() >= 0  # rows-only check, like the driver
