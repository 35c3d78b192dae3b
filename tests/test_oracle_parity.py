"""The gate: every oracle-backed query must hash-match DuckDB (mirrors the
driver's CORRECTNESS check, stricter — cell-level equality)."""

from __future__ import annotations

import pytest

from pyspark_retention_pipeline_spark.registry import all_oracle_sql, all_queries
from pyspark_retention_pipeline_spark.testing import compare_query, duckdb_connection

ORACLES = all_oracle_sql()
QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


# Two-tier parametrization (round-16 verdict item 1): the default tier
# keeps a deterministic 1-in-7 sample (~38 queries) as a fast parity
# canary so `pytest tests/` still exercises the gate end-to-end; the full
# 260-query mirror is the slow tier (`make test-gate` / `make test-all` /
# RUN_SLOW=1), which still runs per round. The sample is stride-based over
# the sorted names — stable across runs, no randomness.
_SORTED_ORACLES = sorted(ORACLES)
_FAST_SAMPLE = set(_SORTED_ORACLES[::7])


@pytest.mark.parametrize(
    "name",
    [
        n if n in _FAST_SAMPLE else pytest.param(n, marks=pytest.mark.slow)
        for n in _SORTED_ORACLES
    ],
)
def test_oracle_parity(name, spark, sf_dir, con):
    result = compare_query(name, QUERIES[name](spark, sf_dir), con, ORACLES[name])
    assert result.ok, f"{name}: {result.detail}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    """Rows-only ops (no SQL oracle) must still execute and return a stable
    schema with >= 0 rows."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name} returned no columns"
    assert df.count() >= 0
