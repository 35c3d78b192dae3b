from __future__ import annotations

import os

import pytest

from pyspark_retention_pipeline_spark.session import get_spark

# Small scale factor by default for fast tests; parity at sf0.01 is run via
# SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 (mirrors the driver gate).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (round-16 verdict item 1): the default `pytest tests/`
    must complete inside the driver's timeout (the round-15 full suite grew
    to ~34 min and the driver's run was cut off with no verdict), so tests
    marked ``slow`` — the full oracle-parity mirror, the randomized
    multi-SF sweeps, the heavyweight end-to-end paths — are skipped unless
    opted in via RUN_SLOW=1 or an explicit `-m` expression naming the
    marker. The slow tier still runs per round via `make test-all` /
    `make test-gate`; nothing is lost, only re-tiered."""
    if os.environ.get("RUN_SLOW") == "1":
        return
    if "slow" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(
        reason="slow tier: opt in with RUN_SLOW=1 or -m slow (make test-all)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pyspark_retention_pipeline_spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
