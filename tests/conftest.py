from __future__ import annotations

import os

import pytest

from pyspark_retention_pipeline_spark.session import get_spark

# Small scale factor by default for fast tests; parity at sf0.01 is run via
# SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 (mirrors the driver gate).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pyspark_retention_pipeline_spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
