"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship churn-feature query on sf0.001 as a smoke
check; ``queries()`` / ``oracle_sql()`` expose every registered operator from
``pyspark_retention_pipeline_spark`` (SURVEY.md §2 inventory + extension tier)
for the driver's DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark_retention_pipeline_spark import all_oracle_sql, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark_retention_pipeline_spark.operators.retention import churn_feature_frame

    return churn_feature_frame(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query (rows-only ops omitted)."""
    return all_oracle_sql()
