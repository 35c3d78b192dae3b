"""Sampling operators — a first-class need for training-data pipelines
(held-out splits, corpus down-sampling, per-class balancing) that the
reference only touches via ``randomSplit`` (etl.py:148).

`hash_sample` is the deterministic, engine- and run-stable form: membership
is a pure function of the key, so re-runs, retries, and different
partitionings select the identical sample — the property that matters when a
100 TB job restarts. ``stratified_sample`` wraps Spark's seeded Bernoulli
``sampleBy`` for per-stratum rates (seed-stable within Spark, but
implementation-defined — rows-only check, SURVEY §7 randomSplit note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


def hash_sample_frame(df: DataFrame, key, rate_pct: int) -> DataFrame:
    """Keep rows whose md5(key) bucket (mod 100) < rate_pct — deterministic
    across engines, runs, and partitionings."""
    bucket = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    return df.filter(bucket < rate_pct)


@query(
    "hash_sample",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
    """,
    tags=("sampling", "deterministic"),
)
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% key-hash sample of orders."""
    o = load_table(spark, sf_dir, "orders")
    return hash_sample_frame(o, "o_orderkey", 10).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query("stratified_sample", tags=("sampling", "stratified"))
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded per-stratum Bernoulli sample: 50% of F-status orders, 10% of the
    rest (class rebalancing shape). Sampling is implementation-defined →
    rows-only check."""
    o = load_table(spark, sf_dir, "orders")
    return o.sampleBy(
        "o_orderstatus", fractions={"F": 0.5, "O": 0.1, "P": 0.1}, seed=42
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
