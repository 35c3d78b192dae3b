"""Data-quality check layer over the testdata tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_retention_pipeline_spark.quality import (
    check_accepted_values,
    check_complete,
    check_range,
    check_referential,
    check_unique,
    run_checks,
)
from pyspark_retention_pipeline_spark.tables import load_table


def test_testdata_invariants(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    assert check_unique(orders, ["o_orderkey"]).passed
    assert check_complete(orders, "o_custkey").passed
    assert check_range(orders, "o_totalprice", lo=0).passed
    assert check_accepted_values(orders, "o_orderstatus", ["F", "O", "P"]).passed
    assert check_referential(orders, "o_custkey", customer, "c_custkey").passed


def test_checks_catch_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -2.0), (2, None, 50.0)], "id long, s string, v double"
    )
    u = check_unique(df, ["id"])
    # Row-grain semantics: total = 3 rows, violations = 1 surplus row (the
    # second id=1), so violation rates are comparable across checks.
    assert not u.passed and u.violations == 1 and u.total == 3
    assert not check_complete(df, "s").passed
    r = check_range(df, "v", lo=0.0, hi=10.0)
    assert not r.passed and r.violations == 2  # -2.0 and 50.0
    a = check_accepted_values(df, "s", ["a"])
    assert not a.passed and a.violations == 2  # "b" and NULL


def test_run_checks_single_pass(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    results = run_checks(
        orders,
        [
            ("no_null_key", F.col("o_orderkey").isNull()),
            ("positive_price", F.col("o_totalprice") <= 0),
            ("known_status", ~F.col("o_orderstatus").isin("F", "O", "P")),
        ],
    )
    assert all(r.passed for r in results)
    assert len({r.total for r in results}) == 1  # one pass, one total
