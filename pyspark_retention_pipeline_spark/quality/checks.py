"""Declarative data-quality checks over DataFrames.

Ingesting 100 TB without validation is how silent corruption propagates; this
is the minimal deequ-shaped layer: each check compiles to ONE aggregation (or
one anti-join for referential integrity) returning a violation count — no
collects, no row materialization. ``run_checks`` fuses all single-table
checks into a single pass over the data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    name: str
    passed: bool
    violations: int
    total: int


def _agg_check(df: DataFrame, name: str, violation_cond: Column) -> CheckResult:
    row = df.agg(
        F.count("*").alias("total"),
        F.sum(F.when(violation_cond, 1).otherwise(0)).alias("bad"),
    ).collect()[0]
    bad = int(row["bad"] or 0)
    return CheckResult(name, bad == 0, bad, int(row["total"]))


def check_complete(df: DataFrame, col: str) -> CheckResult:
    """No NULLs in ``col``."""
    return _agg_check(df, f"complete({col})", F.col(col).isNull())


def check_range(df: DataFrame, col: str, lo=None, hi=None) -> CheckResult:
    """All values of ``col`` within [lo, hi] (bounds optional, NULLs fail)."""
    cond = F.col(col).isNull()
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return _agg_check(df, f"range({col})", cond)


def check_accepted_values(df: DataFrame, col: str, values: list) -> CheckResult:
    """``col`` only takes values from the accepted list."""
    return _agg_check(
        df, f"accepted({col})", ~F.col(col).isin(values) | F.col(col).isNull()
    )


def check_unique(df: DataFrame, cols: list[str]) -> CheckResult:
    """(cols) form a unique key — one aggregation over the key grain.

    Row-grain semantics, consistent with every other check: ``total`` is the
    row count of the checked frame and ``violations`` the number of SURPLUS
    rows (n-1 per duplicated key group), so violations/total is a comparable
    violation rate across checks."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum("n").alias("total"),
            F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0)).alias("bad"),
        )
        .collect()[0]
    )
    bad = int(dup["bad"] or 0)
    return CheckResult(f"unique({','.join(cols)})", bad == 0, bad, int(dup["total"] or 0))


def check_referential(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> CheckResult:
    """Every fact key exists in the dimension (anti-join violation count; the
    dimension side reduces to distinct keys and broadcasts when small)."""
    dim_keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    bad = fact.select(fact_key).join(dim_keys, fact_key, "left_anti").count()
    total = fact.count()
    return CheckResult(f"referential({fact_key}->{dim_key})", bad == 0, bad, total)


def run_checks(df: DataFrame, checks: list[tuple[str, Column]]) -> list[CheckResult]:
    """Fused check runner: every (name, violation_condition) pair evaluates in
    ONE aggregation pass over ``df``."""
    aggs = [F.count("*").alias("__total")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"__c{i}")
        for i, (_, cond) in enumerate(checks)
    ]
    row = df.agg(*aggs).collect()[0]
    total = int(row["__total"])
    return [
        CheckResult(name, int(row[f"__c{i}"] or 0) == 0, int(row[f"__c{i}"] or 0), total)
        for i, (name, _) in enumerate(checks)
    ]
