"""Helpers that read the formatted physical plan so tests can assert the
scale-critical properties — filter pushdown, column pruning, broadcast joins —
instead of hoping for them (the per-operator discipline mandated by the build
brief: ``.explain("formatted")`` and iterate until it's the plan you want).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists appearing in the plan's scan nodes."""
    plan = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — for asserting column pruning."""
    plan = explain_str(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return [
        [part.split(":")[0].strip() for part in s.split(",") if part.strip()] for s in schemas
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the physical plan (lower is better; AQE may
    remove some at runtime)."""
    return explain_str(df).count("Exchange hashpartitioning") + explain_str(df).count(
        "Exchange rangepartitioning"
    )
