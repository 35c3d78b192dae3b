"""Physical-plan hygiene — assert the scale-critical properties instead of
hoping for them: filter pushdown into scans, column pruning, broadcast joins
for dimensions (the 100 TB discipline from SURVEY.md §7)."""

from __future__ import annotations

from pyspark_retention_pipeline_spark.plans import (
    has_broadcast_join,
    pushed_filters,
    scan_columns,
)
from pyspark_retention_pipeline_spark.registry import all_queries

QUERIES = all_queries()


def test_valid_lines_pushdown(spark, sf_dir):
    df = QUERIES["valid_lines"](spark, sf_dir)
    filters = " ".join(pushed_filters(df))
    assert "l_quantity" in filters and "l_extendedprice" in filters, filters


def test_valid_lines_column_pruning(spark, sf_dir):
    df = QUERIES["valid_lines"](spark, sf_dir)
    cols = scan_columns(df)[0]
    # Only the filtered/selected columns should be read — not the full table.
    assert "l_returnflag" not in cols and "l_tax" not in cols, cols
    assert set(["l_orderkey", "l_partkey", "l_quantity"]).issubset(cols), cols


def test_recent_window_pushdown(spark, sf_dir):
    df = QUERIES["recent_window"](spark, sf_dir)
    filters = " ".join(pushed_filters(df))
    assert "o_orderdate" in filters, filters


def test_revenue_by_nation_broadcasts(spark, sf_dir):
    assert has_broadcast_join(QUERIES["revenue_by_nation"](spark, sf_dir))


def test_knn_broadcasts_queries(spark, sf_dir):
    assert has_broadcast_join(QUERIES["knn_bruteforce"](spark, sf_dir))


def test_customer_rfm_prunes_unused_columns(spark, sf_dir):
    df = QUERIES["customer_rfm"](spark, sf_dir)
    cols = scan_columns(df)[0]
    assert "o_orderpriority" not in cols and "o_orderstatus" not in cols, cols
