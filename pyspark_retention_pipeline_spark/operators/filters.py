"""Projection / filter / predicate operators (SURVEY.md §2.2, P1-P15).

Every filter here sits directly above a Parquet scan so Catalyst pushes the
predicate into the scan (``PushedFilters`` in the formatted plan) and prunes
columns via the trailing ``select`` — verified in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import CUTOFF, RECENT_START
from ..exprs import ts_lit
from ..registry import query
from ..tables import load_table


@query(
    "valid_lines",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 0
      AND l_extendedprice > 0
      AND l_discount BETWEEN 0 AND 1
      AND l_partkey IS NOT NULL
    """,
    tags=("P4",),
)
def valid_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive validity filter (reference ``pipeline/etl.py:35-39``: drop
    null customers, non-positive quantities/prices)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 0)
        & (F.col("l_extendedprice") > 0)
        & (F.col("l_discount") >= 0)
        & (F.col("l_discount") <= 1)
        & F.col("l_partkey").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")


@query(
    "recent_window",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderdate > TIMESTAMP '{RECENT_START}'
      AND o_orderdate <= TIMESTAMP '{CUTOFF}'
    """,
    tags=("P5",),
)
def recent_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal range filter — the (cutoff-90d, cutoff] activity window
    (reference ``pipeline/etl.py:87-89``)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") > ts_lit(RECENT_START)) & (F.col("o_orderdate") <= ts_lit(CUTOFF))
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")


@query(
    "not_cancelled",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority NOT LIKE '1%'
    """,
    tags=("P10",),
)
def not_cancelled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-prefix exclusion predicate (reference notebook drops invoices
    with a ``'C'`` prefix; here: drop priority-1 orders)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(~F.col("o_orderpriority").startswith("1")).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )


@query(
    "segment_case",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS segment
    FROM customer
    """,
    tags=("P9",),
)
def segment_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested conditional segmentation as a ``when/otherwise`` chain — the
    Spark-side re-expression of the reference notebook's row-apply
    ``segment_row`` (pandas), kept as built-in expressions so it stays inside
    whole-stage codegen (no UDF)."""
    c = load_table(spark, sf_dir, "customer")
    seg = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return c.select("c_custkey", seg.alias("segment"))


@query(
    "threshold_pred",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey % 100 AS DOUBLE) / CAST(100 AS DOUBLE) AS score,
           CAST((CAST(o_orderkey % 100 AS DOUBLE) / CAST(100 AS DOUBLE))
                >= CAST(0.46 AS DOUBLE) AS DOUBLE) AS pred
    FROM orders
    """,
    tags=("P15",),
)
def threshold_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold predicate over a score column, cast back to double
    (reference ``pipeline/train.py:82``). The score is a deterministic
    key-derived pseudo-probability so the oracle can reproduce it exactly."""
    o = load_table(spark, sf_dir, "orders")
    score = (F.col("o_orderkey") % 100).cast("double") / F.lit(100.0)
    return o.select(
        "o_orderkey",
        score.alias("score"),
        (score >= F.lit(0.46)).cast("double").alias("pred"),
    )


@query(
    "sql_expr_filter",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000
    """,
    tags=("P11",),
)
def sql_expr_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-string predicate (reference ``pipeline/eval.py:74-77`` filters with
    raw SQL expression strings)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter("o_orderstatus = 'F' AND o_totalprice > 100000").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "cast_projection",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS okey_str,
           strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_linenumber = 1
    """,
    tags=("P1", "P2", "P3", "P12"),
)
def cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename/cast/computed-column projection (reference
    ``pipeline/etl.py:18-29,39``: header renames, typecasts, Amount column)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linenumber") == 1)
        .withColumn("qty_int", F.col("l_quantity").cast("long"))
        .withColumn("okey_str", F.col("l_orderkey").cast("string"))
        .withColumn("ship_date", F.date_format(F.col("l_shipdate"), "yyyy-MM-dd"))
        .withColumn("revenue", F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
        .select("l_orderkey", "qty_int", "okey_str", "ship_date", "revenue")
    )


@query(
    "cohort_filter",
    oracle=f"""
    WITH hist AS (
      SELECT o_custkey AS custkey,
             COUNT(*) AS total_orders,
             CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                            DATE '2000-01-01') AS BIGINT) AS recency_days
      FROM orders WHERE o_orderdate <= TIMESTAMP '{CUTOFF}'
      GROUP BY o_custkey
    )
    SELECT custkey, total_orders, recency_days
    FROM hist
    WHERE total_orders >= 2 OR recency_days <= 180
    """,
    tags=("P6",),
)
def cohort_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive cohort filter over aggregated features (reference
    ``pipeline/etl.py:127``: keep repeat customers OR recently-active ones)."""
    o = load_table(spark, sf_dir, "orders")
    hist = (
        o.filter(F.col("o_orderdate") <= ts_lit(CUTOFF))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("total_orders"),
            F.datediff(F.lit("2000-01-01").cast("date"), F.to_date(F.max("o_orderdate")))
            .cast("long")
            .alias("recency_days"),
        )
    )
    return hist.filter((F.col("total_orders") >= 2) | (F.col("recency_days") <= 180))
