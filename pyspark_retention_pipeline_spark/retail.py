"""Online-Retail-shaped churn ETL — the reference's own input schema.

The registry queries prove the operator semantics on the driver's star-schema
testdata; this module proves a reference user can feed their actual data
(Invoice/StockCode/Quantity/InvoiceDate/UnitPrice/CustomerID transaction
lines, FIXTURES.md §1.1) through this engine and get the reference's exact
10-column feature table back. Reference parity map per step:

  * validity filter          — ``pipeline/etl.py:35-39``
  * Amount computed column   — ``etl.py:39``
  * order rollup             — ``etl.py:42-51`` (deterministic ``min`` instead
                               of the reference's order-dependent ``F.first``
                               for the invoice-constant CustomerID; SURVEY §7)
  * customer history agg     — ``etl.py:66-75`` fused with the recent-90d agg
                               (``etl.py:87-95``) via conditional aggregation
  * distinct products        — ``etl.py:78-82``
  * churn label join         — ``etl.py:53-61, 121-124``
  * null-fill + cohort filter— ``etl.py:106-127``
  * final projection         — ``etl.py:130-141``
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_COLUMNS = [
    "CustomerID",
    "total_orders",
    "total_qty",
    "avg_order_amount",
    "distinct_products",
    "recent90_orders",
    "recency_days",
    "total_amount_log",
    "recent90_amount_log",
    "label",
]


def clean_transactions(tx: DataFrame) -> DataFrame:
    """Validity filter + Amount column (etl.py:35-39): keep identified,
    positive-quantity, positive-price lines."""
    return tx.filter(
        F.col("CustomerID").isNotNull()
        & (F.col("Quantity") > 0)
        & (F.col("UnitPrice") > 0)
    ).withColumn("Amount", F.col("Quantity") * F.col("UnitPrice"))


def rollup_orders(lines: DataFrame) -> DataFrame:
    """Invoice-level rollup (etl.py:42-51)."""
    return lines.groupBy("Invoice").agg(
        F.max("InvoiceDate").alias("OrderDate"),
        F.min("CustomerID").alias("CustomerID"),
        F.sum("Amount").alias("OrderAmount"),
        F.sum("Quantity").alias("OrderQty"),
    )


def build_features_and_labels(
    tx: DataFrame,
    cutoff: datetime,
    lookahead_days: int = 180,
    recent_days: int = 90,
) -> DataFrame:
    """transactions → the reference's customer feature/label table.

    One fused customer aggregation (history + recent window), one distinct-
    product aggregation, one key-only lookahead set — two shuffles on
    CustomerID plus the order rollup, vs. the reference's four separate
    aggregation+join rounds.
    """
    lookahead_end = cutoff + timedelta(days=lookahead_days)
    recent_start = cutoff - timedelta(days=recent_days)

    lines = clean_transactions(tx)
    orders = rollup_orders(lines)

    hist_orders = orders.filter(F.col("OrderDate") <= F.lit(cutoff))
    in_recent = F.col("OrderDate") > F.lit(recent_start)

    cust = hist_orders.groupBy("CustomerID").agg(
        F.count("*").alias("total_orders"),
        F.sum("OrderQty").cast("double").alias("total_qty"),
        F.sum("OrderAmount").alias("total_amount"),
        F.avg("OrderAmount").alias("avg_order_amount"),
        F.datediff(F.lit(cutoff), F.to_date(F.max("OrderDate")))
        .cast("int")
        .alias("recency_days"),
        F.sum(F.when(in_recent, 1).otherwise(0)).cast("double").alias("recent90_orders"),
        F.sum(F.when(in_recent, F.col("OrderAmount")).otherwise(0.0)).alias(
            "recent90_amount"
        ),
    )

    hist_lines = lines.filter(F.col("InvoiceDate") <= F.lit(cutoff))
    prod = hist_lines.groupBy("CustomerID").agg(
        F.countDistinct("StockCode").cast("double").alias("distinct_products")
    )

    future_buyers = (
        orders.filter(
            (F.col("OrderDate") > F.lit(cutoff)) & (F.col("OrderDate") <= F.lit(lookahead_end))
        )
        .select("CustomerID")
        .distinct()
        .withColumn("has_future_purchase", F.lit(1))
    )

    feats = (
        cust.join(prod, "CustomerID", "left")
        .join(future_buyers, "CustomerID", "left")
        .select(
            "CustomerID",
            F.coalesce(F.col("total_orders").cast("double"), F.lit(0.0)).alias("total_orders"),
            F.coalesce("total_qty", F.lit(0.0)).alias("total_qty"),
            F.coalesce("avg_order_amount", F.lit(0.0)).alias("avg_order_amount"),
            F.coalesce("distinct_products", F.lit(0.0)).alias("distinct_products"),
            F.coalesce("recent90_orders", F.lit(0.0)).alias("recent90_orders"),
            F.col("recency_days").cast("double").alias("recency_days"),
            F.log1p(F.coalesce("total_amount", F.lit(0.0))).alias("total_amount_log"),
            F.log1p(F.coalesce("recent90_amount", F.lit(0.0))).alias("recent90_amount_log"),
            F.when(F.col("has_future_purchase").isNull(), 1.0).otherwise(0.0).alias("label"),
        )
        # cohort filter (etl.py:127): repeat customers OR recently active
        .filter((F.col("total_orders") >= 2) | (F.col("recency_days") <= 180))
    )
    return feats.select(*FEATURE_COLUMNS)
