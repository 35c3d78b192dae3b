"""Bucketed-table co-location — deleting the join shuffle by layout.

At 100 TB the orders ⋈ lineitem equi-join is the dominant shuffle; bucketing
both tables on the join key with the same bucket count lets Spark join
bucket-to-bucket with **no Exchange at all** (asserted in
tests/test_bucketing.py). This module materializes bucketed copies and
exposes the co-located join; the registry operators stay layout-agnostic —
on a bucketed warehouse they pick this up automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table


def bucket_fact_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8, prefix: str = "bkt"
) -> tuple[str, str]:
    """Write bucketed copies of orders (by o_orderkey) and lineitem (by
    l_orderkey) as managed tables; returns their names."""
    orders_tbl, lineitem_tbl = f"{prefix}_orders", f"{prefix}_lineitem"
    (
        load_table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(orders_tbl)
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(lineitem_tbl)
    )
    return orders_tbl, lineitem_tbl


def colocated_order_lines(
    spark: SparkSession, orders_tbl: str, lineitem_tbl: str
) -> DataFrame:
    """orders ⋈ lineitem on the bucket key — shuffle-free when both sides are
    bucketed identically. The merge hint pins a sort-merge join (at toy scale
    the planner would rather broadcast, which bypasses the bucketed scan; at
    100 TB neither side is broadcastable and SMJ-over-buckets is exactly the
    plan you want)."""
    o = spark.table(orders_tbl).hint("merge")
    li = spark.table(lineitem_tbl)
    return o.join(li, o.o_orderkey == li.l_orderkey)
