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


def bucket_fingerprint_index(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8, table: str = "fp_index"
) -> str:
    """Materialize the historical corpus's DISTINCT content-fingerprint index
    as a table bucketed (and sorted) on fingerprint — the persisted layout
    the per-batch dedup joins against at 100 TB. Built once per corpus; each
    incremental batch then co-locates against it with no index-side shuffle
    (see :func:`incremental_dedup_against_index`)."""
    from pyspark.sql import functions as F

    from ..operators.curation import BATCH_MOD, BATCH_REM

    (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % BATCH_MOD != BATCH_REM)
        .select(F.md5("text").alias("fingerprint"))
        .distinct()
        .write.mode("overwrite")
        .bucketBy(n_buckets, "fingerprint")
        .sortBy("fingerprint")
        .saveAsTable(table)
    )
    return table


def incremental_dedup_against_index(
    spark: SparkSession, sf_dir: str, index_tbl: str
) -> DataFrame:
    """The bucketed-layout form of the ``incremental_dedup`` registry query:
    the new batch ANTI-joins the persisted fingerprint index. The index side
    reads bucket-aligned with NO Exchange — only the (days-sized) batch side
    shuffles to the bucket count — so the historical corpus is never
    re-shuffled, run after run. Plan-asserted in tests/test_bucketing.py."""
    from pyspark.sql import functions as F

    from ..operators.curation import BATCH_MOD, BATCH_REM

    batch = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % BATCH_MOD == BATCH_REM)
        .select("doc_id", F.md5("text").alias("fingerprint"))
    )
    idx = spark.table(index_tbl).hint("merge")
    return batch.join(idx, "fingerprint", "left_anti").select(
        "doc_id", "fingerprint"
    )
