"""Z-order layout measurably improves min/max pruning on the second
dimension: per-file value spans shrink vs. a linear single-column sort."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from pyspark_retention_pipeline_spark.sources.layout import write_zordered
from pyspark_retention_pipeline_spark.tables import load_table


def _avg_span(path_glob: str, column: str) -> float:
    spans = []
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.to_arrow_schema().get_field_index(column)
        lo = min(meta.row_group(i).column(idx).statistics.min for i in range(meta.num_row_groups))
        hi = max(meta.row_group(i).column(idx).statistics.max for i in range(meta.num_row_groups))
        spans.append(hi - lo)
    return sum(spans) / len(spans)


def test_zorder_tightens_second_dimension(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_orderkey", "l_quantity")

    linear = str(tmp_path / "linear")
    zorder = str(tmp_path / "zorder")
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(linear)
    )
    write_zordered(li, zorder, "l_partkey", "l_orderkey")

    # Same data either way.
    assert spark.read.parquet(zorder).count() == li.count()

    # Linear partkey sort: every file spans ~the whole orderkey range.
    # Z-order: files own 2-D rectangles -> orderkey spans shrink sharply.
    lin_span = _avg_span(f"{linear}/*.parquet", "l_orderkey")
    z_span = _avg_span(f"{zorder}/*.parquet", "l_orderkey")
    assert z_span < 0.7 * lin_span, (z_span, lin_span)

    # And partkey pruning is retained within a factor (each dimension gives
    # up some locality to the other — that's the Morton trade).
    lin_pk = _avg_span(f"{linear}/*.parquet", "l_partkey")
    z_pk = _avg_span(f"{zorder}/*.parquet", "l_partkey")
    full_pk = (
        li.agg(F.max("l_partkey") - F.min("l_partkey")).collect()[0][0]
    )
    assert z_pk < full_pk, (z_pk, full_pk)
    assert lin_pk <= z_pk

def test_zorder_key_no_int32_sign_overflow(spark):
    """IntegerType inputs with bit 15 set must not produce negative Morton
    keys (the 32-bit sign-bit overflow from the round-1 advisor): int and
    long inputs yield identical, non-negative keys."""
    from pyspark_retention_pipeline_spark.sources.layout import zorder_key

    df = spark.createDataFrame(
        [(32768, 65535), (65535, 65535), (0, 0), (12345, 54321)], "a int, b int"
    )
    keys = df.select(
        zorder_key(F.col("a"), F.col("b")).alias("k_int"),
        zorder_key(F.col("a").cast("long"), F.col("b").cast("long")).alias("k_long"),
    ).collect()
    for r in keys:
        assert r["k_int"] >= 0, r
        assert r["k_int"] == r["k_long"], r


def test_partition_pruned_revenue_prunes_to_one_directory(spark, sf_dir):
    """The partition-column predicate must appear as a PartitionFilter and
    the scan must read exactly one status directory."""
    from pyspark_retention_pipeline_spark.operators.sinks import (
        partition_pruned_revenue,
    )

    df = partition_pruned_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]
    import pyspark.sql.functions as F

    from pyspark_retention_pipeline_spark.operators.sinks import snapshot_path

    # input_file_name() on the pruned SCAN (the aggregate output has no
    # file lineage): only the o_orderstatus=F directory may be touched.
    scan = spark.read.parquet(snapshot_path(spark, sf_dir)).filter(
        F.col("o_orderstatus") == "F"
    )
    read_files = [
        r.f for r in scan.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert read_files and all("o_orderstatus=F" in f for f in read_files), (
        read_files[:3]
    )


def test_zorder_scan_pushes_both_predicates(spark, sf_dir):
    """The re-read scan must push both dimensions' filters down to parquet
    (the stats-skipping mechanism z-ordering exists to feed)."""
    from pyspark_retention_pipeline_spark.operators.sinks import (
        zorder_scan_revenue,
    )
    from pyspark_retention_pipeline_spark.plans import explain_str

    df = zorder_scan_revenue(spark, sf_dir)
    plan = explain_str(df)
    assert "PushedFilters" in plan
    # the date-range predicates reach the scan; the modulo predicate is not
    # pushable as a parquet filter but the date window alone engages
    # row-group skipping on the z-clustered layout
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan
