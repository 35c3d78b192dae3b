"""Source/sink parity (SURVEY.md §2.1): CSV ingest with explicit types and
header normalization; plain + partitioned parquet sinks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark_retention_pipeline_spark.sources import (
    read_csv_transactions,
    write_parquet,
    write_partitioned_parquet,
)

CSV_KAGGLE_V2 = """InvoiceNo,StockCode,Description,Quantity,InvoiceDate,Price,Customer ID,Country
536365,85123A,HOLDER,6,2010-12-01 08:26:00,2.55,17850,United Kingdom
C536379,D,Discount,-1,2010-12-01 09:41:00,27.50,14527,United Kingdom
536366,71053,LANTERN,6,2010-12-01 08:28:00,3.39,,France
"""


def test_csv_source_normalizes_and_types(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "part1.csv").write_text(CSV_KAGGLE_V2)
    df = read_csv_transactions(spark, str(p / "*.csv"))
    assert df.columns == [
        "Invoice", "StockCode", "Description", "Quantity",
        "InvoiceDate", "UnitPrice", "CustomerID", "Country",
    ]
    types = dict(df.dtypes)
    assert types["Quantity"] == "int" and types["UnitPrice"] == "double"
    assert types["InvoiceDate"] == "timestamp"
    rows = df.orderBy("Invoice").collect()
    assert rows[0]["Quantity"] == 6
    # cancelled invoice ('C' prefix) and null customer survive the scan — the
    # validity filter is a downstream operator, not the reader's job
    assert any(r["Invoice"].startswith("C") for r in rows)
    assert any(r["CustomerID"] is None for r in rows)


def test_partitioned_parquet_roundtrip(spark, sf_dir, tmp_path):
    from pyspark_retention_pipeline_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_status")
    write_partitioned_parquet(orders, out, ["o_orderstatus"])
    statuses = [d for d in os.listdir(out) if d.startswith("o_orderstatus=")]
    assert len(statuses) >= 2
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # Partition pruning: a filter on the partition col reads a subset only.
    pruned = back.filter(F.col("o_orderstatus") == "F")
    assert 0 < pruned.count() < orders.count()


def test_plain_parquet_roundtrip(spark, sf_dir, tmp_path):
    from pyspark_retention_pipeline_spark.tables import load_table

    nation = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_copy")
    write_parquet(nation, out)
    assert spark.read.parquet(out).count() == 25


def test_partition_pruning_in_plan(spark, sf_dir, tmp_path):
    """A filter on the partition column must become a PartitionFilter (prune
    directories), not a data filter over all files."""
    from pyspark_retention_pipeline_spark.plans.inspect import explain_str
    from pyspark_retention_pipeline_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_part")
    write_partitioned_parquet(orders, out, ["o_orderstatus"])
    pruned = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = explain_str(pruned)
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0]


def test_permissive_csv_quarantines_bad_rows(spark, tmp_path):
    from pyspark_retention_pipeline_spark.sources.io import (
        read_csv_transactions_permissive,
    )

    p = tmp_path / "dirty"
    p.mkdir()
    (p / "x.csv").write_text(
        "Invoice,StockCode,Description,Quantity,InvoiceDate,UnitPrice,CustomerID,Country\n"
        "A1,S1,ok,2,2011-01-01 10:00:00,3.50,C1,UK\n"
        "A2,S2,bad-quantity,notanumber,2011-01-01 10:00:00,1.00,C2,UK\n"
        "A3,S3,ok,1,2011-01-02 11:00:00,2.00,C3,UK\n"
    )
    clean, quarantined = read_csv_transactions_permissive(spark, str(p / "*.csv"))
    assert clean.count() == 2
    assert quarantined.count() == 1
    assert "notanumber" in quarantined.collect()[0]["_corrupt_record"]


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    """JSONL sink/scan with pinned schema: values and row counts survive the
    round trip; timestamps go through ISO strings (JSON has no timestamp
    type), so the docs table (string/long only) round-trips losslessly."""
    from pyspark.sql import types as T

    from pyspark_retention_pipeline_spark.sources import read_jsonl, write_jsonl
    from pyspark_retention_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = read_jsonl(spark, path, schema)
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == orig


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from pyspark_retention_pipeline_spark.plans import pushed_filters
    from pyspark_retention_pipeline_spark.sources import read_orc, write_orc
    from pyspark_retention_pipeline_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    # Predicate pushdown reaches the ORC scan just like parquet.
    filtered = back.filter(F.col("o_orderstatus") == "F")
    assert any("o_orderstatus" in f for f in pushed_filters(filtered))
