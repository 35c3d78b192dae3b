"""Testdata table loaders with explicit schemas.

The reference reads CSV with header inference and then force-casts columns
(reference ``pipeline/etl.py:13-30``); at 100 TB schema inference is a full
extra pass over the data, so this engine *always* reads with an explicit
:class:`~pyspark.sql.types.StructType` and verifies the file schema against it
instead of inferring.

Table layout comes from TESTDATA.md / FIXTURES.md §3 (TPC-H-ish star schema
plus ``events`` / ``documents`` / ``embeddings``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit schemas — the single source of truth for what each table looks like.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
    # events is special-cased below: its on-disk ``ts`` is nanosecond-precision,
    # which Spark reads as an epoch-nanos long under
    # spark.sql.legacy.parquet.nanosAsLong.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
}

TABLES = tuple(SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame.

    ``events`` comes back with ``ts_us`` (epoch microseconds, long) alongside
    the raw ``ts`` nanos — event-time logic in this engine is done on integer
    epoch values, which are time-zone-free and compare exactly across engines
    (external oracles store timestamps at microsecond precision).
    """
    if name == "events":
        return load_events(spark, sf_dir)
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.schema(SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with nanosecond timestamps read scalably.

    Spark's vectorized Parquet reader has no nanosecond timestamp type; the
    supported path is ``spark.sql.legacy.parquet.nanosAsLong`` which surfaces
    the physical INT64 as epoch nanoseconds. We derive ``ts_us`` via integer
    floor-division (keeps whole-stage codegen; no Python round trip).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.schema(SCHEMAS["events"]).parquet(f"{sf_dir}/events.parquet")
    # Integer division — a double division at epoch-nanos magnitude (~1.7e18)
    # loses the low bits and corrupts the microsecond value.
    return df.withColumn("ts_us", F.expr("ts DIV 1000"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; all of them when ``names`` is empty."""
    picked = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in picked}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so raw SQL text runs
    against the engine (``spark.sql`` is a first-class API surface beside
    the DataFrame builders — reference users who write SQL keep writing
    SQL). Events register with the integer ``ts_us`` column added."""
    for name in TABLES:
        df = load_events(spark, sf_dir) if name == "events" else load_table(
            spark, sf_dir, name
        )
        df.createOrReplaceTempView(name)
