"""Custom Python Data Source DEMO: nanosecond-timestamp Parquet.

Spark's vectorized Parquet reader rejects INT64 TIMESTAMP(NANOS) files
(``PARQUET_TYPE_ILLEGAL``); this module shows the *extensible-source* way
around that: a PySpark 4 Python Data Source (public API:
pyspark.sql.datasource) that reads such files with pyarrow, one partition per
Parquet row group — distributed, Arrow-batched, and schema-explicit, with the
nanos surfaced as both a long and a derived microsecond value.

NOTE — demo, not engine path. Earlier testdata generations wrote the events
table at nanosecond precision and this source mirrored ``tables.load_events``;
the current testdata is microsecond parquet, which Spark reads natively, so
``load_events`` now probes the footer and only falls back to the
``nanosAsLong`` flag for genuinely-nano files. This source is kept as the
reference implementation of a partitioned Python Data Source (the pattern a
user would follow for any reader Spark lacks); its test writes its own
nanosecond fixture.

Usage:
    spark.dataSource.register(NanoParquetDataSource)
    df = (spark.read.format("nanoparquet")
          .option("path", ".../nanos.parquet").load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T


SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_ns", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


class RowGroupPartition(InputPartition):
    def __init__(self, path: str, row_group: int):
        self.path = path
        self.row_group = row_group


class NanoParquetReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("nanoparquet source requires option 'path'")

    def partitions(self):
        # Planning: one split per row group (the natural parallel unit of a
        # parquet file; for directories, one per (file, row group)).
        import glob
        import pyarrow.parquet as pq

        paths = sorted(glob.glob(self.path)) or [self.path]
        splits = []
        for p in paths:
            md = pq.ParquetFile(p).metadata
            for rg in range(md.num_row_groups):
                splits.append(RowGroupPartition(p, rg))
        return splits

    def read(self, partition: RowGroupPartition):
        # Execution (runs on executors): read one row group, yield Arrow
        # batches — no per-row Python objects.
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        table = pq.ParquetFile(partition.path).read_row_group(partition.row_group)
        ts_ns = pc.cast(table.column("ts"), pa.int64())
        ts_us = pc.divide(ts_ns, pa.scalar(1000, pa.int64()))
        out = pa.table(
            {
                "event_id": table.column("event_id"),
                "ts_ns": ts_ns,
                "ts_us": ts_us,
                "user_id": table.column("user_id"),
                "event_type": table.column("event_type"),
                "value": table.column("value"),
                "props": table.column("props"),
            }
        )
        yield from out.to_batches()


class NanoParquetDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "nanoparquet"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return NanoParquetReader(self.options)
