"""Sources & sinks (SURVEY.md §2.1 S1-S6)."""

from .io import (
    read_csv_transactions,
    read_parquet_table,
    write_parquet,
    write_partitioned_parquet,
)

__all__ = [
    "read_csv_transactions",
    "read_parquet_table",
    "write_parquet",
    "write_partitioned_parquet",
]
