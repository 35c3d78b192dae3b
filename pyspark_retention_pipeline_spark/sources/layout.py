"""Multi-dimensional file layout: Z-order (Morton) clustering for data
skipping on two filter columns at once.

A linear sort on column A gives perfect min/max pruning for A-predicates and
none for B; interleaving the bits of A and B (public Morton-order technique,
used by lakehouse OPTIMIZE ZORDER implementations) subdivides BOTH dimensions
across files, so each file's (min,max) footprint is a small rectangle and
predicates on either column skip most files. Pure bit-arithmetic expressions
— no UDF; the effect on parquet footer stats is measured in
tests/test_layout.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16


def zorder_key(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer columns
    into a Morton key (a's bit i → position 2i+1, b's → 2i).

    Inputs are widened to LONG first: with the default bits=16 an IntegerType
    input would shift its top bit into position 31 — the 32-bit sign bit —
    producing negative Morton keys that sort before all others and corrupt
    the range clustering (round-1 advisor finding)."""
    mask = (1 << bits) - 1
    a = a.cast("long").bitwiseAND(F.lit(mask))
    b = b.cast("long").bitwiseAND(F.lit(mask))
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    keep_key_cols: bool = True,
) -> None:
    """Write ``df`` clustered by the Morton key of (col_a, col_b):
    range-partition on the key (so files own contiguous key ranges — compact
    2-D rectangles) and sort within partitions for row-group locality.
    ``keep_key_cols=False`` also drops the two key columns themselves —
    for callers whose keys are derived helper columns that should survive
    only as physical row order, not as stored data."""
    keyed = df.withColumn("_z", zorder_key(F.col(col_a), F.col(col_b)))
    drop = ("_z", col_a, col_b) if not keep_key_cols else ("_z",)
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop(*drop)
        .write.mode("overwrite")
        .parquet(path)
    )
