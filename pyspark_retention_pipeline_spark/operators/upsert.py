"""Upsert / SCD2 change application — MERGE-INTO semantics without a table
format (Delta/Iceberg jars aren't in this environment; per the driver guide,
CDC/SCD2 is emulated with anti-join + union + window).

Both operators are pure DataFrame transforms: at scale you'd pair them with a
partitioned rewrite of only the affected partitions (partition overwrite
mode), which is a property of the sink, not of this logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE (matched → replace, unmatched → insert): keep target rows whose
    key has no update (anti-join), then union all update rows. One key-only
    shuffle for the anti-join; updates win wholesale."""
    untouched = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return untouched.unionByName(updates)


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the open version of each
    changed key (set its ``valid_to`` to the change timestamp) and append the
    change as the new open version (``valid_to`` NULL).

    ``current`` must carry ``valid_from``/``valid_to`` (NULL = open);
    ``changes`` carries the key, the new attribute values, and the change
    timestamp column. One change per key per application (dedupe upstream
    with a keep-latest window if needed).
    """
    change_keys = changes.select(
        F.col(key), F.col(change_ts_col).alias("_change_ts")
    )

    closed = (
        current.join(F.broadcast(change_keys), key, "inner")
        .filter(F.col(valid_to).isNull())
        .withColumn(valid_to, F.col("_change_ts"))
        .drop("_change_ts")
    )
    unchanged = current.join(change_keys.select(key), key, "left_anti").unionByName(
        # historical (already-closed) versions of changed keys stay as-is
        current.join(change_keys.select(key), key, "left_semi").filter(
            F.col(valid_to).isNotNull()
        )
    )
    new_versions = (
        changes.withColumn(valid_from, F.col(change_ts_col))
        .withColumn(valid_to, F.lit(None).cast(current.schema[valid_to].dataType))
        .drop(change_ts_col)
    )
    return unchanged.unionByName(closed).unionByName(new_versions)
