"""load_events precision-proofing (round-5 regression: testdata drifted from
nanosecond to microsecond parquet and ``ts DIV 1000`` silently produced
epoch-millis — 9 event-time queries broken, rows-only checks blind to it).

The contract pinned here: ``ts_us`` is epoch MICROSECONDS regardless of the
on-disk precision, verified against DuckDB (an independent reader of the same
files), and a unit mix-up fails LOUDLY at load time instead of collapsing
hour buckets downstream.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from pyspark_retention_pipeline_spark.tables import load_events


def test_load_events_ts_us_matches_duckdb(spark, sf_dir):
    """min/max/count of ts_us agree exactly with DuckDB's epoch_us over the
    same parquet — a 1000x unit drift shifts min/max by 3 orders of
    magnitude, so this cannot pass on a wrong-unit read."""
    got = (
        load_events(spark, sf_dir)
        .agg(
            F.min("ts_us").alias("lo"),
            F.max("ts_us").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    lo, hi, n = duckdb.sql(
        f"SELECT MIN(epoch_us(ts)), MAX(epoch_us(ts)), COUNT(*) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert (got["lo"], got["hi"], got["n"]) == (lo, hi, n)


def _write_events(path, ts_array):
    n = len(ts_array)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": ts_array,
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["click"] * n),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        path,
    )


def test_load_events_rejects_unit_drift(spark, tmp_path):
    """A µs-typed column whose values are actually epoch-millis magnitude
    (the round-5 failure class) must raise at load time, not flow through."""
    d = tmp_path / "drift"
    d.mkdir()
    _write_events(
        str(d / "events.parquet"),
        pa.array([1_700_000_000_000 + i for i in range(5)], pa.timestamp("us")),
    )
    with pytest.raises(ValueError, match="sanity check failed"):
        load_events(spark, str(d))


def test_load_events_reads_nano_parquet(spark, tmp_path):
    """The legacy nanosecond branch still reads exactly: ns fixtures surface
    as epoch-nanos longs and ts_us is the integer-µs truncation."""
    d = tmp_path / "nanos"
    d.mkdir()
    base_ns = 1_700_000_000_000_000_000
    _write_events(
        str(d / "events.parquet"),
        pa.array([base_ns + i * 1_234_567_891 for i in range(10)], pa.timestamp("ns")),
    )
    rows = load_events(spark, str(d)).select("event_id", "ts_us").collect()
    for r in rows:
        assert r["ts_us"] == (base_ns + r["event_id"] * 1_234_567_891) // 1000


def test_load_events_reads_milli_parquet(spark, tmp_path):
    """ms-precision parquet (a plausible future testdata generation) reads
    through the NTZ branch with exact µs values."""
    d = tmp_path / "millis"
    d.mkdir()
    base_ms = 1_700_000_000_000
    _write_events(
        str(d / "events.parquet"),
        pa.array([base_ms + i * 123_457 for i in range(10)], pa.timestamp("ms")),
    )
    rows = load_events(spark, str(d)).select("event_id", "ts_us").collect()
    for r in rows:
        assert r["ts_us"] == (base_ms + r["event_id"] * 123_457) * 1000
