"""Local DuckDB-oracle parity harness — a strict mirror of the driver gate.

The driver runs each ``queries()[name]`` in Spark and ``oracle_sql()[name]``
in DuckDB over the same parquet tables, then compares row count + schema +
order-insensitive value hash. This module reproduces that comparison (in a
stricter form: canonicalized cell-by-cell equality) so parity regressions are
caught by pytest before the driver ever sees them.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter
from dataclasses import dataclass

import duckdb
import pandas as pd

from pyspark.sql import DataFrame

from .tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with one view per testdata table (the driver pre-registers
    the same names)."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, (_dt.datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Sort columns by name, stringify cells, sort rows — order-insensitive
    canonical form."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""
    # Per-engine walls (round-13 verdict item 7): the sf0.1 sweep's slowest
    # rows split roughly half engine / half DuckDB — separate columns keep
    # a regression in OUR plans from being masked by the oracle's share.
    spark_sec: float = 0.0
    oracle_sec: float = 0.0


def compare_query(
    name: str, spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str
) -> ParityResult:
    import time as _time

    t0 = _time.perf_counter()
    spark_pdf = spark_df.toPandas()
    t1 = _time.perf_counter()
    oracle_pdf = con.execute(sql).df()
    t2 = _time.perf_counter()
    _ss, _os = t1 - t0, t2 - t1

    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return ParityResult(
            name,
            False,
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}",
            spark_sec=_ss,
            oracle_sec=_os,
        )
    if len(spark_pdf) != len(oracle_pdf):
        return ParityResult(
            name,
            False,
            f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}",
            spark_sec=_ss,
            oracle_sec=_os,
        )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        # Multiset difference, not positional zip: one extra/missing row early
        # in the sort order would misalign every later pair and turn the
        # printed diffs into noise.
        s_only = Counter(s_rows) - Counter(o_rows)
        o_only = Counter(o_rows) - Counter(s_rows)
        lines = [f"  spark-only: {r}" for r in list(s_only)[:5]] + [
            f"  oracle-only: {r}" for r in list(o_only)[:5]
        ]
        return ParityResult(
            name,
            False,
            f"value mismatch ({sum(s_only.values())} spark-only / "
            f"{sum(o_only.values())} oracle-only rows):\n" + "\n".join(lines),
            spark_sec=_ss,
            oracle_sec=_os,
        )
    return ParityResult(name, True, f"{len(s_rows)} rows", spark_sec=_ss, oracle_sec=_os)
