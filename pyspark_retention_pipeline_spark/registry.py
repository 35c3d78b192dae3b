"""Query registry — the single catalog of every operator this engine ships.

Each operator from SURVEY.md §2 (plus the extension tier) registers itself
here with a name, a Spark implementation ``(spark, sf_dir) -> DataFrame``, and
— when SQL-expressible — an equivalent ANSI-SQL oracle string that DuckDB can
run over the same parquet tables. ``__spark_entry__.py`` re-exports these for
the driver's correctness gate.

Conventions that keep Spark results hash-identical to the oracle:
  * every computed column is aliased identically on both sides;
  * order-dependent float reductions (SUM of doubles) are rounded at a fixed
    scale on both sides; derived floats (avg, log, ratio) are computed from
    those already-identical rounded values with identical IEEE operations;
  * computed integer columns are cast to BIGINT on both sides;
  * event-time logic uses integer epoch microseconds, never session-TZ
    timestamps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query implementation under ``name``.

    ``oracle`` is the DuckDB-runnable ANSI SQL twin; ``None`` marks an op the
    driver checks rows-only (non-SQL-expressible — ML, LSH, stateful ops).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import the operator modules for their registration side effects.
    from . import operators  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in _REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}


def get(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]


def names() -> list[str]:
    _ensure_loaded()
    return sorted(_REGISTRY)
