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

# Driver-gate priority order. The correctness gate verifies a bounded prefix of
# ``queries()`` (50 entries per round), so ordering is part of the contract —
# re-derive this list EVERY round (round-end checklist; round 5 skipped it and
# shipped two rewrites with no driver row, VERDICT r5 item 2).
# Round-11 rotation (docs/ROUND11_ROTATION.md) — GENERATED:
# ``scripts/derive_front.py`` derives this window mechanically from the
# committed CORRECTNESS_r*.json driver artifacts (rounds BEFORE the
# configured one only, so the derivation is stable whenever the current
# round's artifact lands) plus the script's small per-round config
# (changed-plan list, flagship, window size), and
# ``tests/test_registry_order.py`` asserts the tuple below equals the
# script's output. Round-11 composition: the three plan-changed queries
# seat first (vocab_coverage_curve two-phase rank/cumsum rewrite;
# ann_grid_report integer pair counts; kmeans_lloyd_curve quantized
# argmin), the four NEW queries (minhash_calibration,
# dsir_importance_select, semdedup_keep, crossdoc_span_stats) enter via
# the never-verified tier, then the flagship, then 42 stalest-green
# backfill seats — the full 18-name r5-tier remainder (round-10's
# DEFERRED_TO_R11) and 24 of the 27 r6-tier names (time_to_conversion,
# top_revenue_suppliers and tumbling_hourly, last in (round, name)
# order, defer to round 12).
# Further new or plan-changed queries re-derive this window (update
# CHANGED in the script config, re-run, re-paste).
_FRONT: tuple[str, ...] = (
    "vocab_coverage_curve",
    "ann_grid_report",
    "kmeans_lloyd_curve",
    "minhash_calibration",
    "dsir_importance_select",
    "crossdoc_span_stats",
    "semdedup_keep",
    "churn_features",
    "p99_quantile",
    "pack_documents",
    "parquet_roundtrip_revenue",
    "pii_scrub",
    "product_type_profit",
    "purchase_gaps",
    "quality_budget_select",
    "repetition_stats",
    "rollup_revenue",
    "skew_salted_segment_counts",
    "source_mix_report",
    "text_stats",
    "threshold_curve",
    "token_budget_select",
    "token_len_histogram",
    "train_val_test_split",
    "valid_lines",
    "waiting_suppliers",
    "asof_last_purchase",
    "cohort_ltv",
    "cohort_retention",
    "customer_rank_family",
    "daily_activity_revenue_outer",
    "daily_rollup_from_hourly",
    "dn_retention",
    "doc_len_quartiles_by_lang",
    "dup_rate_by_source",
    "event_day_spine_fill",
    "event_transition_matrix",
    "event_type_hourly_pivot",
    "first_touch_attribution",
    "growth_accounting",
    "power_user_curve",
    "range_join_error_context",
    "rolling_7d_revenue",
    "session_duration_histogram",
    "session_funnel",
    "sessionize",
    "signup_purchase_funnel",
    "sliding_hourly",
    "source_cap_select",
    "stickiness_ratio",
)


def _ordered() -> list[Query]:
    """Registry entries in driver-gate priority order (see ``_FRONT``)."""
    _ensure_loaded()
    front_set = set(_FRONT)
    front = [_REGISTRY[n] for n in _FRONT if n in _REGISTRY]
    rest = [q for n, q in _REGISTRY.items() if n not in front_set]
    # Stable partition: oracle-backed before rows-only.
    rest = [q for q in rest if q.oracle is not None] + [
        q for q in rest if q.oracle is None
    ]
    return front + rest


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
    return {q.name: q.fn for q in _ordered()}


def all_oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


def get(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]


def names() -> list[str]:
    _ensure_loaded()
    return sorted(_REGISTRY)


def registration_order() -> list[str]:
    """Query names in module-import registration order — the stable age
    proxy ``scripts/derive_front.py`` uses for the never-driver-verified
    tier (unlike ``all_queries()``, NOT reordered by ``_FRONT``)."""
    _ensure_loaded()
    return list(_REGISTRY)
