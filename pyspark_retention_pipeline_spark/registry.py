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
# Round-9 rotation (docs/ROUND9_ROTATION.md) — GENERATED:
# ``scripts/derive_front.py`` derives this window mechanically from the
# committed CORRECTNESS_r0*.json driver artifacts (rounds BEFORE the
# configured one only, so the derivation is stable whenever the current
# round's artifact lands) plus the script's small per-round config
# (changed-plan list, flagship, window size), and
# ``tests/test_registry_order.py`` asserts the tuple below equals the
# script's output. Round-9 composition: lsh_bucket_candidates seats
# first (check upgraded rows-only → md5-plane oracle; plan unchanged),
# the five NEW round-9 queries (portable banded minhash candidates, the
# tokenizer tier, the banded-ANN top-1, and its ann_recall_report
# scorecard) enter via the never-verified tier, then the flagship, then
# 43 stalest-green backfill seats — the 20 r1-verified deferrals, the
# full r2 tier, and the front of the r3 tier, their first
# re-verification since they were first gated. Further new or
# plan-changed queries re-derive this window (update CHANGED in the
# script config, re-run, re-paste).
_FRONT: tuple[str, ...] = (
    "lsh_bucket_candidates",
    "minhash_banded_candidates",
    "bpe_pair_counts",
    "intradoc_dedup_rewrite",
    "embedding_ann_top1",
    "ann_recall_report",
    "churn_features",
    "customer_spend_stats",
    "label_antijoin",
    "large_volume_orders",
    "late_shipping_priority_check",
    "latest_order_per_customer",
    "left_join_enrich",
    "not_cancelled",
    "order_key_list",
    "priority_line_distribution",
    "recent90_agg",
    "recent_window",
    "returned_parts_distinct",
    "running_total",
    "segment_case",
    "sql_expr_filter",
    "supplier_balance_by_nation",
    "threshold_pred",
    "threshold_sweep",
    "top_customers",
    "union_by_name",
    "cube_status_priority",
    "dedup_keep_first",
    "event_type_map_summary",
    "inactive_customers_except",
    "json_typed_parse",
    "label_centroids",
    "lang_id_heuristic",
    "order_value_bounds",
    "regex_token_count",
    "retained_buyers_intersect",
    "revenue_by_nation",
    "revenue_share",
    "salted_supplier_agg",
    "segment_metrics_unpivot",
    "string_ops",
    "token_classes",
    "acctbal_histogram",
    "disjunctive_part_predicates",
    "doc_fingerprint",
    "embedding_norms",
    "grouping_sets_revenue",
    "idle_wealthy_customers",
    "lang_stats",
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
