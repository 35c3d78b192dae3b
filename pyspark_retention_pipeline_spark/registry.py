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
# ``queries()`` (50 entries per round), so ordering is part of the contract.
# Round-3 rotation (VERDICT r2 item 1): the window leads with the 15
# oracle-backed queries that never had a driver row in rounds 1–2, the 3
# queries whose broadcast de-hint left them stale after their round-1 green
# row, the flagship continuity slot, and the 4 queries whose plans changed
# this round; the remaining slots re-verify a representative slice of the
# extension tier (all green in CORRECTNESS_r02). Everything else keeps
# registration order, with oracle-backed queries before rows-only ones so no
# verifiable query is ever displaced by an unverifiable one.
_FRONT: tuple[str, ...] = (
    # --- never driver-verified until now: 8 TPC-H shapes (tpch_extra) ---
    "volume_shipping",
    "market_share",
    "returned_items_top_customers",
    "order_count_distribution",
    "top_revenue_suppliers",
    "small_qty_part_revenue",
    "disjunctive_part_predicates",
    "idle_wealthy_customers",
    # --- never driver-verified: analytics_extra family + salted skew join ---
    "grouping_sets_revenue",
    "moving_avg_order_value",
    "event_day_spine_fill",
    "sql_api_revenue",
    "orders_per_weekday",
    "acctbal_histogram",
    "skew_salted_segment_counts",
    # --- stale after round-2 broadcast de-hint (r1 green, plan changed) ---
    "segments_by_revenue",
    "shipping_priority",
    "promo_revenue_share",
    # --- flagship continuity slot ---
    "churn_features",
    # --- plans/oracles changed in round 3 — need fresh rows ---
    "pack_documents",
    "chunk_documents",
    "quality_zscore_by_lang",
    "median_order_value",
    # --- representative extension-tier re-verification (green in r2) ---
    "dedup_exact",
    "word_jaccard_pairs",
    "doc_fingerprint",
    "text_stats",
    "lang_stats",
    "quality_score",
    "token_topk",
    "tfidf_top_terms",
    "embedding_norms",
    "knn_bruteforce",
    "embedding_neardup",
    "tumbling_hourly",
    "sliding_hourly",
    "sessionize",
    "json_props",
    "asof_last_purchase",
    "daily_rollup_from_hourly",
    "monthly_revenue",
    "rollup_revenue",
    "hash_sample",
    "binary_meta",
    "repetition_stats",
    "pii_scrub",
    "c4_quality_filter",
    "embedding_quantize_stats",
    # core slice (TPC-H Q1 + the remaining round-2 de-hinted query)
    "pricing_summary",
    "top_parts_per_segment",
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
