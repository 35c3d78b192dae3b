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
# Round-10 rotation (docs/ROUND10_ROTATION.md) — GENERATED:
# ``scripts/derive_front.py`` derives this window mechanically from the
# committed CORRECTNESS_r0*.json driver artifacts (rounds BEFORE the
# configured one only, so the derivation is stable whenever the current
# round's artifact lands) plus the script's small per-round config
# (changed-plan list, flagship, window size), and
# ``tests/test_registry_order.py`` asserts the tuple below equals the
# script's output. Round-10 composition: the three plan-changed queries
# seat first (intradoc_dedup_rewrite O(L²)→O(L); ivf_knn deterministic
# codebook + rows-only→oracle upgrade; ann_recall_report pre-window slice
# restriction), the two NEW adaptive-grid ANN queries enter via the
# never-verified tier, then the flagship, then 44 stalest-green backfill
# seats — the full 15-name r3-tier remainder (the round-9
# DEFERRED_TO_R10 set, retiring the pre-r5 staleness tail completely)
# and the front 29 names of the r5 tier. Further new or plan-changed
# queries re-derive this window (update CHANGED in the script config,
# re-run, re-paste). Late round-10 re-derivations: vocab_coverage_curve
# and dedup_clusters_portable joined the never-verified tier (third and
# fourth new queries) and group_aware_split joined the CHANGED tier
# (check upgrade rows-only → per-row oracle) and kmeans_lloyd_curve
# (exact scaled-int reductions + unrolled-CTE oracle upgrade), displacing
# the last four backfill seats (pii_scrub, parquet_roundtrip_revenue,
# pack_documents, p99_quantile → DEFERRED_TO_R11).
_FRONT: tuple[str, ...] = (
    "intradoc_dedup_rewrite",
    "ivf_knn",
    "ann_recall_report",
    "group_aware_split",
    "kmeans_lloyd_curve",
    "vocab_coverage_curve",
    "dedup_clusters_portable",
    "embedding_ann_top1_adaptive",
    "ann_grid_report",
    "churn_features",
    "market_share",
    "median_order_value",
    "moving_avg_order_value",
    "order_count_distribution",
    "orders_per_weekday",
    "pricing_summary",
    "promo_revenue_share",
    "quality_score",
    "returned_items_top_customers",
    "segments_by_revenue",
    "shipping_priority",
    "small_qty_part_revenue",
    "sql_api_revenue",
    "token_topk",
    "volume_shipping",
    "binary_meta",
    "c4_quality_filter",
    "chunk_documents",
    "class_counts",
    "confusion_matrix",
    "customer_profile",
    "customer_rfm",
    "dedup_exact",
    "distinct_customers",
    "distinct_products",
    "embedding_neardup",
    "embedding_quantize_stats",
    "epoch_shuffle",
    "forecast_revenue_discount",
    "hash_sample",
    "incremental_dedup",
    "json_props",
    "knn_bruteforce",
    "lang_mix_sample",
    "large_volume_customers",
    "local_supplier_volume",
    "media_embed_knn",
    "monthly_revenue",
    "ngram_contamination",
    "order_rollup",
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
