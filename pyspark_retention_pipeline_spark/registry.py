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
# Round-12 rotation (docs/ROUND12_ROTATION.md) — GENERATED:
# ``scripts/derive_front.py`` derives this window mechanically from the
# committed CORRECTNESS_r*.json driver artifacts (rounds BEFORE the
# configured one only, so the derivation is stable whenever the current
# round's artifact lands) plus the script's small per-round config
# (changed-plan list, flagship, window size), and
# ``tests/test_registry_order.py`` asserts the tuple below equals the
# script's output. Round-12 composition: no plan-changed queries; the
# THIRTEEN new queries (bpe_merge_rounds — unrolled BPE merge training
# rounds — bpe_encode_stats — the applied-compression curve —
# crossdoc_span_rewrite — the ExactSubstr cross-document span rewrite —
# crossdoc_span_profile — the span-length S-curve scorecard —
# doc_novelty_score — per-doc corpus-novelty attribution —
# semdedup_tau_curve — the SemDeDup τ operating-point scorecard —
# kcenter_coreset — greedy farthest-point diverse selection —
# ivf_probe_recall — the IVF probe-depth recall scorecard —
# part_pagerank_rounds — integer fixed-point PageRank over the part
# co-occurrence graph — quantized_knn_recall — the int8-retrieval
# recall scorecard — part_triangle_counts — triangle counting /
# clustering coefficient — kcore_rounds — the k-core peeling curve —
# and heaps_vocab_growth — the vocabulary-growth curve) enter via the
# never-verified tier, then the flagship, then 36 stalest-green
# backfill seats — the 3-name r6-tier remainder (round-11's
# DEFERRED_TO_R12: time_to_conversion, top_revenue_suppliers,
# tumbling_hourly) and 33 of the 42-name r7 tier (the last nine —
# top_session_paths, udtf_sentence_split, unigram_logprob_score,
# user_type_entropy, variant_props_histogram, weekday_hour_heatmap,
# weighted_doc_sample, winnowing_fingerprints, winsorized_spend_stats —
# defer to round 13), moving the staleness floor to r7.
# Further new or plan-changed queries re-derive this window (update
# CHANGED in the script config, re-run, re-paste).
_FRONT: tuple[str, ...] = (
    "bpe_merge_rounds",
    "bpe_encode_stats",
    "crossdoc_span_rewrite",
    "crossdoc_span_profile",
    "doc_novelty_score",
    "heaps_vocab_growth",
    "quantized_knn_recall",
    "semdedup_tau_curve",
    "kcenter_coreset",
    "ivf_probe_recall",
    "part_pagerank_rounds",
    "part_triangle_counts",
    "kcore_rounds",
    "churn_features",
    "time_to_conversion",
    "top_revenue_suppliers",
    "tumbling_hourly",
    "audience_overlap",
    "basket_lift",
    "bounce_rate_daily",
    "bucketed_join_revenue",
    "cdc_multi_action_apply",
    "centroid_inertia",
    "cumulative_new_users",
    "daily_anomaly_zscore",
    "dq_constraint_report",
    "heavy_hitter_tokens",
    "join_key_skew_profile",
    "lorenz_deciles",
    "merge_upsert_snapshot",
    "minhash_signatures",
    "nation_revenue_trend",
    "part_cooccurrence",
    "partition_pruned_revenue",
    "prefix_edit_distance_pairs",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_excess_stock",
    "q2_min_cost_supplier",
    "recursive_month_spine",
    "retention_by_first_touch",
    "revenue_gini",
    "revenue_mom_growth",
    "revenue_trend_forecast",
    "rfm_segments",
    "scd2_order_versions",
    "simhash64",
    "snapshot_diff_summary",
    "source_temperature_weights",
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


def registration_order() -> list[str]:
    """Query names in module-import registration order — the stable age
    proxy ``scripts/derive_front.py`` uses for the never-driver-verified
    tier (unlike ``all_queries()``, NOT reordered by ``_FRONT``)."""
    _ensure_loaded()
    return list(_REGISTRY)
