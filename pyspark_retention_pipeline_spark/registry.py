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
# Round-13 rotation (docs/ROUND13_ROTATION.md) — GENERATED:
# ``scripts/derive_front.py`` derives this window mechanically from the
# committed CORRECTNESS_r*.json driver artifacts (rounds BEFORE the
# configured one only, so the derivation is stable whenever the current
# round's artifact lands) plus the script's small per-round config
# (changed-plan list, flagship, window size), and
# ``tests/test_registry_order.py`` asserts the tuple below equals the
# script's output. Round-13 composition: the changed tier seats
# media_embed_knn (explicit F.broadcast pin on its bounded query side —
# round-12 verdict item 6, a plan change); the never-verified tier seats
# the SEVEN round-13 additions in registration order (bm25_topk — Okapi
# BM25 retrieval — kneser_ney_bigram_score — the interpolated-KN
# smoothed LM score — crossdoc_span_rewrite_maximal — the
# variable-length multi-k-cascade ExactSubstr rewrite — pq_adc_recall —
# the product-quantization asymmetric-distance retrieval scorecard —
# hard_negative_mining — contrastive cross-label negatives —
# mmr_rerank — MMR diverse reranking — and ivf_pq_recall — the composed
# IVF-PQ end-to-end scorecard); then the flagship and 41 stalest-green
# backfill seats — the nine-name r7-tier remainder (round 12's
# DEFERRED_TO_R13: top_session_paths … winsorized_spend_stats) and 32
# of the 45-name r8 tier in (round, name) order from ab_conversion_ztest
# through quality_zscore_by_lang (the last thirteen r8 names defer to
# round 14), moving the staleness floor to r8.
# Further new or plan-changed queries re-derive this window (update
# CHANGED in the script config, re-run, re-paste).
_FRONT: tuple[str, ...] = (
    "media_embed_knn",
    "bm25_topk",
    "kneser_ney_bigram_score",
    "crossdoc_span_rewrite_maximal",
    "pq_adc_recall",
    "hard_negative_mining",
    "mmr_rerank",
    "ivf_pq_recall",
    "churn_features",
    "top_session_paths",
    "udtf_sentence_split",
    "unigram_logprob_score",
    "user_type_entropy",
    "variant_props_histogram",
    "weekday_hour_heatmap",
    "weighted_doc_sample",
    "winnowing_fingerprints",
    "winsorized_spend_stats",
    "ab_conversion_ztest",
    "above_avg_orders",
    "active_customers_semi",
    "all_orders_finished",
    "best_threshold",
    "bigram_logprob_score",
    "bootstrap_revenue_ci",
    "cast_projection",
    "churned_customers",
    "class_weights",
    "cohort_filter",
    "csv_roundtrip_customers",
    "curate_corpus",
    "dependent_funnel",
    "embedding_outliers",
    "group_split_leakage_audit",
    "hapax_rate_by_source",
    "interarrival_acf",
    "jsonl_roundtrip_events",
    "km_session_survival",
    "ks_price_drift",
    "lang_id_confusion",
    "lateral_recent_orders",
    "locf_fill",
    "media_dedup_exact",
    "ngram_dup_rate",
    "orc_roundtrip_revenue",
    "pareto_concentration",
    "per_source_sample",
    "pipe_sql_revenue_flow",
    "psi_price_drift",
    "quality_zscore_by_lang",
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
