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
# Round-8 rotation (VERDICT r7 items 1/2/4 + docs/ROUND8_ROTATION.md) — now
# GENERATED: ``scripts/derive_front.py`` derives this window mechanically
# from the committed CORRECTNESS_r0*.json driver artifacts plus the script's
# small per-round config (changed-plan list, flagship, window size), and
# ``tests/test_registry_order.py`` asserts the tuple below equals the
# script's output. Round-8 composition: the 15 plan-changed seats (three
# shared-frame pins from commit 8599b2e; the jaccard-verify parity slice;
# the three registry-scan-budget fixes; the lateral_recent_orders
# global-sort rewrite; and the deep-review fixes — degraded-bucket chain
# pairs through the simhash composers, the pinned component edge frame
# through the clustering composers, unified gram staging, rank-on-rounded
# tfidf), the ENTIRE never-driver-verified backlog (23 round-7 deferrals
# + group_split_leakage_audit + the format roundtrips — backlog reaches
# zero — csv_roundtrip_customers joins it late), the flagship, and 7
# backfill seats from the stalest (round-1-verified) tier; the remaining
# 20 r1-tier names defer to round 9.
_FRONT: tuple[str, ...] = (
    "class_weights",
    "tfidf_top_terms",
    "quality_zscore_by_lang",
    "simhash_jaccard_verify",
    "word_jaccard_pairs",
    "curate_corpus",
    "ivf_knn",
    "lateral_recent_orders",
    "simhash_candidates",
    "split_leakage_check",
    "source_overlap_matrix",
    "group_aware_split",
    "dedup_clusters",
    "curate_corpus_neardup",
    "ngram_dup_rate",
    "retention_decay_fit",
    "dependent_funnel",
    "km_session_survival",
    "ab_conversion_ztest",
    "time_decay_attribution",
    "user_value_twap",
    "interarrival_acf",
    "theilsen_revenue_trend",
    "locf_fill",
    "lang_id_confusion",
    "hapax_rate_by_source",
    "rare_token_rate",
    "bigram_logprob_score",
    "token_pmi_collocations",
    "per_source_sample",
    "group_split_leakage_audit",
    "embedding_outliers",
    "pareto_concentration",
    "pipe_sql_revenue_flow",
    "psi_price_drift",
    "ks_price_drift",
    "bootstrap_revenue_ci",
    "zorder_scan_revenue",
    "jsonl_roundtrip_events",
    "orc_roundtrip_revenue",
    "csv_roundtrip_customers",
    "media_dedup_exact",
    "churn_features",
    "above_avg_orders",
    "active_customers_semi",
    "all_orders_finished",
    "best_threshold",
    "cast_projection",
    "churned_customers",
    "cohort_filter",
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
