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
# Round-14 rotation (docs/ROUND14_ROTATION.md) — GENERATED:
# ``scripts/derive_front.py`` derives this window mechanically from the
# committed CORRECTNESS_r*.json driver artifacts (rounds BEFORE the
# configured one only, so the derivation is stable whenever the current
# round's artifact lands) plus the script's small per-round config
# (changed-plan list, flagship, window size), and
# ``tests/test_registry_order.py`` asserts the tuple below equals the
# script's output. Round-14 composition: the changed tier seats
# bm25_topk (vocab-grain df pruned to the query-token sliver before any
# broadcast + oracle association byte-match), basket_lift (part-grain
# support broadcast hints dropped), mmr_rerank (per-round checkpoint
# pin), ivf_pq_recall (new pq_residual IVFADC variant — schema
# change), and theilsen_revenue_trend (approx-bracket exact-median
# recipe replacing Spark's slow median aggregate); the never-verified
# tier seats the three round-14 additions
# (neardup_edit_verify — the character-level Levenshtein verify rung —
# retrieval_graded_metrics — the MRR/nDCG scorecard — and
# packing_efficiency_report — the truncation-loss packing scorecard)
# plus
# quality_classifier_scores, the ONE name with no driver row ever —
# rows-only by design (MLlib), seated once for its rows-only record now
# that the tier accepts rows-only registrations (round-13 ADVICE item
# 2); then the flagship and 40 stalest-green backfill seats — the
# twelve-name r8-tier remainder (round 13's DEFERRED_TO_R14:
# rare_token_rate … zorder_scan_revenue) and 28 of the r9 tier in
# (round, name) order from acctbal_histogram through
# priority_line_distribution, moving the staleness floor to r9.
# Further new or plan-changed queries re-derive this window (update
# CHANGED in the script config, re-run, re-paste).
_FRONT: tuple[str, ...] = (
    "bm25_topk",
    "basket_lift",
    "mmr_rerank",
    "ivf_pq_recall",
    "theilsen_revenue_trend",
    "neardup_edit_verify",
    "packing_efficiency_report",
    "retrieval_graded_metrics",
    "quality_classifier_scores",
    "churn_features",
    "rare_token_rate",
    "retention_decay_fit",
    "simhash_candidates",
    "simhash_jaccard_verify",
    "source_overlap_matrix",
    "split_leakage_check",
    "tfidf_top_terms",
    "time_decay_attribution",
    "token_pmi_collocations",
    "user_value_twap",
    "word_jaccard_pairs",
    "zorder_scan_revenue",
    "acctbal_histogram",
    "bpe_pair_counts",
    "cube_status_priority",
    "customer_spend_stats",
    "dedup_keep_first",
    "disjunctive_part_predicates",
    "doc_fingerprint",
    "embedding_ann_top1",
    "embedding_norms",
    "event_type_map_summary",
    "grouping_sets_revenue",
    "idle_wealthy_customers",
    "inactive_customers_except",
    "json_typed_parse",
    "label_antijoin",
    "label_centroids",
    "lang_id_heuristic",
    "lang_stats",
    "large_volume_orders",
    "late_shipping_priority_check",
    "latest_order_per_customer",
    "left_join_enrich",
    "lsh_bucket_candidates",
    "minhash_banded_candidates",
    "not_cancelled",
    "order_key_list",
    "order_value_bounds",
    "priority_line_distribution",
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
