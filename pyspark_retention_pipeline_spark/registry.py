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
# Round-7 rotation (VERDICT r6 items 1/2/3 + docs/ROUND7_ROTATION.md): the
# window leads with the queries whose IMPLEMENTATION changed this round —
# the three canonicalizer-crashing array-output queries rebuilt as scalar
# oracle-backed forms (the only red rows in CORRECTNESS_r06), plus
# simhash_candidates and its four composers, whose candidate-generation plan
# gained the hot-bucket bound — then burns every remaining slot on the
# never-driver-verified oracle-backed backlog, OLDEST FIRST per the rotation
# doc. The mandatory changed-plan seats (items 1/3) cost 7 slots the
# backfill tier would otherwise use, so the backlog lands at 22 (item 2
# aimed for <= 18 — not reachable while honoring the plan-change rule; the
# 22 deferred queries stay pytest-parity- and sweep-green and lead round 8).
_FRONT: tuple[str, ...] = (
    # --- changed this round (plan-change rule): the 3 round-6 red rows,
    #     rebuilt with scalar outputs + portable-hash oracles ---
    "minhash_signatures",
    "simhash64",
    "winnowing_fingerprints",
    # --- changed this round: hot-bucket bound in the simhash candidate
    #     join (VERDICT r6 item 3) — the query and every composer of
    #     simhash_candidate_frame re-verify ---
    "simhash_candidates",
    "simhash_jaccard_verify",
    "split_leakage_check",
    "source_overlap_matrix",
    "group_aware_split",  # rows-only; re-seats on change per contract
    # --- changed this round: salted two-stage per-group top-k (round-6
    #     verdict watch item 8) — output-identical, plan changed ---
    "top_parts_per_segment",
    # --- never driver-verified oracle-backed backlog, oldest first
    #     (docs/ROUND7_ROTATION.md order; cut from the bottom) ---
    "revenue_mom_growth",
    "variant_props_histogram",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_excess_stock",
    "lateral_recent_orders",
    "revenue_gini",
    "lorenz_deciles",
    "part_cooccurrence",
    "centroid_inertia",
    "cumulative_new_users",
    "daily_anomaly_zscore",
    "weekday_hour_heatmap",
    "top_session_paths",
    "source_temperature_weights",
    "rfm_segments",
    "unigram_logprob_score",
    "heavy_hitter_tokens",
    "basket_lift",
    "bounce_rate_daily",
    "weighted_doc_sample",
    "udtf_sentence_split",
    "merge_upsert_snapshot",
    "scd2_order_versions",
    "cdc_multi_action_apply",
    "revenue_trend_forecast",
    "nation_revenue_trend",
    "user_type_entropy",
    "dq_constraint_report",
    "join_key_skew_profile",
    "recursive_month_spine",
    "winsorized_spend_stats",
    "ngram_dup_rate",
    "prefix_edit_distance_pairs",
    "audience_overlap",
    "retention_by_first_touch",
    "bucketed_join_revenue",
    "partition_pruned_revenue",
    "snapshot_diff_summary",
    # user_value_twap /
    # media_dedup_exact / pipe_sql_revenue_flow / hapax_rate_by_source /
    # pareto_concentration / interarrival_acf / rare_token_rate /
    # theilsen_revenue_trend / psi_price_drift / ks_price_drift /
    # retention_decay_fit / lang_id_confusion / bigram_logprob_score /
    # per_source_sample / embedding_outliers / token_pmi_collocations /
    # locf_fill / dependent_funnel / zorder_scan_revenue /
    # km_session_survival / bootstrap_revenue_ci / ab_conversion_ztest /
    # time_decay_attribution (23) didn't fit the 50-slot window after the
    # mandatory changed-plan seats (user_value_twap yielded its slot to the
    # late top_parts_per_segment plan change); all are pytest-parity-green
    # at sf0.001/sf0.01 and sweep-green at sf0.1, and lead the round-8
    # window.
    # --- flagship continuity slot ---
    "churn_features",
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
