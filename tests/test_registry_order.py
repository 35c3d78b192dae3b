"""Driver-gate ordering contract for the query registry.

The driver's correctness gate verifies a bounded prefix of ``queries()``
(50 entries per round), so insertion order is load-bearing. The policy is
re-derived EVERY round (round-5 verdict item 2 made this a checklist item);
this file pins the CURRENT round's rotation so a code change that silently
reorders the registry fails loudly.

Round-6 policy (VERDICT r5 items 1/2/7): the window must seat (a) every
query repaired by the load_events precision fix, (b) the two round-5 plan
rewrites that shipped without driver rows, (c) ALL rows-only queries — 17
of 19 had never had even a rows>0 driver record — and (d) the flagship.
Seating rows-only queries costs oracle slots this round by design; the
backfill tier keeps the remaining slots on the stalest oracle coverage.
"""

from pyspark_retention_pipeline_spark.registry import (
    _FRONT,
    all_oracle_sql,
    all_queries,
)

DRIVER_WINDOW = 50

# (a) every consumer of load_events — all were broken or suspect under the
# round-5 ns→µs testdata drift and need fresh driver rows post-fix.
EVENT_REPAIRED = {
    "tumbling_hourly",
    "sessionize",
    "sliding_hourly",
    "daily_rollup_from_hourly",
    "event_type_hourly_pivot",
    "range_join_error_context",
    "asof_last_purchase",
    "event_day_spine_fill",
    "signup_purchase_funnel",
    "dau_hll_rollup",
}

# (b) plans rewritten in round 5 with no driver row since the rewrite.
REWRITTEN_R5 = {"customer_rank_family", "top_revenue_suppliers"}

# new queries added this round — never driver-verified, must be seated.
NEW_THIS_ROUND = {
    "cohort_retention",
    "dn_retention",
    "event_transition_matrix",
    "cohort_ltv",
    "source_cap_select",
    "session_funnel",
    "growth_accounting",
    "stickiness_ratio",
    "power_user_curve",
    "session_duration_histogram",
    "time_to_conversion",
    "first_touch_attribution",
    "rolling_7d_revenue",
    "daily_activity_revenue_outer",
    "doc_len_quartiles_by_lang",
    "dup_rate_by_source",
    "group_aware_split",
    # lang_id_confusion was displaced by group_aware_split (rows-only
    # contract (c), late-continuation addition); it rotates in round 7.
    # centroid_inertia was displaced by kmeans_lloyd_curve (rows-only
    # contract (c)); it rotates in round 7 (docs/ROUND7_ROTATION.md).
    # part_cooccurrence was displaced by embedding_pca_topk: the rows-only
    # contract (c) outranks a new oracle-backed query's first driver row —
    # it rotates in round 7 (docs/ROUND7_ROTATION.md).
}

# new this round but NOT seated: the 50-slot window filled with ts-sensitive
# repairs + rows-only firsts; these rotate in next round (parity-green at
# sf0.001/sf0.01 in pytest and sf0.1 in the committed sweep meanwhile).
NEW_UNSEATED = {
    "lang_id_confusion",
    "revenue_mom_growth",
    "variant_props_histogram",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_excess_stock",
    "lateral_recent_orders",
    "revenue_gini",
    "lorenz_deciles",
}

# (d) flagship continuity slot — in the window every round.
FLAGSHIP = {"churn_features"}


def test_front_names_all_exist():
    names = set(all_queries())
    missing = [n for n in _FRONT if n not in names]
    assert not missing, f"_FRONT references unregistered queries: {missing}"


def test_front_fills_driver_window_exactly():
    assert len(_FRONT) == DRIVER_WINDOW
    assert len(set(_FRONT)) == DRIVER_WINDOW
    assert list(all_queries())[:DRIVER_WINDOW] == list(_FRONT)


def test_repaired_and_rewritten_inside_driver_window():
    window = set(list(all_queries())[:DRIVER_WINDOW])
    missing = (EVENT_REPAIRED | REWRITTEN_R5 | NEW_THIS_ROUND | FLAGSHIP) - window
    assert not missing, f"repaired/rewritten queries outside driver window: {missing}"


def test_all_rows_only_queries_inside_driver_window():
    """(c) every rows-only query gets a driver rows>0 record this round —
    17 of 19 have never had one (VERDICT r5 item 7)."""
    ordered = list(all_queries())
    oracles = all_oracle_sql()
    window = set(ordered[:DRIVER_WINDOW])
    rows_only = {n for n in ordered if n not in oracles}
    missing = rows_only - window
    assert not missing, f"rows-only queries outside driver window: {missing}"


def test_oracle_backed_precede_rows_only_after_front():
    ordered = list(all_queries())
    oracles = all_oracle_sql()
    tail = ordered[len(_FRONT):]
    seen_rows_only = False
    for name in tail:
        if name not in oracles:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracle-backed {name!r} registered after a rows-only query"
            )


def test_queries_and_oracles_consistent():
    qs = all_queries()
    oracles = all_oracle_sql()
    assert set(oracles) <= set(qs)
    # Spark fn ordering is what the driver iterates; oracle dict must follow it.
    oracle_order = [n for n in qs if n in oracles]
    assert list(oracles) == oracle_order
