"""Driver-gate ordering contract for the query registry.

The driver's correctness gate verifies a bounded prefix of ``queries()``
(50 entries per round), so insertion order is load-bearing. The policy is
re-derived EVERY round (round-5 verdict item 2 made this a checklist item).

Since round 8 the window is GENERATED: ``scripts/derive_front.py`` computes
it from the committed ``CORRECTNESS_r0*.json`` driver artifacts plus the
script's small per-round config, and the anchor test here asserts
``registry._FRONT`` equals the script's output — a hand edit to either side
that diverges fails loudly (VERDICT r7 item 7).

Round-8 policy (VERDICT r7 items 1/2/4 + docs/ROUND8_ROTATION.md): seat
(a) the fifteen queries whose plan changed this round — shared-frame
pins, the jaccard-verify parity slice, scan-budget fixes, the
lateral_recent_orders global-sort rewrite, and the deep-review fixes
(chain pairs, pinned edge frame, unified gram staging, tfidf rank
determinism); (b) the ENTIRE
never-driver-verified backlog (23 round-7 deferrals + the new
group_split_leakage_audit — the backlog reaches zero for the first time);
(c) the flagship; backfill from the stalest (round-1-verified) tier.
"""

import importlib.util
import os

from pyspark_retention_pipeline_spark.registry import (
    _FRONT,
    all_oracle_sql,
    all_queries,
)

DRIVER_WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (a) implementation changed in round 8 — plan-change rule makes seating
# mandatory (round-5 lesson).
CHANGED_R8 = {
    # shared-frame pins (multi-branch recompute fixes, VERDICT r7 item 2)
    "class_weights",
    "tfidf_top_terms",
    "quality_zscore_by_lang",
    # both-engine deterministic doc_id slice (VERDICT r7 item 5)
    "simhash_jaccard_verify",
    # registry-scan-budget fixes (test_registry_scan_budget): pinned token
    # frame / pinned dedup frame / single-scan IVF candidates
    "word_jaccard_pairs",
    "curate_corpus",
    "ivf_knn",
    # global-sort fix (test_no_unbounded_global_sorts): correlated-LIMIT
    # decorrelation replaced by the explicit partitioned-window form
    "lateral_recent_orders",
    # deep-review fixes: degraded-bucket chain pairs (simhash composers),
    # pinned component edge frame (clustering composers), unified gram
    # staging, tfidf rank-on-rounded determinism
    "simhash_candidates",
    "split_leakage_check",
    "source_overlap_matrix",
    "group_aware_split",
    "dedup_clusters",
    "curate_corpus_neardup",
    "ngram_dup_rate",
}

# (b) the never-driver-verified backlog, all seated this round. The 23
# round-7 deferrals (pinned as DEFERRED_TO_R8 last round) + the new
# oracle-backed split-leakage proof query.
BACKLOG_R8 = {
    "user_value_twap",
    "media_dedup_exact",
    "pipe_sql_revenue_flow",
    "hapax_rate_by_source",
    "pareto_concentration",
    "interarrival_acf",
    "rare_token_rate",
    "theilsen_revenue_trend",
    "psi_price_drift",
    "ks_price_drift",
    "retention_decay_fit",
    "lang_id_confusion",
    "bigram_logprob_score",
    "per_source_sample",
    "embedding_outliers",
    "token_pmi_collocations",
    "locf_fill",
    "dependent_funnel",
    "zorder_scan_revenue",
    "km_session_survival",
    "bootstrap_revenue_ci",
    "ab_conversion_ztest",
    "time_decay_attribution",
    "group_split_leakage_audit",  # new in round 8
    "jsonl_roundtrip_events",  # new in round 8 (format roundtrips)
    "orc_roundtrip_revenue",  # new in round 8 (format roundtrips)
    "csv_roundtrip_customers",  # new in round 8 (format roundtrips)
}

# (c) flagship continuity slot — in the window every round.
FLAGSHIP = {"churn_features"}

# Stalest-tier backfill deferred to round 9 (the 20 round-1-verified names
# the 50-slot window could not hold after the mandatory seats).
DEFERRED_TO_R9 = {
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
}


def _derived_front() -> list[str]:
    spec = importlib.util.spec_from_file_location(
        "derive_front", os.path.join(REPO, "scripts", "derive_front.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.derive_front()


def test_front_matches_derivation_script():
    """The anchor: the pinned window IS the script's output (no hand drift)."""
    assert list(_FRONT) == _derived_front()


def test_front_names_all_exist():
    names = set(all_queries())
    missing = [n for n in _FRONT if n not in names]
    assert not missing, f"_FRONT references unregistered queries: {missing}"


def test_front_fills_driver_window_exactly():
    assert len(_FRONT) == DRIVER_WINDOW
    assert len(set(_FRONT)) == DRIVER_WINDOW
    assert list(all_queries())[:DRIVER_WINDOW] == list(_FRONT)


def test_changed_backlog_and_flagship_inside_driver_window():
    window = set(list(all_queries())[:DRIVER_WINDOW])
    missing = (CHANGED_R8 | BACKLOG_R8 | FLAGSHIP) - window
    assert not missing, f"mandatory seats outside driver window: {missing}"


def test_backlog_is_oracle_backed():
    """The whole backlog must carry oracles — a rows-only seat would burn a
    slot on a weaker check (rows-only ops re-seat only on change)."""
    missing = BACKLOG_R8 - set(all_oracle_sql())
    assert not missing, f"backlog entries missing oracles: {missing}"


def test_deferred_backfill_outside_window():
    qs = all_queries()
    assert DEFERRED_TO_R9 <= set(qs)
    window = set(list(qs)[:DRIVER_WINDOW])
    overlap = DEFERRED_TO_R9 & window
    assert not overlap, f"deferred entries unexpectedly seated: {overlap}"


def test_no_array_typed_output_in_driver_window():
    """The driver canonicalizes results with pandas sort_values, which
    throws on list cells (CORRECTNESS_r06's three red rows). Guard the whole
    seated window against array/map/struct output columns."""
    import pyspark.sql.types as T

    from pyspark_retention_pipeline_spark.session import get_spark

    spark = get_spark("registry-order-tests", shuffle_partitions=4)
    qs = all_queries()
    bad: list[str] = []
    for name in _FRONT:
        schema = qs[name](spark, "/root/testdata/sf0.001").schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"driver-window queries emit non-scalar columns: {bad}"


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


def test_changed_headline_queries_marked_not_like_for_like():
    """Round-8 review finding, made a standing invariant: a plan-changed
    query that is in bench's HEADLINE set AND has a timing in the latest
    driver-recorded BENCH artifact must be listed in bench's
    NOT_LIKE_FOR_LIKE map — otherwise its ratio is an algorithm/plan
    comparison silently folded into the like-for-like total (the round-7
    simhash64 false-regression mode)."""
    import glob
    import importlib.util
    import json
    import re

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    front_spec = importlib.util.spec_from_file_location(
        "derive_front", os.path.join(REPO, "scripts", "derive_front.py")
    )
    front = importlib.util.module_from_spec(front_spec)
    front_spec.loader.exec_module(front)

    rounds = []
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    if not rounds:
        return
    with open(max(rounds)[1]) as f:
        data = json.load(f)
    base_q = data.get("parsed", data).get("queries", {})

    offenders = [
        name
        for name in front.CHANGED
        if name in bench.HEADLINE
        and name in base_q
        and name not in bench.NOT_LIKE_FOR_LIKE
    ]
    assert not offenders, (
        f"plan-changed headline queries with a baseline row missing from "
        f"bench.NOT_LIKE_FOR_LIKE: {offenders}"
    )
