"""Driver-gate ordering contract for the query registry.

The driver's correctness gate verifies a bounded prefix of ``queries()``
(50 entries per round), so insertion order is load-bearing. The policy is
re-derived EVERY round (round-5 verdict item 2 made this a checklist item).

Since round 8 the window is GENERATED: ``scripts/derive_front.py`` computes
it from the committed ``CORRECTNESS_r0*.json`` driver artifacts plus the
script's small per-round config, and the anchor test here asserts
``registry._FRONT`` equals the script's output — a hand edit to either side
that diverges fails loudly (VERDICT r7 item 7).

Round-14 policy (docs/ROUND14_ROTATION.md): (a) the changed tier —
bm25_topk (vocab-broadcast fix + oracle association byte-match),
basket_lift (part-grain support hints dropped), mmr_rerank (per-round
checkpoint pin), ivf_pq_recall (pq_residual IVFADC variant — schema
change), theilsen_revenue_trend (approx-bracket exact median); (b) never-verified backlog — the three round-14 additions plus
quality_classifier_scores, the one rows-only name with no driver row
ever, seated once now that the tier accepts rows-only registrations
(round-13 ADVICE item 2); (c) the flagship; (d) stalest-green backfill:
the thirteen-name r8-tier remainder (round 13's DEFERRED_TO_R14) and 28
of the r9 tier through priority_line_distribution, moving the staleness
floor to r9.
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

# (a) implementation changed in round 14 — plan-change rule makes seating
# mandatory (round-5 lesson). Update the moment a registered plan changes.
CHANGED_R14: set[str] = {
    "bm25_topk",  # vocab-grain df semi-joined to query tokens, hint dropped
    "basket_lift",  # part-grain support broadcast hints dropped
    "mmr_rerank",  # per-round localCheckpoint pin (census 361 -> 0)
    "ivf_pq_recall",  # pq_residual IVFADC variant (schema change)
    "theilsen_revenue_trend",  # approx-bracket exact-median recipe
}

# (b) never-driver-verified backlog: round-14 additions plus the ONE
# rows-only name with no driver row ever (round-13 ADVICE item 2 — the
# tier now seats rows-only registrations once).
BACKLOG_R14: set[str] = {
    "neardup_edit_verify",  # new in round 14 (Levenshtein verify rung)
    "retrieval_graded_metrics",  # new in round 14 (MRR/nDCG scorecard)
    "quality_classifier_scores",  # rows-only seat (no driver row before)
    "packing_efficiency_report",  # new in round 14 (truncation-loss scorecard)
}

# (c) flagship continuity slot — in the window every round.
FLAGSHIP = {"churn_features"}

# Boundary-tier backfill deferred to round 15: the changed-tier and
# never-verified seats leave 42 backfill seats, absorbing the whole
# thirteen-name r8 remainder plus 29 of the r9 tier (through
# recent90_agg); the next r9 names in (round, name) order lead the
# round-15 pool — the boundary test below checks they stay outside this
# round's window.
DEFERRED_TO_R15 = {
    "recent90_agg",  # r9 tier past priority_line_distribution
    "recent_window",
    "regex_token_count",
    "retained_buyers_intersect",
    "returned_parts_distinct",
    "revenue_by_nation",
    "revenue_share",
    "running_total",
    "salted_supplier_agg",
    "segment_case",
    "segment_metrics_unpivot",
    "sql_expr_filter",
    "string_ops",
    "supplier_balance_by_nation",
    "threshold_pred",
    "threshold_sweep",
    "token_classes",
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
    missing = (CHANGED_R14 | BACKLOG_R14 | FLAGSHIP) - window
    assert not missing, f"mandatory seats outside driver window: {missing}"


def test_backlog_is_oracle_backed():
    """Backlog entries carry oracles, with ONE documented exception this
    round: quality_classifier_scores is rows-only BY DESIGN (MLlib
    training — not SQL-expressible; pinned by planted-separability and
    LM-agreement tests) and is seated once for its first-ever driver row
    (round-13 ADVICE item 2). Everything else must be oracle-backed — a
    rows-only seat is otherwise a burnt slot."""
    missing = BACKLOG_R14 - set(all_oracle_sql())
    assert missing == {"quality_classifier_scores"}, (
        f"unexpected rows-only backlog entries: {missing}"
    )


def test_deferred_backfill_outside_window():
    qs = all_queries()
    assert DEFERRED_TO_R15 <= set(qs)
    window = set(list(qs)[:DRIVER_WINDOW])
    overlap = DEFERRED_TO_R15 & window
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
    import importlib.util

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

    # bench._load_baseline is the single implementation of "newest USABLE
    # driver artifact": it skips parsed: null payloads (the round-8
    # artifact's truncated-line case — data.get("parsed", data) returned
    # None here and this test crashed with AttributeError, round-8 ADVICE
    # item 2) and falls back to the newest parseable round.
    baseline, _baseline_round = bench._load_baseline()
    if baseline is None:
        return
    base_q = baseline.get("queries", {})

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
