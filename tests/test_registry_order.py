"""Driver-gate ordering contract for the query registry.

The driver's correctness gate verifies a bounded prefix of ``queries()``
(50 entries per round), so insertion order is load-bearing. The policy is
re-derived EVERY round (round-5 verdict item 2 made this a checklist item);
this file pins the CURRENT round's rotation so a code change that silently
reorders the registry fails loudly.

Round-7 policy (VERDICT r6 items 1/2/3 + docs/ROUND7_ROTATION.md): the
window must seat (a) every query whose implementation changed this round —
the three canonicalizer-crashing queries rebuilt as scalar oracle-backed
forms, plus simhash_candidates and every composer of the now-bounded
simhash_candidate_frame — and (b) the flagship; every remaining slot burns
down the never-driver-verified oracle-backed backlog, oldest first.
"""

from pyspark_retention_pipeline_spark.registry import (
    _FRONT,
    all_oracle_sql,
    all_queries,
)

DRIVER_WINDOW = 50

# (a) implementation changed in round 7 — plan-change rule makes seating
# mandatory (round-5 lesson).
CHANGED_R7 = {
    # round-6 red rows rebuilt: scalar outputs, portable-hash oracles
    "minhash_signatures",
    "simhash64",
    "winnowing_fingerprints",
    # hot-bucket bound in simhash_candidate_frame + its composers
    "simhash_candidates",
    "simhash_jaccard_verify",
    "split_leakage_check",
    "source_overlap_matrix",
    "group_aware_split",
    # salted two-stage per-group top-k (round-6 verdict watch item 8);
    # output-identical to the single-window form, but the plan changed
    "top_parts_per_segment",
}

# The three rebuilt queries must now be oracle-backed (the round-6 forms
# were rows-only AND crashed the driver's canonicalizer).
UPGRADED_TO_ORACLE = {"minhash_signatures", "simhash64", "winnowing_fingerprints"}

# (b) flagship continuity slot — in the window every round.
FLAGSHIP = {"churn_features"}

# Deferred never-verified backlog (bottom of the rotation-doc order) — these
# lead the round-8 window; pinned here so the round-8 rotation starts from a
# checked list instead of re-deriving it from memory.
DEFERRED_TO_R8 = {
    "user_value_twap",  # yielded its slot to the top_parts_per_segment seat
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
}


def test_front_names_all_exist():
    names = set(all_queries())
    missing = [n for n in _FRONT if n not in names]
    assert not missing, f"_FRONT references unregistered queries: {missing}"


def test_front_fills_driver_window_exactly():
    assert len(_FRONT) == DRIVER_WINDOW
    assert len(set(_FRONT)) == DRIVER_WINDOW
    assert list(all_queries())[:DRIVER_WINDOW] == list(_FRONT)


def test_changed_and_flagship_inside_driver_window():
    window = set(list(all_queries())[:DRIVER_WINDOW])
    missing = (CHANGED_R7 | FLAGSHIP) - window
    assert not missing, f"changed-plan queries outside driver window: {missing}"


def test_rebuilt_queries_are_oracle_backed():
    oracles = all_oracle_sql()
    missing = UPGRADED_TO_ORACLE - set(oracles)
    assert not missing, f"rebuilt queries lost their oracle: {missing}"


def test_deferred_backlog_is_registered_and_oracle_backed():
    qs, oracles = all_queries(), all_oracle_sql()
    assert DEFERRED_TO_R8 <= set(qs)
    # group_aware_split-style rows-only ops are not in this tier by design.
    missing = DEFERRED_TO_R8 - set(oracles)
    assert not missing, f"deferred backlog entries missing oracles: {missing}"
    # Deferral means NOT in this round's window.
    window = set(list(qs)[:DRIVER_WINDOW])
    overlap = DEFERRED_TO_R8 & window
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
