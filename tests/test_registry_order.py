"""Driver-gate ordering contract for the query registry.

The driver's correctness gate verifies a bounded prefix of ``queries()``
(50 entries in round 1), so insertion order is load-bearing: every slot in
the window must be oracle-backed (hard-verifiable), and the extension tier
(dedup / similarity / text / events) must sit inside the window.
"""

from pyspark_retention_pipeline_spark.registry import (
    _FRONT,
    all_oracle_sql,
    all_queries,
)

DRIVER_WINDOW = 50

EXTENSION_MUST_BE_IN_WINDOW = {
    "dedup_exact",
    "word_jaccard_pairs",
    "knn_bruteforce",
    "embedding_neardup",
    "sessionize",
    "tumbling_hourly",
    "json_props",
    "text_stats",
    "monthly_revenue",
    "rollup_revenue",
    "hash_sample",
    "binary_meta",
    # round-2 extension additions
    "repetition_stats",
    "pii_scrub",
    "c4_quality_filter",
    "chunk_documents",
    "pack_documents",
    "embedding_quantize_stats",
    # de-hinted query kept in-window as broadcast-removal proof
    "top_parts_per_segment",
}

# Round-4 rotation (VERDICT r3 item 1): queries with no driver row in any
# round — or whose implementation changed this round — must occupy window
# slots until CORRECTNESS_r04 lands their green rows.
ROTATION_MUST_BE_IN_WINDOW = {
    # never verified: round-3 late additions
    "ngram_contamination",
    "token_budget_select",
    "lang_mix_sample",
    "train_val_test_split",
    "large_volume_customers",
    # never verified: round-4 additions
    "curate_corpus",
    "parquet_roundtrip_revenue",
    "incremental_dedup",
    "source_mix_report",
    "token_len_histogram",
    "epoch_shuffle",
    "quality_budget_select",
    "media_embed_knn",
    "local_supplier_volume",
    "forecast_revenue_discount",
    "product_type_profit",
    "waiting_suppliers",
    # implementation changed in round 4
    "pack_documents",
    "skew_salted_segment_counts",
    # flagship continuity
    "churn_features",
}


def test_front_names_all_exist():
    names = set(all_queries())
    missing = [n for n in _FRONT if n not in names]
    assert not missing, f"_FRONT references unregistered queries: {missing}"


def test_driver_window_is_fully_oracle_backed():
    ordered = list(all_queries())
    oracles = all_oracle_sql()
    window = ordered[:DRIVER_WINDOW]
    unverifiable = [n for n in window if n not in oracles]
    assert not unverifiable, (
        f"rows-only queries occupy driver correctness slots: {unverifiable}"
    )


def test_extension_tier_inside_driver_window():
    window = set(list(all_queries())[:DRIVER_WINDOW])
    missing = EXTENSION_MUST_BE_IN_WINDOW - window
    assert not missing, f"extension queries outside driver window: {missing}"


def test_rotation_debt_inside_driver_window():
    window = set(list(all_queries())[:DRIVER_WINDOW])
    missing = ROTATION_MUST_BE_IN_WINDOW - window
    assert not missing, f"unverified/stale queries outside driver window: {missing}"


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
