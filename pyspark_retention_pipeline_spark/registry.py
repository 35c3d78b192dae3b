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
# ``queries()`` (50 entries per round), so ordering is part of the contract.
# Round-4 rotation (VERDICT r3 item 1 + round-3 advisor item 3): the window
# leads with the 17 oracle-backed queries that have never had a driver row
# (the 5 round-3 late additions plus this round's 12 — landing these
# completes all-time driver coverage of every oracle-backed query), then
# the 2 queries whose
# implementation changed this round, the flagship continuity slot, the
# pinned extension tier, and 12 slots refreshing the OLDEST coverage (green
# only in round 1, unchecked since). Everything else keeps registration
# order, with oracle-backed queries before rows-only ones so no verifiable
# query is ever displaced by an unverifiable one.
_FRONT: tuple[str, ...] = (
    # --- never driver-verified: round-3 late additions ---
    "ngram_contamination",
    "token_budget_select",
    "lang_mix_sample",
    "train_val_test_split",
    "large_volume_customers",
    # --- never driver-verified: round-4 additions ---
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
    # --- implementation changed in round 4 — need fresh rows ---
    "pack_documents",  # hash-bucket sharding + dense pack ids
    "skew_salted_segment_counts",  # salted_join alias normalization
    # --- flagship continuity slot ---
    "churn_features",
    # --- pinned extension tier (re-verified every round) ---
    "dedup_exact",
    "word_jaccard_pairs",
    "text_stats",
    "knn_bruteforce",
    "embedding_neardup",
    "tumbling_hourly",
    "sessionize",
    "json_props",
    "monthly_revenue",
    "rollup_revenue",
    "hash_sample",
    "binary_meta",
    "repetition_stats",
    "pii_scrub",
    "c4_quality_filter",
    "chunk_documents",
    "embedding_quantize_stats",
    "top_parts_per_segment",
    # --- oldest-coverage refresh: green in round 1 only, unchanged since ---
    "valid_lines",
    "order_rollup",
    "customer_rfm",
    "distinct_products",
    "distinct_customers",
    "customer_profile",
    "p99_quantile",
    "purchase_gaps",
    "threshold_curve",
    "confusion_matrix",
    "class_counts",
    "class_weights",
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
