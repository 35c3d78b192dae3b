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
# ``queries()`` (50 entries in round 1), so ordering is part of the contract:
# the extension tier (dedup / similarity / text / events / analytics) goes
# first — it received zero hard-signal rows in round 1 purely because it
# registered after position 50 — followed by a representative core slice.
# Everything else keeps registration order, with oracle-backed queries before
# rows-only ones so no verifiable query is ever displaced by an unverifiable
# one.
_FRONT: tuple[str, ...] = (
    # dedup + text analysis (documents table)
    "dedup_exact",
    "dedup_keep_first",
    "word_jaccard_pairs",
    "doc_fingerprint",
    "text_stats",
    "token_classes",
    "lang_stats",
    "quality_score",
    "lang_id_heuristic",
    "token_topk",
    "tfidf_top_terms",
    # similarity search (embeddings table)
    "embedding_norms",
    "knn_bruteforce",
    "embedding_neardup",
    "label_centroids",
    # event-time analytics (events table)
    "tumbling_hourly",
    "sliding_hourly",
    "sessionize",
    "json_props",
    "event_type_hourly_pivot",
    "signup_purchase_funnel",
    "json_typed_parse",
    "range_join_error_context",
    "daily_rollup_from_hourly",
    "event_type_map_summary",
    "asof_last_purchase",
    # TPC-H-shaped analytics
    "rollup_revenue",
    "monthly_revenue",
    "customer_rank_family",
    "salted_supplier_agg",
    "segment_metrics_unpivot",
    "retained_buyers_intersect",
    "inactive_customers_except",
    "string_ops",
    "cube_status_priority",
    "order_value_bounds",
    # sampling + multimodal plumbing
    "hash_sample",
    "binary_meta",
    # round-2 extension additions (text quality, chunking, quantization)
    "repetition_stats",
    "pii_scrub",
    "regex_token_count",
    "c4_quality_filter",
    "chunk_documents",
    "pack_documents",
    "embedding_quantize_stats",
    # representative core slice: the flagship + TPC-H Q1 + three queries
    # whose forced customer-broadcast was removed this round (their green
    # rows prove the de-hint preserved results under the driver's gate)
    "churn_features",
    "pricing_summary",
    "revenue_by_nation",
    "revenue_share",
    "top_parts_per_segment",
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
