"""Physical-plan inspection helpers (scale hygiene checks)."""

from .inspect import (
    BOUNDED_GRAIN_KEYS,
    SCALING_TABLES,
    explain_str,
    forced_broadcast_tables,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
    shuffle_count,
    unbounded_cross_joins,
    unbounded_hinted_broadcasts,
    unbounded_global_sorts,
    unpartitioned_corpus_windows,
)

__all__ = [
    "BOUNDED_GRAIN_KEYS",
    "SCALING_TABLES",
    "explain_str",
    "forced_broadcast_tables",
    "has_broadcast_join",
    "pushed_filters",
    "scan_columns",
    "shuffle_count",
    "unbounded_cross_joins",
    "unbounded_hinted_broadcasts",
    "unbounded_global_sorts",
    "unpartitioned_corpus_windows",
]
