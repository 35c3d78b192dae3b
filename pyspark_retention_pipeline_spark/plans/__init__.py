"""Physical-plan inspection helpers (scale hygiene checks)."""

from .inspect import explain_str, has_broadcast_join, pushed_filters, scan_columns

__all__ = ["explain_str", "has_broadcast_join", "pushed_filters", "scan_columns"]
