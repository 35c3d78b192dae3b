"""Data-quality checks (deequ-style declarative validation)."""

from .checks import (
    CheckResult,
    check_accepted_values,
    check_complete,
    check_range,
    check_referential,
    check_unique,
    run_checks,
)

__all__ = [
    "CheckResult",
    "check_accepted_values",
    "check_complete",
    "check_range",
    "check_referential",
    "check_unique",
    "run_checks",
]
