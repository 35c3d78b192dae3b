"""Shared analysis constants.

The reference pipeline is parameterized by a churn *cutoff* timestamp plus a
lookahead window (reference ``pipeline/etl.py:53-60``, ``Makefile:4-5``:
cutoff 2011-06-12, lookahead 180 d, recent-activity window 90 d). The driver
testdata's ``orders`` span 1995-01-01 .. 2001-08-01, so we pin an equivalent
cutoff in the middle of that range. All literals are precomputed here as
strings so the Spark plans and the DuckDB oracle SQL share *identical*
timestamp constants (no interval arithmetic that could diverge between
engines).
"""

from __future__ import annotations

from datetime import datetime, timedelta

# End of the observable history window (inclusive).
CUTOFF_DT = datetime(2000, 1, 1, 0, 0, 0)
# Customers with no order inside (cutoff, cutoff + LOOKAHEAD] are labeled churned.
LOOKAHEAD_DAYS = 180
# "Recent activity" features look back this many days from the cutoff.
RECENT_DAYS = 90

CUTOFF = CUTOFF_DT.strftime("%Y-%m-%d %H:%M:%S")
CUTOFF_DATE = CUTOFF_DT.strftime("%Y-%m-%d")
LOOKAHEAD_END = (CUTOFF_DT + timedelta(days=LOOKAHEAD_DAYS)).strftime("%Y-%m-%d %H:%M:%S")
RECENT_START = (CUTOFF_DT - timedelta(days=RECENT_DAYS)).strftime("%Y-%m-%d %H:%M:%S")

# Decision threshold used by point-metric queries (reference best threshold
# 0.46 — ``data/models/latest_model/metrics.json:6``).
DEFAULT_THRESHOLD = 0.46
