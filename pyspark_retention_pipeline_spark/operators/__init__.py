"""Operator modules — importing this package registers every query.

Grouped by SURVEY.md §2 families:
  * :mod:`.filters`    — projections / filters / predicates (P1-P15)
  * :mod:`.aggregates` — hash aggregations (A1-A10)
  * :mod:`.joins`      — equi/semi/anti joins with broadcast hints (J1-J4)
  * :mod:`.windows`    — window functions, sorts, top-k (W1, O1-O3)
  * :mod:`.threshold`  — single-pass threshold sweep + confusion matrix (M9, A7)
  * :mod:`.retention`  — the flagship churn feature DAG (reference etl parity)
  * :mod:`.events`     — event-time windowing / sessionization / JSON props
  * :mod:`.engagement` — growth accounting, stickiness, conversion latency
  * :mod:`.text`       — text analysis + exact/near dedup over documents
  * :mod:`.curation`   — corpus curation: contamination scan, token budgets
  * :mod:`.similarity` — embedding similarity search
  * :mod:`.mlops`      — MLlib pipeline queries (rows-only checks)
  * :mod:`.multimodal` — binary-column plumbing with stubbed decoders
"""

from . import (  # noqa: F401
    filters,
    aggregates,
    joins,
    windows,
    threshold,
    retention,
    events,
    engagement,
    timeseries,
    tpch_extra,
    tpch_partsupp,
    text,
    text_quality,
    tokenizer,
    chunking,
    curation,
    similarity,
    ivf,
    analytics,
    analytics_extra,
    sampling,
    components,
    sinks,
    upsert,
    udtf_ops,
    mlops,
    multimodal,
)
