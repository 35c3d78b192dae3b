"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 extension: arbitrary per-key state beyond built-in windows).

Running per-user event totals: each micro-batch updates a per-user counter
held in Spark's state store and emits the new total. This is the sanctioned
escape hatch when watermarked windows can't express the semantics (counters,
custom sessions, CDC-style reconciliation); state is partitioned by key and
survives across batches (and restarts, with a real checkpoint location).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame({"user_id": [key[0]], "total_events": [n], "total_value": [round(v, 2)]})


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state management."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
