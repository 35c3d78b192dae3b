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


# --- Spark 4 transformWithStateInPandas (the successor API) ----------------
#
# applyInPandasWithState (above) is the Spark 3.x-era escape hatch; Spark 4
# replaces it with StatefulProcessor + typed state variables (ValueState /
# ListState / MapState, per-key timers, state TTL). Covering both keeps the
# engine current: new pipelines should write processors, existing ones keep
# running.

try:  # pragma: no cover - import guard exercised via module import
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # The transformWithState Python worker speaks protobuf to the JVM state
    # server; without a functional google.protobuf the streaming runner
    # crashes at init ([STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE]).
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS = True
except ImportError:  # pyspark < 4.0, or protobuf missing in this env
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment,misc]
    HAS_TWS = False


class UserActivityProcessor(StatefulProcessor):
    """Per-user lifetime activity profile with typed state: a ValueState
    holds (n_events, sum_value, n_purchases); each micro-batch folds its
    rows in and emits the refreshed profile. State is partitioned by key in
    the state store exactly like the old API — the win is typed composite
    state without manual tuple packing in a single opaque blob, plus
    first-class TTL/timer hooks when eviction policies are needed."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "profile",
            T.StructType(
                [
                    T.StructField("n", T.LongType()),
                    T.StructField("v", T.DoubleType()),
                    T.StructField("p", T.LongType()),
                ]
            ),
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, v, p = self._state.get() if self._state.exists() else (0, 0.0, 0)
        for pdf in rows:
            n += len(pdf)
            v += float(pdf["value"].sum())
            p += int((pdf["event_type"] == "purchase").sum())
        self._state.update((n, v, p))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(v, 2)],
                "n_purchases": [p],
            }
        )

    def close(self) -> None:
        pass


PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("n_purchases", T.LongType()),
    ]
)


def user_activity_profile(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user activity profile via Spark 4's
    ``transformWithStateInPandas`` (StatefulProcessor + ValueState)."""
    if not HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires pyspark >= 4.0 and a "
            "functional google.protobuf (the state-server wire protocol)"
        )
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        UserActivityProcessor(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
