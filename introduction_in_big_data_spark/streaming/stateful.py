"""Arbitrary-state streaming operators via applyInPandasWithState —
the escape hatch for stateful logic that built-in streaming aggregates
can't express (SURVEY.md §7 Step 5 'hard part #2').

The reference's counters (Part_B.py:90-182) fold each micro-batch into
per-key Python state; this module does the same with managed,
checkpointable GroupState: state lives in the executor state store,
partitioned by key, survives restarts, and merges correctly across
micro-batches — none of which the reference's process-local dicts do.

Scale notes: state is hash-partitioned by the grouping key, so the
operator scales with #keys across executors; per-key state here is a
fixed-width tuple (constant memory). Use RocksDB state store at
production scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = "user_id long, n long, total double, mean double"
_STATE_SCHEMA = "n long, total double"


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n": [n], "total": [total], "mean": [total / n if n else 0.0]}
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Cumulative per-user (count, sum, mean) over `value`, emitted
    once per key per micro-batch in update mode — a custom stateful
    counter in the exact shape of the reference's WithFrequenciesCounter
    (Part_B.py:98-110), with managed state."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_stats_tws(events_stream: DataFrame) -> DataFrame:
    """The same cumulative counter on Spark 4's transformWithState API
    (StatefulProcessor + typed ValueState) — the successor to
    applyInPandasWithState: named state variables instead of one opaque
    tuple, per-variable TTL, timers, and state-schema evolution across
    restarts. Kept semantically identical to running_user_stats so the
    parity test pins both APIs to the same batch result.

    Environment note: executing this requires google.protobuf (the TWS
    driver worker speaks protobuf to the JVM), absent from the test
    container — the parity test import-skips there and the plan-build
    smoke still runs; same gating policy as the JDBC writer."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n": [n],
                    "total": [total],
                    "mean": [total / n if n else 0.0],
                }
            )

        def close(self) -> None:
            pass

    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            _RunningStats(),
            outputStructType=RUNNING_STATS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
