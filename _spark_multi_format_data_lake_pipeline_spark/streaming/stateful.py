"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2 Part B 'Streaming': custom stateful operators; build brief:
``applyInPandasWithState`` for custom stateful operators).

``running_user_totals`` maintains per-user running aggregates (event count,
value sum, last seen timestamp) across micro-batches — the canonical
arbitrary-stateful shape that window/session built-ins can't express.

State size is bounded by the user-key cardinality; with a processing-time
timeout idle users are evicted (GroupStateTimeout.ProcessingTimeTimeout),
which is what keeps this viable over an unbounded key space at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _make_update_totals(idle_timeout_ms: int | None):
    def _update_totals(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return _update_totals


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually execute.

    The Spark 4 transformWithState Python runner talks to the JVM state
    server over a protobuf protocol; without the ``protobuf`` package the
    driver worker crashes at state-schema validation
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). Probe the import so
    callers can fall back to ``running_user_totals`` (the
    applyInPandasWithState path, which has no such dependency).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals_tws(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Per-user running totals on the Spark 4 transformWithState API.

    Same semantics as ``running_user_totals`` but on the successor API:
    named state variables (``getValueState``) instead of one opaque state
    tuple, per-state TTL instead of per-key timeouts, and RocksDB-backed
    state (the caller must set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``RocksDBStateStoreProvider``, which transformWithState requires).
    TTL is the scale knob: on an unbounded key space the state store only
    retains users seen within ``ttl_ms``.

    Constructing the plan needs no protobuf; starting the query does —
    check ``tws_available()`` first and fall back to
    ``running_user_totals`` when it is False.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            if ttl_ms is not None:
                self._totals = handle.getValueState("totals", STATE_SCHEMA, ttl_ms)
            else:
                self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running totals, updated every micro-batch.

    ``idle_timeout_ms`` enables ProcessingTimeTimeout eviction of idle
    users — REQUIRED on a continuous production stream over unbounded
    keys, but left off by default because a one-shot AvailableNow drain
    ends with a state-cleanup trigger that spins until the wall-clock
    timeout fires (observed: the query never terminates).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_totals(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
