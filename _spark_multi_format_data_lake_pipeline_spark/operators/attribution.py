"""Multi-touch attribution: distribute conversion credit across the
touchpoints that preceded each conversion.

q90/q151 answer "did a click lead to this purchase" (single-touch,
stream-stream join); marketing analytics wants the general form: every
conversion looks back over ALL its touches within a window and splits
one unit of credit per a model:

- ``first``  — 100% to the earliest touch,
- ``last``   — 100% to the latest touch,
- ``linear`` — 1/n to each of the n touches,
- ``u``      — 40% first, 40% last, 20% spread over the middle
  (position-based / U-shaped; 50/50 with two touches, 100% with one).

Credit per conversion always sums to exactly 1 (property-tested), so
total credit == number of attributed conversions.

Scale shape: conversions ⋈ touches is a per-user equi-join with a time
range predicate — fan-out bounded by touches-per-user-per-window, never
cross-user; the per-conversion position window is bounded the same way.
At extreme windows use ``operators/joins.py::binned_range_join`` for
the candidate step; the credit math is unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MODELS = ("first", "last", "linear", "u")


def multi_touch_credits(
    events: DataFrame,
    model: str = "linear",
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 24 * 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(channel, n_touches, credit): per touch-type totals of attributed
    conversion credit under ``model``. A touch qualifies when it is the
    same user's event strictly before the conversion and at most
    ``lookback_seconds`` earlier; conversions with no qualifying touch
    contribute nothing (report them via q98's funnel counts). Ties on
    touch timestamp break by event id, so credit assignment is
    deterministic."""
    if model not in _MODELS:
        raise ValueError(f"unknown attribution model {model!r}; pick from {_MODELS}")

    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_cu"),
        F.col(ts_col).alias("_cts"),
        F.col(id_col).alias("_cid"),
    )
    touch = events.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("_tu"),
        F.col(ts_col).alias("_tts"),
        F.col(id_col).alias("_tid"),
        F.col(type_col).alias("channel"),
    )
    lb = F.col("_cts") - F.expr(f"INTERVAL {int(lookback_seconds)} SECONDS")
    j = conv.join(
        touch,
        (F.col("_cu") == F.col("_tu"))
        & (F.col("_tts") < F.col("_cts"))
        & (F.col("_tts") >= lb),
    )

    w = Window.partitionBy("_cid").orderBy("_tts", "_tid")
    pos = F.row_number().over(w)
    n = F.count(F.lit(1)).over(
        Window.partitionBy("_cid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    if model == "first":
        weight = F.when(pos == 1, 1.0).otherwise(0.0)
    elif model == "last":
        weight = F.when(pos == n, 1.0).otherwise(0.0)
    elif model == "linear":
        weight = F.lit(1.0) / n
    else:  # u-shaped
        weight = (
            F.when(n == 1, 1.0)
            .when(n == 2, 0.5)
            .when(pos == 1, 0.4)
            .when(pos == n, 0.4)
            .otherwise(F.lit(0.2) / (n - 2))
        )

    return (
        j.select("channel", weight.alias("_w"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.round(F.sum("_w"), 6).alias("credit"),
        )
    )
