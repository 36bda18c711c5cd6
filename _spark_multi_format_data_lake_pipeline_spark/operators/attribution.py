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


def journey_transitions(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(from_state, to_state, n) — first-order journey transitions with
    the Markov-attribution pseudo-states: each user's event stream is
    segmented into JOURNEYS (a conversion ends one), every journey
    contributes START -> first touch, touch -> touch, and last touch ->
    CONV (journey converted) or -> NULL (stream ended unconverted; the
    standard non-conversion absorbing state). Touchless conversions
    contribute START -> CONV. Event types outside touch/conversion are
    ignored. One shuffle to the user grain — the window that orders each
    user's stream is the only data-sized work; the output is
    (|channels|+2)^2 rows at most.

    This is the distributed core of ``markov_attribution`` — split out
    so a SQL oracle can hash-check it (q203); q158's plain transition
    matrix has no journey segmentation and no absorbing states."""
    keep = events.filter(
        F.col(type_col).isin([conversion_type, *touch_types])
    ).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_t"),
    )
    w = Window.partitionBy("_u").orderBy("_ts", "_id")
    is_conv = (F.col("_t") == conversion_type).cast("int")
    # journey id = number of conversions STRICTLY BEFORE this event, so a
    # conversion terminates its own journey
    journey = F.sum(is_conv).over(w.rowsBetween(Window.unboundedPreceding, -1))
    tagged = keep.withColumn("_j", F.coalesce(journey, F.lit(0)))

    wj = Window.partitionBy("_u", "_j").orderBy("_ts", "_id")
    nxt = F.lead("_t").over(wj)
    prv = F.lag("_t").over(wj)
    frm = F.when(prv.isNull(), F.lit("START")).otherwise(prv)
    to = F.col("_t")
    # per event: (prev-or-START -> me); plus for the LAST event of a
    # journey that is a TOUCH, (me -> NULL) — an unconverted dead end
    steps = tagged.select(frm.alias("from_state"), to.alias("to_state"))
    dead_ends = (
        tagged.withColumn("_nxt", nxt)
        .filter(F.col("_nxt").isNull() & (F.col("_t") != conversion_type))
        .select(
            F.col("_t").alias("from_state"), F.lit("NULL").alias("to_state")
        )
    )
    return (
        steps.withColumn(
            "to_state",
            F.when(F.col("to_state") == conversion_type, F.lit("CONV")).otherwise(
                F.col("to_state")
            ),
        )
        .unionByName(dead_ends)
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def markov_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Data-driven multi-touch attribution via Markov removal effects
    (Anderl et al. 2016) — the model-based alternative to the q181/q182
    position heuristics: fit the first-order journey chain
    (``journey_transitions``), compute the absorption probability of
    CONV from START, then for each channel remove it (transitions into
    it re-route to the NULL absorber) and measure how much conversion
    probability disappears. credit_c = removal_effect_c normalized over
    channels.

    Division of labor: Spark counts transitions (the data-sized pass,
    one user-keyed window); the absorption solves are numpy over a
    (|channels|+1)^2 matrix on the driver — k is a handful of channels,
    never data-sized. Returns (channel, removal_effect, credit) rounded
    to 6."""
    import numpy as np

    rows = journey_transitions(
        events, conversion_type, touch_types,
        user_col, ts_col, type_col, id_col,
    ).collect()
    counts: dict[tuple[str, str], int] = {
        (r["from_state"], r["to_state"]): int(r["n"]) for r in rows
    }
    channels = sorted({f for f, _ in counts} - {"START"})
    transient = ["START", *channels]
    idx = {s: i for i, s in enumerate(transient)}

    def absorption_p(removed: str | None) -> float:
        k = len(transient)
        Q = np.zeros((k, k))
        r_conv = np.zeros(k)
        for (f, t), n in counts.items():
            if f == removed:
                continue
            i = idx[f]
            if t == removed:
                continue  # re-routed to NULL: simply absent from Q and R
            if t == "CONV":
                r_conv[i] += n
            elif t in idx:
                Q[i, idx[t]] += n
        # row-normalize by the ORIGINAL out-degree (including removed /
        # NULL targets) so removed mass becomes NULL absorption
        for f_state in transient:
            i = idx[f_state]
            tot = sum(n for (f, _), n in counts.items() if f == f_state)
            if tot:
                Q[i] /= tot
                r_conv[i] /= tot
        b = np.linalg.solve(np.eye(k) - Q, r_conv)
        return float(b[idx["START"]])

    p_all = absorption_p(None)
    effects = []
    for c in channels:
        p_wo = absorption_p(c) if p_all > 0 else 0.0
        re = 0.0 if p_all == 0 else max(0.0, 1.0 - p_wo / p_all)
        effects.append((c, re))
    total = sum(re for _, re in effects)
    out = [
        (c, round(re, 6), round(re / total, 6) if total > 0 else 0.0)
        for c, re in effects
    ]
    return events.sparkSession.createDataFrame(
        out, "channel string, removal_effect double, credit double"
    )
