"""Interval coalescing: merge overlapping/touching ranges per key.

The set-union of time ranges — maintenance windows, user sessions with
explicit spans, validity ranges in bitemporal tables — is the
gaps-and-islands idiom generalized from unit days (q168) to arbitrary
[start, end] intervals: sort per key, an interval starts a NEW island
iff its start lies strictly after the running max of all previous ends,
then each island aggregates to one merged interval.

Scale shape: one shuffle to the key grain; the window runs per key, so
parallelism equals key cardinality — the right tool for per-user /
per-entity ranges (millions of keys). For ONE global key the window
degenerates to a single task; range-partition + the
``operators/prefix.py`` handoff recipe applies there (prefix-max of
ends instead of sums) — not shipped until a caller needs it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce per-key intervals: rows whose [start, end] ranges overlap
    OR touch (next.start == prev.end) merge into one row per maximal run:
    ``(key…, start, end, n_merged)``. Intervals with NULL bounds or
    end < start raise — silently dropping or "fixing" malformed ranges
    would hide upstream bugs."""
    keys = list(key_cols)
    bad = df.filter(
        F.col(start_col).isNull()
        | F.col(end_col).isNull()
        | (F.col(end_col) < F.col(start_col))
    )
    if bad.limit(1).count() > 0:
        raise ValueError(
            f"merge_intervals: NULL or inverted [{start_col}, {end_col}] "
            "bounds present; clean the input first"
        )

    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = prev_max_end.isNull() | (F.col(start_col) > prev_max_end)
    island = F.sum(F.when(new_island, 1).otherwise(0)).over(w)
    return (
        df.withColumn("_island", island)
        .groupBy(*keys, "_island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
        .drop("_island")
    )
