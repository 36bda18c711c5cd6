"""Join operators Spark lacks as built-ins, expressed as DataFrame
compositions (SURVEY.md §2 Part B "Joins" row: as-of = range-join + window,
or better: the merge trick below).

As-of join — scalable design
----------------------------
The naive formulation (range join ``l.ts >= r.ts`` then ``row_number() == 1``)
explodes to O(|L| * matches) intermediate rows before pruning. Instead we use
the "merge as-of" trick: union both sides into one keyed stream, sort each
key-partition by timestamp once, and carry the most recent right-side row
forward with ``last(..., ignorenulls=True)``. Cost: ONE shuffle of L+R by the
join key and a per-partition sort — the same cost profile as a sort-merge
join, with no row explosion. This survives 100x scale-up as long as keys
aren't pathologically skewed (then: AQE skew handling / salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_TAG = "__asof_tag"
_SIDE_PREFIX = "__r_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    right_cols: list[str],
    strict: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_on`` <= ``left_on`` (or < when ``strict``) within the same
    ``by`` group. Left rows with no match keep nulls (left as-of join).

    ``right_cols`` are the right-side columns to carry; they come back
    suffixed when the name collides with a left column.
    """
    # Tag ordering controls visibility at equal timestamps: for strict (<)
    # the right row must sort AFTER left rows with the same ts; for
    # non-strict (<=) it must sort BEFORE them.
    left_tag, right_tag = (0, 1) if strict else (1, 0)

    carried = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    r = right.select(
        *[F.col(b) for b in by],
        F.col(right_on).alias(_TS),
        F.lit(right_tag).alias(_TAG),
        *[F.col(c).alias(_SIDE_PREFIX + carried[c]) for c in right_cols],
    )
    l = left.select(
        "*",
        F.col(left_on).alias(_TS),
        F.lit(left_tag).alias(_TAG),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(_SIDE_PREFIX + carried[c]) for c in right_cols],
    )
    merged = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(_TS, _TAG)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        *[
            F.last(_SIDE_PREFIX + out, ignorenulls=True).over(w).alias(out)
            for out in carried.values()
        ],
    )
    # keep only original left rows (right marker rows have null left cols —
    # but a cleaner discriminator is the tag value we assigned to left)
    left_rows = filled.filter(F.col(_TAG) == F.lit(left_tag))
    return left_rows.select(*left.columns, *carried.values())


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join as a shuffle equi-join instead of a
    nested-loop: bucket the number line into ``bin_width``-wide bins, tag
    each point with its bin, explode each interval to every bin it
    overlaps, equi-join on the bin, then apply the exact BETWEEN as a
    residual filter.

    Vanilla Spark plans ``p.ts BETWEEN i.lo AND i.hi`` as a broadcast
    nested loop (or worse, a cartesian product) — O(|P| * |I|) comparisons
    that no amount of executors rescues at 100 TB. Binning makes it a
    HashPartitioning equi-join: each point is matched only against
    intervals overlapping its bin. Each (point, interval) pair meets in
    EXACTLY one bin (the point's), so no post-join dedup is needed.

    Cost model: interval fanout is ceil(len/bin_width) + 1 rows, so pick
    ``bin_width`` near the typical interval length — 1 sizes fanout ~2x;
    much smaller explodes the interval side, much larger piles unrelated
    points into each bin and degenerates toward the nested loop. Columns
    must be integral (days since epoch, unix seconds, ids...); callers
    with dates convert via ``datediff`` first.

    ``how='inner'`` only: outer variants would need the unmatched sides
    re-attached after the residual filter.
    """
    if how != "inner":
        raise ValueError("binned_range_join supports how='inner' only")
    w = F.lit(int(bin_width))
    p = points.withColumn("__bin", F.floor(F.col(point_col) / w))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w))
        ),
    )
    return (
        p.join(iv, "__bin")
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bin")
    )
