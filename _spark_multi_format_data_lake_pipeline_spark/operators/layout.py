"""Data-layout operators: z-order (Morton) clustering for multi-column
file skipping.

Why: parquet min/max footer stats prune files only when the file layout
correlates with the filter column. Sorting by one column gives perfect
pruning on it and none on any other. Interleaving the bits of k columns
(a Morton curve) bounds EVERY column's per-file span, so selective
filters on any of the k columns skip most files — the standard lakehouse
layout trick for 100 TB fact tables filtered along several dimensions.

All expression-level bit math (shiftleft/shiftright chains unrolled
driver-side — PySpark shift amounts must be Python ints); stays inside
whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of the given NON-NEGATIVE integer
    columns into a Morton key. ``bits * len(cols)`` must fit in int64."""
    n = len(cols)
    if bits * n > 62:
        raise ValueError(f"bits*ncols = {bits * n} overflows int64")
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for j, c in enumerate(cols):
            cc = (F.col(c) if isinstance(c, str) else c).cast("bigint")
            bit = F.shiftright(cc, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + j)
    return key


def zorder_by(
    df: DataFrame, cols: list[str], bits: int = 8, num_partitions: int | None = None
) -> DataFrame:
    """Return ``df`` re-clustered along the Morton curve of ``cols``.

    Columns are first scaled to ``[0, 2^bits)`` rank buckets using global
    min/max (one tiny agg, broadcast back as literals — no window, no
    second shuffle of the data itself), then range-partitioned and sorted
    by the interleaved key. Write the result with ``partitionBy``-free
    parquet and every one of ``cols`` gets bounded per-file min/max spans.

    min/max scaling assumes roughly uniform columns; heavily skewed
    columns want quantile buckets instead (approxQuantile) — same key
    construction afterwards.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    ).head()
    buckets = 1 << bits
    scaled = []
    for c in cols:
        lo, hi = stats[f"__lo_{c}"], stats[f"__hi_{c}"]
        if lo is None or hi is None:
            # empty input or all-NULL column: no range to scale — the
            # column contributes a constant to the key (still correct,
            # just prunes nothing on this dimension)
            scaled.append(F.lit(0).cast("bigint"))
            continue
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(buckets - 1),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * buckets),
            )
        )
    keyed = df.withColumn("__zkey", zorder_key(scaled, bits))
    parts = num_partitions or keyed.rdd.getNumPartitions()
    return (
        keyed.repartitionByRange(parts, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
