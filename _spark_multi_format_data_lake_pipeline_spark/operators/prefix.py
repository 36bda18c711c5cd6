"""Distributed grouped running sum for LOW-CARDINALITY groups.

``SUM(v) OVER (PARTITION BY g ORDER BY o)`` parallelizes across groups —
which is useless when there are 3 groups and 100 TB of rows: the window
funnels everything through |groups| tasks.  This operator keeps every
partition working regardless of group count, with the same
range-partition + O(P) driver prefix recipe as ``operators/ids.py``
(prefix-sum) and ``operators/skyline.py`` (prefix-max):

1. range-partition + sort by (group…, order) — one shuffle, all
   partitions work; each group occupies a contiguous partition span,
2. one tiny job: per-(partition, group) value sums — the driver receives
   O(P + groups-that-straddle-boundaries) rows, not data rows,
3. exclusive per-group prefix on the driver, broadcast,
4. one ``mapInPandas`` pass: vectorized per-group cumsum + the
   partition's group offset.

Numerically: values are summed as doubles. For exactly-representable
sums (integer-valued weights like q171's quantities) the result is
bit-identical to the single-task window — the q171 oracle hash-proves
it cross-engine. For inexact doubles the partial-sum association
differs from the window's strict left-to-right fold, so low-order bits
can differ (as with any parallel sum); DECIMAL inputs are coerced to
double (use the window if you need exact decimal arithmetic). For
HIGH-cardinality groups the plain window is already parallel and
cheaper — use it; this exists for the few-groups regime.

The sorted stage is persisted while the two passes run (range
boundaries come from sampling; both jobs must read the same
materialization), then the result is eagerly localCheckpoint-ed and the
cache dropped — same leak-free posture as ``operators/skyline.py``; the
checkpoint blocks live exactly as long as the returned frame.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_running_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = cumulative sum of ``value_col`` within each
    ``group_cols`` group in ``order_col`` order. (group…, order) must be
    unique per row (ties would make the running sum order-dependent —
    pre-aggregate to that grain first, which is also what bounds the
    data volume). NULL group keys raise: SQL windows treat NULL as a
    normal partition but pandas groupby and the driver prefix dict
    disagree on NULL identity, so rather than return silently wrong
    sums the operator refuses (filter or fillna the group column
    first)."""
    from pyspark import StorageLevel, TaskContext

    sess = df.sparkSession
    parts = int(num_partitions or sess.conf.get("spark.sql.shuffle.partitions"))
    gcols = list(group_cols)
    # fail loudly instead of silently overwriting caller data (the
    # epoch_shard_order lesson, r4 ADVICE)
    taken = {c for c in ("_gv", "_pid", out_col) if c in df.columns}
    if taken:
        raise ValueError(f"grouped_running_sum: column(s) {sorted(taken)} already exist")

    # internal double lane: makes DECIMAL/int value columns safe for the
    # pandas cumsum and the driver float accumulation (precision note in
    # the module docstring)
    ordered = (
        df.withColumn("_gv", F.col(value_col).cast("double"))
        .repartitionByRange(parts, *gcols, order_col)
        .sortWithinPartitions(*gcols, order_col)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    partials = (
        ordered.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", *gcols)
        .agg(F.sum("_gv").alias("_s"))
        .collect()
    )
    if any(any(row[c] is None for c in gcols) for row in partials):
        ordered.unpersist()
        raise ValueError(
            f"grouped_running_sum: NULL values in group column(s) {gcols}; "
            "fill or filter them first"
        )
    single = len(gcols) == 1
    acc: dict = {}
    prefix: dict[int, dict] = {}
    for row in sorted(partials, key=lambda r: r["_pid"]):
        g = row[gcols[0]] if single else tuple(row[c] for c in gcols)
        prefix.setdefault(row["_pid"], {})[g] = acc.get(g, 0.0)
        acc[g] = acc.get(g, 0.0) + row["_s"]
    bprefix = sess.sparkContext.broadcast(prefix)

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [f for f in ordered.schema.fields if f.name != "_gv"]
        + [StructField(out_col, DoubleType(), True)]
    )

    def _running(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        offs = dict(bprefix.value.get(pid, {}))
        for pdf in it:
            if single:
                # vectorized dict-map; avoids building per-row tuples
                keys = pdf[gcols[0]]
                start = keys.map(offs).fillna(0.0)
            else:
                keys = pd.Series(
                    list(zip(*(pdf[c] for c in gcols))), index=pdf.index
                )
                start = keys.map(lambda k: offs.get(k, 0.0))
            cum = pdf.groupby(keys, sort=False)["_gv"].cumsum()
            pdf[out_col] = (cum + start).astype("float64")
            # carry the per-group running total into the next Arrow batch
            ends = pdf.groupby(keys, sort=False)[out_col].last()
            for k, v in ends.items():
                offs[k] = v
            yield pdf.drop(columns=["_gv"])

    out = ordered.mapInPandas(_running, schema=out_schema).localCheckpoint(
        eager=True
    )
    ordered.unpersist()
    return out
