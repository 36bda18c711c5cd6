"""Distributed grouped running sum for LOW-CARDINALITY groups.

``SUM(v) OVER (PARTITION BY g ORDER BY o)`` parallelizes across groups —
which is useless when there are 3 groups and 100 TB of rows: the window
funnels everything through |groups| tasks.  This operator keeps every
partition working regardless of group count, with the same
range-partition + O(P) driver prefix recipe as ``operators/ids.py``
(prefix-sum) and ``operators/skyline.py`` (prefix-max):

1. range-partition by (group…, order) and stamp each row with its
   frozen partition id (eager localCheckpoint) — every partition works;
   each group occupies a contiguous partition span,
2. one tiny job: per-(partition, group) value sums — the driver receives
   O(P + groups-that-straddle-boundaries) rows, not data rows,
3. exclusive per-group prefix on the driver → a tiny (pid, group…,
   offset) table, broadcast-joined back,
4. the running sum itself is a JVM window over (pid, group…) — each
   window partition is bounded by one physical partition of step 1, so
   parallelism is P×|local groups| and no task ever holds more than one
   partition's rows — plus the offset.

Cost shape: TWO data-sized exchanges (the range shuffle, then the
window's hash exchange on (pid, group) — the checkpoint erases
partitioning info, so Catalyst cannot prove step 1's layout satisfies
the window) but zero Python/Arrow round-trips. The single-shuffle
alternative is a mapInPandas/mapPartitions pass over step 1's layout —
measured ~2x slower here from Arrow serialization alone; at a scale
where shuffle I/O dominates Python serialization, prefer that
formulation instead.

Numerically: values are summed as doubles. For exactly-representable
sums (integer-valued weights like q171's quantities) the result is
bit-identical to the single-task window — the q171 oracle hash-proves
it cross-engine. For inexact doubles the partial-sum association
differs from the window's strict left-to-right fold, so low-order bits
can differ (as with any parallel sum); DECIMAL inputs are coerced to
double (use the window if you need exact decimal arithmetic). For
HIGH-cardinality groups the plain window is already parallel and
cheaper — use it; this exists for the few-groups regime.

The sorted+stamped stage is eagerly localCheckpoint-ed (range-partition
boundaries come from sampling AND spark_partition_id is
execution-dependent; the partials job and the window pass must read the
same frozen materialization) — one input-sized materialization whose
blocks live exactly as long as the returned frame's lineage, nothing
persisted into the session cache. Same posture as
``operators/skyline.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
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
    normal partition but the driver prefix map and the offset join
    disagree on NULL identity, so rather than return silently wrong
    sums the operator refuses (filter or fillna the group column
    first)."""
    sess = df.sparkSession
    parts = int(num_partitions or sess.conf.get("spark.sql.shuffle.partitions"))
    gcols = list(group_cols)
    # fail loudly instead of silently overwriting caller data (the
    # epoch_shard_order lesson, r4 ADVICE); out_col must also avoid the
    # internal names or the final drop() would delete the result
    reserved = ("_gv", "_pid", "_off")
    if out_col in reserved:
        raise ValueError(f"grouped_running_sum: out_col may not be one of {reserved}")
    taken = {c for c in (*reserved, out_col) if c in df.columns}
    if taken:
        raise ValueError(f"grouped_running_sum: column(s) {sorted(taken)} already exist")

    # NULL group keys: checked BEFORE the shuffle+checkpoint so the error
    # path never materializes checkpoint blocks (no public API releases
    # them deterministically). One early-terminating probe scan.
    null_pred = None
    for c in gcols:
        p = F.col(c).isNull()
        null_pred = p if null_pred is None else (null_pred | p)
    if df.filter(null_pred).limit(1).count() > 0:
        raise ValueError(
            f"grouped_running_sum: NULL values in group column(s) {gcols}; "
            "fill or filter them first"
        )

    # internal double lane: makes DECIMAL/int value columns safe for the
    # window sum and the driver float accumulation (precision note in the
    # module docstring). The partition id is stamped BEFORE the
    # checkpoint so both downstream jobs see the same frozen row→pid map.
    # No sortWithinPartitions here: nothing downstream reads the
    # pre-checkpoint order (the partials groupBy is order-free and the
    # window sorts after its own exchange).
    ordered = (
        df.withColumn("_gv", F.col(value_col).cast("double"))
        .repartitionByRange(parts, *gcols, order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    partials = ordered.groupBy("_pid", *gcols).agg(F.sum("_gv").alias("_s")).collect()
    acc: dict = {}
    offsets: list[tuple] = []
    for row in sorted(partials, key=lambda r: r["_pid"]):
        g = tuple(row[c] for c in gcols)
        offsets.append((row["_pid"], *g, acc.get(g, 0.0)))
        # an all-NULL (partition, group) value slice sums to SQL NULL —
        # it contributes nothing, like the window's null-skipping SUM
        s = row["_s"]
        acc[g] = acc.get(g, 0.0) + (s if s is not None else 0.0)

    from pyspark.sql.types import DoubleType, StructField, StructType

    # schema fields in gcols ORDER, not df-schema order: the offset
    # tuples are built in gcols order and the two must agree
    gfields = [ordered.schema[c] for c in gcols]
    off_schema = StructType(
        [StructField("_pid", ordered.schema["_pid"].dataType, False)]
        + gfields
        + [StructField("_off", DoubleType(), False)]
    )
    off_df = sess.createDataFrame(offsets, off_schema)

    # JVM window keyed by the frozen partition id: each window partition
    # is bounded by one physical partition of the range shuffle, so no
    # task ever holds more than one partition's rows regardless of group
    # count (the second, hash exchange this implies is the documented
    # trade vs the single-shuffle mapPartitions form — see module doc)
    w = Window.partitionBy("_pid", *gcols).orderBy(order_col)
    return (
        ordered.join(F.broadcast(off_df), ["_pid", *gcols])
        .withColumn(out_col, F.sum("_gv").over(w) + F.col("_off"))
        .drop("_gv", "_pid", "_off")
    )
