"""Interval coalescing: merge overlapping/touching ranges per key.

The set-union of time ranges — maintenance windows, user sessions with
explicit spans, validity ranges in bitemporal tables — is the
gaps-and-islands idiom generalized from unit days (q168) to arbitrary
[start, end] intervals: sort per key, an interval starts a NEW island
iff its start lies strictly after the running max of all previous ends,
then each island aggregates to one merged interval.

Scale shape: one shuffle to the key grain; the window runs per key, so
parallelism equals key cardinality — the right tool for per-user /
per-entity ranges (millions of keys). For ZERO key columns (one global
interval set — a cluster-wide busy timeline, a whole-table validity
union) the per-key window would degenerate to a single task, so
``merge_intervals(df, [], ...)`` instead runs the range-partition +
O(P) driver handoff recipe shared with ``operators/ids.py`` (prefix-
sum), ``operators/skyline.py`` and ``operators/prefix.py``: every
partition works regardless of key count. Gaps-and-islands needs TWO
chained prefixes — the island test compares each start against the
running MAX of all previous ends (prefix-max), and the island id is
the running COUNT of island starts (prefix-sum) — both served by one
frozen range partitioning and two O(P) driver exchanges.
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
    ``(key…, start, end, n_merged)``. With ``key_cols=[]`` the whole
    input is ONE global interval set and the computation switches to the
    range-partitioned two-prefix form (module docstring) — same output
    contract minus the key columns, partition-count invariant
    (property-tested). Intervals with NULL bounds or end < start raise —
    silently dropping or "fixing" malformed ranges would hide upstream
    bugs."""
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
    if not keys:
        return _merge_intervals_global(df, start_col, end_col)

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


def _merge_intervals_global(
    df: DataFrame,
    start_col: str,
    end_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global (key-less) interval coalescing, every partition working.

    1. range-partition by (start, end), stamp the frozen partition id,
       eagerly localCheckpoint (range boundaries come from sampling and
       ``spark_partition_id`` is execution-dependent — all downstream
       jobs must read ONE materialization; same posture as
       operators/prefix.py);
    2. tiny job A: per-partition MAX(end) → exclusive prefix-max on the
       driver (P values) = "largest end seen before this partition";
    3. the island-start flag is now per-partition local: a row starts a
       new island iff start > greatest(running max of ends within the
       partition up to the previous row, the partition's prefix-max
       offset);
    4. tiny job B: per-partition COUNT of flags → exclusive prefix-sum
       on the driver = each partition's island-id offset; the global
       island id is the offset + the running flag count within the
       partition — both windows key on the frozen pid, so no task ever
       holds more than one physical partition;
    5. groupBy(island) → (start=min, end=max, n_merged).

    The range partitioning guarantees correctness of step 3: partitions
    are ordered by (start, end), so "all previous rows" = "all previous
    partitions" ∪ "previous rows in mine". Two data-sized exchanges
    (the range shuffle; the pid hash exchange the checkpoint forces) +
    the island groupBy; O(P) driver traffic twice."""
    sess = df.sparkSession
    parts = int(num_partitions or sess.conf.get("spark.sql.shuffle.partitions"))

    ordered = (
        df.select(start_col, end_col)
        .repartitionByRange(parts, start_col, end_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    # job A: prefix-max of per-partition end maxima
    maxima = ordered.groupBy("_pid").agg(F.max(end_col).alias("_m")).collect()
    if not maxima:
        return (
            df.select(start_col, end_col)
            .withColumn("n_merged", F.lit(1).cast("long"))
            .limit(0)
        )
    run = None
    pmax_rows: list[tuple] = []
    for row in sorted(maxima, key=lambda r: r["_pid"]):
        pmax_rows.append((row["_pid"], run))
        m = row["_m"]
        run = m if run is None else max(run, m)

    from pyspark.sql.types import LongType, StructField, StructType

    pid_t = ordered.schema["_pid"].dataType
    end_t = ordered.schema[end_col].dataType
    pmax_schema = StructType(
        [StructField("_pid", pid_t, False), StructField("_pmax", end_t, True)]
    )
    with_pmax = ordered.join(
        F.broadcast(sess.createDataFrame(pmax_rows, pmax_schema)), "_pid"
    )

    wp = Window.partitionBy("_pid").orderBy(start_col, end_col)
    local_prev = F.max(end_col).over(wp.rowsBetween(Window.unboundedPreceding, -1))
    # greatest() skips NULLs (returns NULL only when BOTH are): first row
    # of partition 0 sees NULL/NULL → NULL → new island, exactly the
    # keyed variant's prev_max_end.isNull() branch
    prev_end = F.greatest(local_prev, F.col("_pmax"))
    flag = F.when(prev_end.isNull() | (F.col(start_col) > prev_end), 1).otherwise(0)
    flagged = with_pmax.withColumn("_f", flag)

    # job B: prefix-sum of per-partition flag counts (re-derives the
    # flags from the SAME checkpoint + deterministic pmax join, so both
    # jobs agree row for row)
    fcounts = flagged.groupBy("_pid").agg(F.sum("_f").alias("_n")).collect()
    acc = 0
    off_rows: list[tuple] = []
    for row in sorted(fcounts, key=lambda r: r["_pid"]):
        off_rows.append((row["_pid"], acc))
        acc += int(row["_n"] or 0)
    off_schema = StructType(
        [StructField("_pid", pid_t, False), StructField("_ioff", LongType(), False)]
    )
    island = F.sum("_f").over(wp) + F.col("_ioff")
    return (
        flagged.join(F.broadcast(sess.createDataFrame(off_rows, off_schema)), "_pid")
        .withColumn("_island", island)
        .groupBy("_island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
        .drop("_island")
    )
