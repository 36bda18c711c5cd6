"""Scalable stable-ID assignment (training-data pipelines need stable,
contiguous document/example ids; SURVEY.md §2 Part B LLM-data extensions).

The naive formulation — ``row_number() OVER (ORDER BY key)`` with no
partition clause — collapses the whole table into ONE task and dies at
scale. The classic distributed algorithm instead:

1. range-partition + sort by the key (one shuffle, all partitions work),
2. count rows per partition (tiny job: one long per partition),
3. prefix-sum the counts on the driver (P values, not rows),
4. map each partition adding ``offset + local_index`` (no shuffle).

Spark has no built-in for this (``monotonically_increasing_id`` is
parallel but non-contiguous and unstable across runs; ``zipWithIndex`` is
RDD-land). The result is bit-identical to the single-partition window —
the q110 oracle proves it — while every stage stays parallel.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_contiguous_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    id_col: str = "stable_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = 0..n-1 in ``order_cols`` order, fully parallel.

    ``order_cols`` must be a unique key (ties would make the order, and
    therefore the ids, nondeterministic). Step 3 collects one count per
    partition to the driver — P longs, independent of table size.

    The sorted stage is eagerly localCheckpoint-ed before counting:
    range-partition boundaries come from sampling, and a re-compiled plan
    re-samples with a different seed, so the count job and the numbering
    job MUST read the same materialized partitioning. (r6: switched from
    persist+caller-unpersists to the checkpoint posture the rest of the
    two-pass family settled on — operators/prefix.py, skyline.py,
    intervals.py — because the persist registered in the session
    CacheManager and LEAKED until an explicit unpersist no caller ever
    issued; checkpoint blocks die with the returned frame's lineage. On
    a real multi-executor cluster where executor loss could drop
    localCheckpoint blocks mid-query, use reliable checkpoint/write
    instead.)
    """
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ordered = (
        df.repartitionByRange(int(parts), *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=True)
    )

    counts = (
        ordered.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    sizes = {r["_pid"]: r["_n"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    # copy, don't .add(): DataFrame caches its schema object and
    # StructType.add mutates in place, corrupting ordered.columns
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(ordered.schema.fields) + [StructField(id_col, LongType(), False)]
    )
    sess = df.sparkSession
    boffsets = sess.sparkContext.broadcast(offsets)

    def _number(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas runs once per partition; TaskContext gives its id
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nxt = boffsets.value.get(pid, 0)
        for pdf in it:
            pdf[id_col] = range(nxt, nxt + len(pdf))
            nxt += len(pdf)
            yield pdf

    return ordered.mapInPandas(_number, schema=out_schema)
