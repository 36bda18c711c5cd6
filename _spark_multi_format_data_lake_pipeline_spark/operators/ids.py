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
    with_count: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """Add ``id_col`` = 0..n-1 in ``order_cols`` order, fully parallel.

    ``order_cols`` must be a unique key (ties would make the order, and
    therefore the ids, nondeterministic). Step 3 collects one count per
    partition to the driver — P longs, independent of table size.

    ``num_partitions=None`` (default) leaves the range shuffle's
    partition count to AQE partition coalescing (scale-adaptive: a
    100-row insert set numbers in one task, a billion-row one keeps the
    configured width) instead of pinning ``spark.sql.shuffle.partitions``
    tasks on any input.  The ids are partitioning-independent either
    way: they follow the global ``order_cols`` order through the
    per-partition prefix sum, whatever boundaries the sampler or AQE
    picked.

    ``with_count=True`` returns ``(numbered, n)`` where ``n`` is the
    total row count — FREE here (the per-partition count collect already
    sums to it), so callers that need both never pay a separate
    ``count()`` job over the input.

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
    # The partition index is BAKED INTO the checkpointed rows rather
    # than read from TaskContext at numbering time: a downstream plan
    # that composes the numbered frame into a UNION (or any stage
    # whose task partition ids are renumbered — union children's
    # partitions are offset by their predecessors') would otherwise
    # hand _number a REMAPPED partition id, every offset lookup would
    # miss to 0, and distinct partitions would deal colliding ids (the
    # row-tracking upsert found exactly this).  Data-carried pids are
    # immune to any task renumbering.
    pid_col = "__acid_pid"
    ranged = (
        df.repartitionByRange(int(num_partitions), *order_cols)
        if num_partitions is not None
        # no explicit count → AQE may coalesce the range shuffle to fit
        # the data; coalescing merges ADJACENT ranges, so the global
        # order (and therefore every id) is unchanged
        else df.repartitionByRange(*order_cols)
    )
    ordered = (
        ranged.sortWithinPartitions(*order_cols)
        .withColumn(pid_col, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    counts = (
        ordered.groupBy(pid_col).agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    sizes = {r[pid_col]: r["_n"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    # copy, don't .add(): DataFrame caches its schema object and
    # StructType.add mutates in place, corrupting ordered.columns
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [f for f in ordered.schema.fields if f.name != pid_col]
        + [StructField(id_col, LongType(), False)]
    )
    sess = df.sparkSession
    boffsets = sess.sparkContext.broadcast(offsets)

    def _number(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Numbered per DATA-BORNE pid, not per task: a task normally
        # serves one checkpointed partition, but a downstream coalesce
        # can merge several into one task (and chunking can straddle
        # their boundary), so each chunk is grouped by its rows' pids —
        # intra-partition order is preserved by coalesce, keeping the
        # id <-> sort-order contract exact in every composition.
        import numpy as np

        state: dict[int, int] = {}
        for pdf in it:
            if len(pdf):
                ids = np.empty(len(pdf), dtype="int64")
                for pid, idx in pdf.groupby(
                    pid_col, sort=False
                ).indices.items():
                    base = state.get(
                        int(pid), boffsets.value.get(int(pid), 0)
                    )
                    ids[idx] = np.arange(base, base + len(idx))
                    state[int(pid)] = base + len(idx)
                pdf[id_col] = ids
            else:
                pdf[id_col] = pd.Series([], dtype="int64")
            yield pdf.drop(columns=[pid_col])

    numbered = ordered.mapInPandas(_number, schema=out_schema)
    return (numbered, acc) if with_count else numbered
