"""Change-data-capture batch application (lakehouse write surface beyond
the reference's W2 MERGE upsert — reference utils/merge_utils.py:70-82
handles update/insert only; CDC adds deletes and in-batch ordering).

``apply_cdc_batch`` is a pure DataFrame transformation: given the current
table state and a batch of change rows (op column: I/U/D, optional
monotonic sequence column), produce the next state. Pure means it
composes everywhere — unit-testable without a catalog, usable inside
``foreachBatch`` for streaming CDC (pair with ``sinks/sinks.py``'s
stage+rename discipline for the actual write), and replayable: applying
the same batch twice yields the same state (upsert/delete are
idempotent), which is what exactly-once sinks lean on after a retry.

Scale shape: one shuffle of the target on the key (anti join), one tiny
window over the changes (batch-sized, not table-sized). With the target
bucketed on the key (sinks/writer.py bucketBy) the anti join is
shuffle-free on the table side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc_batch(
    target: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Next table state = target ⊳ changes (anti on keys) ∪ latest upserts.

    ``changes`` columns: the target's columns plus ``op_col`` with values
    I (insert), U (update), D (delete); inserts and updates carry the
    full new row. When one key appears several times in a batch,
    ``seq_col`` (a monotonic change sequence) picks the LAST change per
    key — without it the winner is arbitrary, so it is required for
    correctness whenever upstream can emit multiple changes per key per
    batch.
    """
    keys = list(key_cols)
    if seq_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
        latest = (
            changes.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk", seq_col)
        )
    else:
        latest = changes
    survivors = target.join(latest.select(*keys), keys, "left_anti")
    upserts = latest.filter(F.col(op_col) != "D").drop(op_col)
    return survivors.unionByName(upserts)
