"""Top-k operators (SURVEY.md §2 Part B "Sorts / limits / top-k").

``top_k`` is just orderBy+limit — Spark already executes that as
TakeOrderedAndProject (a per-partition heap + driver merge, no global sort),
which is the right physical plan at any scale.

``top_k_per_group`` uses a rank window; Spark pushes a partial
``WindowGroupLimit`` below the shuffle in 3.5+, so each map task keeps only
k rows per group before shuffling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
