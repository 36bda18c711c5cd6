"""Skew mitigation (SURVEY.md 'skewed keys hurt' / build brief: salting for
skew).

AQE's skew-join handling (on in session.py) splits oversized partitions of
sort-merge joins automatically, but it cannot help aggregations over a
hot key or joins that AQE planned before stats existed. ``salted_agg`` and
``salted_join`` are the manual dials for those cases.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Stage 1 aggregates (key, salt) partitions —
    the hot key's rows spread over ``salt`` reducers — stage 2 combines
    the per-salt partials. Algebraic aggregates only (avg = sum/count at
    the call site).
    """
    stage1_aggs = []
    stage2_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            stage1_aggs.append(F.count(col).alias(out))
            stage2_aggs.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            stage1_aggs.append(getattr(F, fn)(col).alias(out))
            stage2_aggs.append(getattr(F, fn)(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    salted = df.withColumn(_SALT, (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(*stage1_aggs)
    return partial.groupBy(*keys).agg(*stage2_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the (large, skewed) left side randomly in
    [0, salt); replicate each right row ``salt`` times, once per salt
    value. The hot key's rows land on ``salt`` different reducers instead
    of one. Right-side replication costs salt x |right| — use only when
    right is the smaller side and broadcast is too big."""
    l = left.withColumn(_SALT, (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, on=[key, _SALT], how=how)
    return out.drop(_SALT)
