"""Data-quality validation for training-data pipelines: declarative rules
evaluated in ONE aggregation pass over the table (no per-rule jobs).

A 100 TB corpus ingest wants gates like "null ratio under x", "doc length
in range", "id unique" evaluated cheaply; expressing every rule as a
conditional aggregate in a single ``agg`` keeps it at one table scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    # aggregate expression producing the measured value (double)
    measure: Column
    # inclusive bounds the measurement must fall within
    min_ok: float = float("-inf")
    max_ok: float = float("inf")


def null_ratio(col: str) -> Column:
    return F.avg(F.col(col).isNull().cast("double"))


def distinct_ratio(col: str) -> Column:
    return F.count_distinct(F.col(col)).cast("double") / F.count(F.lit(1))


def in_range_ratio(col: str, lo: float, hi: float) -> Column:
    return F.avg(F.col(col).between(lo, hi).cast("double"))


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One-pass rule evaluation. Returns (rule, value, min_ok, max_ok,
    passed) — collect it or gate a pipeline on ``passed``."""
    measured = df.agg(*[r.measure.cast("double").alias(r.name) for r in rules])
    stack_args = []
    for r in rules:
        stack_args += [F.lit(r.name), F.col(r.name)]
    long = measured.select(
        F.stack(F.lit(len(rules)), *stack_args).alias("rule", "value")
    )
    lo = F.create_map(*[x for r in rules for x in (F.lit(r.name), F.lit(r.min_ok))])
    hi = F.create_map(*[x for r in rules for x in (F.lit(r.name), F.lit(r.max_ok))])
    return long.select(
        "rule",
        F.round("value", 6).alias("value"),
        lo[F.col("rule")].alias("min_ok"),
        hi[F.col("rule")].alias("max_ok"),
        ((F.col("value") >= lo[F.col("rule")]) & (F.col("value") <= hi[F.col("rule")])).alias(
            "passed"
        ),
    )


def observed(df: DataFrame, rules: list[Rule]):
    """Attach the rule measures to ``df`` as an ``Observation`` so they are
    collected as a SIDE EFFECT of whatever action the caller already runs
    (a write, a count) — zero additional table scans, unlike ``validate``
    which spends its own aggregation job. The trade: observation metrics
    must be commutative aggregates (count_distinct is rejected by Spark
    here, so ``distinct_ratio`` rules can't ride along).

    Returns ``(df, observation)``; after an action on ``df``, call
    ``observation_report(observation, rules)``.
    """
    from pyspark.sql import Observation

    obs = Observation("quality")
    return (
        df.observe(obs, *[r.measure.cast("double").alias(r.name) for r in rules]),
        obs,
    )


def observation_report(obs, rules: list[Rule]) -> list[dict]:
    """Evaluate rule bounds against a completed Observation's metrics."""
    got = obs.get
    return [
        {
            "rule": r.name,
            "value": got[r.name],
            "min_ok": r.min_ok,
            "max_ok": r.max_ok,
            "passed": (
                got[r.name] is not None and r.min_ok <= got[r.name] <= r.max_ok
            ),
        }
        for r in rules
    ]
