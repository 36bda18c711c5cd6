"""Declarative data-quality expectations over a DataFrame.

A pipeline writing curated tables wants a gate: "orderkey is unique,
totalprice ∈ [0, 1e6], status ∈ {O,F,P}, custkey resolves against
customer".  This module turns a list of declarative rules into the
minimum number of Spark jobs:

- every ROW-LEVEL rule (not_null / in_range / in_set / matches) becomes
  one conditional-sum column in a SINGLE full-scan aggregate — one pass
  over the table regardless of rule count, all map-side partials, no
  shuffle beyond the 1-row final agg;
- each ``unique`` rule is one groupBy on its key counting surplus rows;
- each ``foreign_key`` rule is ONE left join over the fact side that
  counts checked and unmatched rows together (broadcast by default;
  pass ``broadcast_ref=False`` for fact-sized references so the check
  shuffles instead of shipping a huge key set to every executor).

Result: one row per rule — ``(rule, n_violations, n_checked)`` — the
shape a CI gate or a freshness dashboard consumes.  The q173 oracle
recomputes every rule as plain SQL counts.

The reference has no data-quality surface at all (SURVEY.md §5: its only
runtime verification is SHOW TABLES + row counts,
``utils/spark_write_iceberg.py:88-132``); this generalizes that
verification step into a first-class, composable operator.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {not_null, in_range, in_set, matches,
    unique, foreign_key}; ``name`` must be unique within a suite."""

    name: str
    kind: str
    cols: tuple[str, ...]
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    pattern: str | None = None
    ref: DataFrame | None = field(default=None, compare=False)
    ref_cols: tuple[str, ...] = ()
    # broadcast the reference key set (right for dimension-sized refs);
    # pass False for fact-to-fact FKs so the check runs as a shuffled
    # join instead of collecting a huge key set to every executor
    broadcast_ref: bool = True


def not_null(name: str, col: str) -> Rule:
    return Rule(name, "not_null", (col,))


def in_range(name: str, col: str, lo: float, hi: float) -> Rule:
    return Rule(name, "in_range", (col,), lo=lo, hi=hi)


def in_set(name: str, col: str, values: Sequence) -> Rule:
    return Rule(name, "in_set", (col,), values=tuple(values))


def matches(name: str, col: str, pattern: str) -> Rule:
    return Rule(name, "matches", (col,), pattern=pattern)


def unique(name: str, *cols: str) -> Rule:
    return Rule(name, "unique", tuple(cols))


def foreign_key(
    name: str, col: str, ref: DataFrame, ref_col: str, broadcast_ref: bool = True
) -> Rule:
    return Rule(
        name,
        "foreign_key",
        (col,),
        ref=ref,
        ref_cols=(ref_col,),
        broadcast_ref=broadcast_ref,
    )


def _violation_expr(r: Rule) -> F.Column:
    c = F.col(r.cols[0])
    if r.kind == "not_null":
        return c.isNull()
    if r.kind == "in_range":
        # NULL is not a range violation — not_null owns null policy
        return c.isNotNull() & ((c < F.lit(r.lo)) | (c > F.lit(r.hi)))
    if r.kind == "in_set":
        return c.isNotNull() & ~c.isin(list(r.values))
    if r.kind == "matches":
        return c.isNotNull() & ~c.rlike(r.pattern)
    raise ValueError(f"not a row-level rule: {r.kind}")


_ROW_KINDS = ("not_null", "in_range", "in_set", "matches")
_ALL_KINDS = _ROW_KINDS + ("unique", "foreign_key")


def expect(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` → one row per rule:
    ``rule: string, n_violations: long, n_checked: long``.

    Row-level rules share one scan; unique/foreign_key rules add one
    keyed job each. Output row order is the rule-list order (stable for
    reporting); the frame is tiny (|rules| rows). A gate must be able to
    trust that every rule it declared was evaluated, so an empty suite,
    a duplicate rule name, or an unrecognized ``kind`` raises instead of
    silently dropping rows from the report.
    """
    if not rules:
        raise ValueError("expect() needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names in suite: {names}")
    unknown = [r.name for r in rules if r.kind not in _ALL_KINDS]
    if unknown:
        raise ValueError(f"unrecognized rule kind for: {unknown}")

    row_rules = [r for r in rules if r.kind in _ROW_KINDS]
    results: list[DataFrame] = []

    if row_rules:
        aggs = [F.count(F.lit(1)).alias("_n")]
        for r in row_rules:
            aggs.append(
                # coalesce: SUM over zero rows is NULL — an empty table
                # must report 0 violations, not NULL (same posture as the
                # unique branch below)
                F.coalesce(F.sum(F.when(_violation_expr(r), 1).otherwise(0)), F.lit(0))
                .cast("long")
                .alias(r.name)
            )
        one = df.agg(*aggs)
        # unpivot the 1-row wide frame into (rule, n_violations, n_checked)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.col(r.name).alias("n_violations"),
                )
                for r in row_rules
            ]
        )
        results.append(
            one.select(F.explode(pairs).alias("p"), F.col("_n"))
            .select(
                F.col("p.rule").alias("rule"),
                F.col("p.n_violations").alias("n_violations"),
                F.col("_n").cast("long").alias("n_checked"),
            )
        )

    for r in rules:
        if r.kind == "unique":
            k = [F.col(c) for c in r.cols]
            dup = (
                df.groupBy(*k)
                .agg(F.count(F.lit(1)).alias("_c"))
                .agg(
                    F.coalesce(F.sum(F.col("_c") - 1), F.lit(0))
                    .cast("long")
                    .alias("n_violations"),
                    F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_checked"),
                )
                .select(F.lit(r.name).alias("rule"), "n_violations", "n_checked")
            )
            results.append(dup)
        elif r.kind == "foreign_key":
            col, ref_col = r.cols[0], r.ref_cols[0]
            ref_keys = (
                r.ref.select(F.col(ref_col).alias(col))
                .distinct()
                .withColumn("_hit", F.lit(1))
            )
            if r.broadcast_ref:
                ref_keys = F.broadcast(ref_keys)
            # ONE pass over the fact side: a left join counts checked rows
            # and unmatched rows together (the old anti-join + separate
            # count scanned the table twice per FK rule)
            results.append(
                df.filter(F.col(col).isNotNull())
                .join(ref_keys, col, "left")
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("n_violations"),
                    F.count(F.lit(1)).cast("long").alias("n_checked"),
                )
                .select(F.lit(r.name).alias("rule"), "n_violations", "n_checked")
            )

    out = results[0]
    for r_df in results[1:]:
        out = out.unionByName(r_df)
    # order rows by the suite's rule order for a stable report
    order = {r.name: i for i, r in enumerate(rules)}
    omap = F.create_map(
        *[x for name, i in order.items() for x in (F.lit(name), F.lit(i))]
    )
    return (
        out.withColumn("_o", omap[F.col("rule")])
        .orderBy("_o")
        .drop("_o")
    )


def observe(df: DataFrame, rules: Sequence[Rule], name: str = "expectations"):
    """Attach the suite's ROW-LEVEL rules as Spark observation metrics:
    they are evaluated DURING the caller's own action (write, count,
    collect) at zero extra passes — the piggyback form of :func:`expect`
    for pipelines that already materialize the frame anyway.

    Returns ``(observed_df, observation)``; after any action on
    ``observed_df``, ``observation.get`` yields ``{"n_checked": ...,
    "<rule>": violations, ...}``. Only row-level rules qualify (unique /
    foreign_key need their own shuffles/joins — run those via
    :func:`expect`); passing one raises, so a suite cannot silently
    lose a rule.
    """
    from pyspark.sql import Observation

    if not rules:
        raise ValueError("observe() needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names in suite: {names}")
    if "n_checked" in names:
        raise ValueError("'n_checked' is the reserved row-count metric name")
    bad = [r.name for r in rules if r.kind not in _ROW_KINDS]
    if bad:
        raise ValueError(
            f"observe() only supports row-level rules; use expect() for: {bad}"
        )
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_checked")]
    for r in rules:
        metrics.append(
            F.coalesce(F.sum(F.when(_violation_expr(r), 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(r.name)
        )
    return df.observe(obs, *metrics), obs
