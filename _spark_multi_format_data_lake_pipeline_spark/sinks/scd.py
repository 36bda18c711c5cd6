"""Slowly-changing-dimension type 2 (SCD2) for the lakehouse merge surface.

The reference's merge engine (SURVEY.md §2 A.2 W2/W5) is type-1: MERGE
upsert overwrites attribute history. SCD2 keeps it: every change closes the
current row (``valid_to`` set, ``is_current`` false) and appends a new
current row, so point-in-time joins (``dim AS OF ts``) stay answerable.

Scale shape: one shuffle of each side keyed by the business key; change
detection compares a sha256 of the tracked attributes (never the payload
twice); output = untouched history + closed rows + new versions via
unionByName, written back with the jar-free stage+rename writer or Iceberg
MERGE when jars are present.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MAX_TS = "9999-12-31 23:59:59"


def _attr_hash(cols: list[str]) -> Column:
    return F.sha2(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]), 256)


def scd2_init(snapshot: DataFrame, key: str, attrs: list[str], ts_col: str) -> DataFrame:
    """Bootstrap an SCD2 dimension from a first snapshot: every row is
    current from its own timestamp."""
    return snapshot.select(
        key,
        *attrs,
        F.col(ts_col).cast("timestamp").alias("valid_from"),
        F.lit(_MAX_TS).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``updates`` carries (key, attrs, ts). For each key: if the attributes
    changed vs the CURRENT dim row, the current row is closed at the
    update's timestamp and a new current row opens there; unchanged
    updates are no-ops; brand-new keys insert as current. History rows
    (``is_current`` false) pass through untouched.

    Multiple updates per key in one batch are allowed — the latest by ts
    wins for the new current row (intermediate versions within a single
    batch are not expanded; feed batches in order for full history).
    """
    latest = updates.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy(key).orderBy(F.col(ts_col).desc())
        ),
    ).filter(F.col("_rn") == 1).drop("_rn")

    upd = latest.select(
        F.col(key).alias("_k"),
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
        F.col(ts_col).cast("timestamp").alias("_u_ts"),
        _attr_hash(attrs).alias("_u_hash"),
    )

    current = dim.filter("is_current")
    history = dim.filter(~F.col("is_current"))

    cur = current.withColumn("_hash", _attr_hash(attrs)).join(
        upd, current[key] == upd["_k"], "full_outer"
    )

    # current rows with no update, or update identical -> keep as-is
    unchanged = cur.filter(
        F.col("_u_hash").isNull() | (F.col("_hash") == F.col("_u_hash"))
    ).select(key, *attrs, "valid_from", "valid_to", "is_current").filter(
        F.col(key).isNotNull()
    )

    changed = cur.filter(
        F.col("_u_hash").isNotNull()
        & F.col("_hash").isNotNull()
        & (F.col("_hash") != F.col("_u_hash"))
    )
    closed = changed.select(
        key,
        *attrs,
        "valid_from",
        F.col("_u_ts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    new_versions = changed.select(
        F.col("_k").alias(key),
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.col("_u_ts").alias("valid_from"),
        F.lit(_MAX_TS).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    inserts = cur.filter(F.col("_hash").isNull() & F.col("_u_hash").isNotNull()).select(
        F.col("_k").alias(key),
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.col("_u_ts").alias("valid_from"),
        F.lit(_MAX_TS).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        history.select(key, *attrs, "valid_from", "valid_to", "is_current")
        .unionByName(unchanged)
        .unionByName(closed)
        .unionByName(new_versions)
        .unionByName(inserts)
    )


def scd2_as_of(dim: DataFrame, ts: str) -> DataFrame:
    """Point-in-time view: the version of each key valid at ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return dim.filter((F.col("valid_from") <= t) & (F.col("valid_to") > t))
