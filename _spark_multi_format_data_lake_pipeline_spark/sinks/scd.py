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


def scd2_from_change_log(
    df: DataFrame,
    key_cols,
    order_col: str,
    attr_cols,
) -> DataFrame:
    """(key…, version, attr…, valid_from, valid_to, is_current) — the
    FULL-HISTORY REBUILD member of the SCD2 family: where ``scd2_init``/
    ``scd2_apply`` maintain a dimension incrementally from snapshots,
    this reconstructs the entire versioned history in one pass over an
    event-grained change log (backfills, replays, late-arriving-fix
    rebuilds). Kimball type-2 semantics with update suppression: a row
    opens a new version only when at least one tracked attribute differs
    from the previous row (null-safe ``eqNullSafe`` — NULL -> 'x' is a
    change, NULL -> NULL is not); valid_to = the next change's
    valid_from, so versions tile half-open [from, to) with the last one
    open (is_current). ``(key…, order_col)`` must be unique (ties would
    make "previous state" ambiguous — pre-disambiguate with a tie-break
    column merged into ``order_col``). ONE shuffle to the key grain;
    lag, row_number and lead all share it; parallelism = key
    cardinality. q187 is the oracle row; q194 joins purchases against
    the rebuilt history point-in-time (the batch twin of
    ``scd2_as_of``)."""
    keys, attrs = list(key_cols), list(attr_cols)
    if not attrs:
        raise ValueError("scd2_from_change_log: need at least one tracked attribute")
    w = Window.partitionBy(*keys).orderBy(order_col)

    is_change = F.lit(False)
    for a in attrs:
        prev = F.lag(a).over(w)
        # null-safe: a NULL state differing from a non-NULL one IS a
        # change; NULL -> NULL is not. row 1 (prev undefined for every
        # attr) is always a change via the row_number guard below.
        is_change = is_change | ~prev.eqNullSafe(F.col(a))
    first = F.row_number().over(w) == 1
    changes = df.withColumn("_chg", first | is_change).filter(F.col("_chg"))

    wc = Window.partitionBy(*keys).orderBy(order_col)
    valid_to = F.lead(order_col).over(wc)
    return changes.select(
        *keys,
        F.row_number().over(wc).cast("long").alias("version"),
        *attrs,
        F.col(order_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
