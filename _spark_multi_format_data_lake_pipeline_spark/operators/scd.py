"""Slowly-changing-dimension type-2 history from a change log.

The lake-pipeline sibling of ``sinks/cdc.py``: where CDC answers "what
changed between two snapshots", SCD2 answers "what was true WHEN" — it
turns an event-grained change log into versioned validity ranges
(valid_from / valid_to / is_current), the standard warehouse layout for
point-in-time dimension joins.

Semantics (Kimball type 2 with update suppression):

1. order each key's log by the caller's total order;
2. suppress no-op updates — a row opens a new version only when at
   least one tracked attribute actually differs from the previous row
   (lag comparison; a log row that repeats the current state is noise,
   and versioning it would explode the dimension);
3. valid_from = the change row's ordinal; valid_to = the NEXT change's
   valid_from (half-open [from, to) — adjacent versions tile with no
   gap or overlap); the last version per key is open (valid_to NULL,
   is_current true); version = 1-based change ordinal.

Scale shape: ONE shuffle to the key grain; the lag/lead/row_number
windows all share it (key cardinality = parallelism, the same regime as
per-user sessionization). NULL attribute values are legal states:
change detection uses null-safe equality (``eqNullSafe``), so
NULL -> 'x', 'x' -> NULL, and NULL -> NULL transitions are classified
correctly (the last is a no-op).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_change_log(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """(key…, version, attr…, valid_from, valid_to, is_current) from an
    event-grained change log. ``(key…, order_col)`` must be unique (ties
    would make "previous state" ambiguous — pre-disambiguate with a
    tie-break column merged into ``order_col``)."""
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
