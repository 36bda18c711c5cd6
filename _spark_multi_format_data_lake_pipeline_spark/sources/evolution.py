"""Schema-drift detection between two batches of the same logical table.

The reference leaves schema evolution as a roadmap item (reference
``README.md:496``) and its merge path simply assumes source/target schemas
align (``utils/merge_utils.py:74-80``, ``MERGE ... UPDATE SET *``). This
module supplies the missing guard: diff two schemas BEFORE a merge and
refuse/alert on incompatible drift instead of failing mid-write.

Pure metadata — schemas come from parquet footers / catalog, no data is
scanned, so the diff is free at any corpus size. Nested structs are
compared by flattened dotted path (``props.device.os``), which is where
real drift hides in JSON-derived lakes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: change kinds, in severity order: type changes break readers, removals
#: break consumers, additions are the benign (mergeSchema-able) case.
KINDS = ("type_changed", "removed", "added")


def _flatten(schema: StructType, prefix: str = "") -> dict[str, str]:
    out: dict[str, str] = {}
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, StructType):
            out[path] = "struct"
            out.update(_flatten(f.dataType, prefix=f"{path}."))
        else:
            out[path] = f.dataType.simpleString()
    return out


def schema_diff(
    old: StructType | DataFrame, new: StructType | DataFrame
) -> list[dict]:
    """List of ``{path, kind, old_type, new_type}`` changes from ``old``
    to ``new``, ordered by severity then path (deterministic)."""
    o = _flatten(old.schema if isinstance(old, DataFrame) else old)
    n = _flatten(new.schema if isinstance(new, DataFrame) else new)
    changes = []
    for path in sorted(o.keys() | n.keys()):
        ot, nt = o.get(path), n.get(path)
        if ot == nt:
            continue
        kind = "added" if ot is None else "removed" if nt is None else "type_changed"
        changes.append(
            {"path": path, "kind": kind, "old_type": ot, "new_type": nt}
        )
    changes.sort(key=lambda c: (KINDS.index(c["kind"]), c["path"]))
    return changes


def schema_diff_report(
    spark: SparkSession, old: StructType | DataFrame, new: StructType | DataFrame
) -> DataFrame:
    """The same diff as a DataFrame so it can be unioned/written like any
    other audit output."""
    return spark.createDataFrame(
        [
            (c["path"], c["kind"], c["old_type"], c["new_type"])
            for c in schema_diff(old, new)
        ]
        or [],
        schema="path string, kind string, old_type string, new_type string",
    )


def compatible_for_merge(old, new, allow_added: bool = True) -> bool:
    """True when ``new`` can be merged into ``old``'s table: no type
    changes, no removals; additions allowed iff ``allow_added`` (they
    null-backfill under mergeSchema semantics)."""
    bad = {"type_changed", "removed"} | (set() if allow_added else {"added"})
    return not any(c["kind"] in bad for c in schema_diff(old, new))
