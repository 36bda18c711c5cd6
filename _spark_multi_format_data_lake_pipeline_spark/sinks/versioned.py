"""Versioned parquet tables: snapshot manifests, time travel, atomic
commit — the table-format mechanism (Iceberg/Delta's core ideas) built
jar-free on plain parquet + JSON manifests.

The reference targets Iceberg format-version 2 (reference
utils/spark_write_iceberg.py:10-84: snapshots, SHOW TABLES audit); this
sandbox has no Iceberg jars (PLANS.md environment probes r4-r6), so the
production writer degrades to ``saveAsTable``. This module closes the
CONCEPTUAL half of that gap with the minimal honest implementation of
what a table format actually is:

- data files are immutable parquet files under ``<path>/data/``, each
  written once under a UUID name and never rewritten;
- a snapshot is a JSON manifest under ``<path>/_manifests/v{N}.json``
  listing exactly the data files (+ row count, schema) visible at
  version N;
- a commit is the CREATION of the next manifest — staged to a temp name
  and atomically renamed with O_EXCL semantics, so of two concurrent
  committers exactly one wins and the loser gets a clean
  ``ConcurrentCommitError`` to retry on (optimistic concurrency, the
  Delta/Iceberg protocol); readers never see a partial commit because
  they only ever list files through a manifest that exists;
- time travel = reading through an older manifest; rollback = COMMITTING
  a new version whose file list equals the old one (history is never
  destroyed — same as Iceberg rollback);
- appends add files, overwrites start a fresh file list; either way old
  versions stay readable until an explicit ``vacuum`` drops files no
  retained manifest references.

Manifests also carry per-file column min/max stats (harvested from the
parquet footers at commit time — the Iceberg manifest-writer role), and
``read_version_pruned`` skips whole files whose range can't satisfy a
predicate BEFORE Spark ever lists them — the zone-map/data-skipping
half of the table-format story.  Files without stats for the probed
column are conservatively kept, so pruning is always correctness-safe.
Appends may ADD columns (``_merge_schemas``; readers see NULL for
pre-evolution files via parquet mergeSchema), and ``compact`` is the
OPTIMIZE half of maintenance: rewrite the current snapshot into fewer
files as a new version, history intact until vacuum.

Deliberate divergences from the real formats, documented: no partition
transforms, no row-level deletes (the engine's MERGE path stages whole
tables instead — sinks/merge.py), stats cover primitive int/float/
string/bool columns only, and the atomic rename relies on a
rename-if-absent filesystem primitive (true on POSIX/HDFS; on S3 use a
conditional-put or a commit service, exactly as Delta-on-S3 does)."""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first — reread and retry."""


def _manifest_dir(path: str) -> Path:
    return Path(path) / "_manifests"


def versions(path: str) -> list[int]:
    """Committed versions, ascending. Version numbers are the manifest
    file names — listing is one directory read, no file opens."""
    d = _manifest_dir(path)
    if not d.is_dir():
        return []
    out = []
    for f in d.iterdir():
        name = f.name
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    return json.loads((_manifest_dir(path) / f"v{version}.json").read_text())


def _commit(path: str, version: int, manifest: dict) -> None:
    """Atomic commit: write to a temp name, link into place with
    fail-if-exists semantics. ``os.link`` (and the rename on the POSIX
    fallback) raises FileExistsError if a concurrent writer won."""
    d = _manifest_dir(path)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".tmp-{uuid.uuid4().hex}.json"
    tmp.write_text(json.dumps(manifest, indent=1))
    target = d / f"v{version}.json"
    try:
        os.link(tmp, target)  # atomic, fails if target exists
    except FileExistsError as e:
        raise ConcurrentCommitError(
            f"version {version} of {path} was committed concurrently"
        ) from e
    finally:
        tmp.unlink(missing_ok=True)


def _harvest_file_stats(path: str, files: list[str]) -> dict[str, dict]:
    """Per-file column (min, max) ranges from the parquet footers the
    write just produced — driver-side, but bounded by the COMMIT's file
    count (one footer read per task output, the same work an Iceberg
    manifest writer does), never by table size.  Only primitive
    int/float/string/bool stats are kept; anything else (timestamps,
    decimals, nested) is skipped and those files simply never prune.

    A column's (min, max) is recorded only when EVERY row group of the
    file contributed usable stats for it: a statless (or undecodable)
    row group could hold rows outside the other groups' range, so a
    partially-covered range would under-cover the file and let
    ``read_version_pruned`` skip matching rows — the column is omitted
    instead and the file is conservatively kept."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for rel in files:
        stats: dict[str, list] = {}
        covered: dict[str, int] = {}
        try:
            md = pq.ParquetFile(str(Path(path) / rel)).metadata
        except Exception:  # unreadable footer → no stats, file always kept
            out[rel] = stats
            continue
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    try:
                        mn, mx = mn.decode(), mx.decode()
                    except UnicodeDecodeError:
                        continue
                if not (
                    isinstance(mn, (bool, int, float, str))
                    and isinstance(mx, (bool, int, float, str))
                ):
                    continue
                name = col.path_in_schema
                covered[name] = covered.get(name, 0) + 1
                if name in stats:
                    stats[name] = [min(stats[name][0], mn), max(stats[name][1], mx)]
                else:
                    stats[name] = [mn, mx]
        out[rel] = {
            k: v for k, v in stats.items() if covered[k] == md.num_row_groups
        }
    return out


def _write_snapshot(
    df: DataFrame, path: str, mode: str, txn_id: str | None = None
) -> int:
    """Shared body of versioned_write / versioned_write_txn: write the
    data files, list them, extend or replace the previous manifest's
    file list, commit the next version (one code path so file-listing /
    row-count semantics can never diverge between the two entries)."""
    if mode not in ("append", "overwrite", "compact"):
        raise ValueError(f"versioned snapshot write: unknown mode {mode!r}")
    data_dir = Path(path) / "data" / uuid.uuid4().hex
    df.write.mode("error").parquet(str(data_dir))
    new_files = sorted(
        str(p.relative_to(path))
        for p in data_dir.rglob("*.parquet")
        if p.is_file()
    )
    vs = versions(path)
    prev = _read_manifest(path, vs[-1]) if vs else {"files": [], "row_count": 0}
    append = mode == "append"
    files = prev["files"] + new_files if append else new_files
    n_new = df.sparkSession.read.parquet(str(data_dir)).count()
    new_stats = _harvest_file_stats(path, new_files)
    file_stats = (
        {**prev.get("file_stats", {}), **new_stats} if append else new_stats
    )
    schema = df.schema.jsonValue()
    if append and prev.get("schema"):
        schema = _merge_schemas(prev["schema"], schema)
    import time

    manifest = {
        "version": (vs[-1] + 1) if vs else 1,
        "mode": mode,
        "committed_at": time.time(),
        "files": files,
        "row_count": n_new + (prev["row_count"] if append else 0),
        "schema": schema,
        "file_stats": file_stats,
    }
    if txn_id is not None:
        manifest["txn_id"] = txn_id
    _commit(path, manifest["version"], manifest)
    return manifest["version"]


def _merge_schemas(prev_json: dict, new_json: dict) -> dict:
    """Schema evolution for appends: the snapshot schema is the union of
    the previous schema and the appended frame's (new columns ADD; a
    shared name with a different type is refused — no implicit type
    widening, the same conservative rule as Delta's default).  Readers
    see added columns as NULL for pre-evolution files (parquet
    mergeSchema reconciliation in ``read_version``)."""
    prev_fields = {f["name"]: f for f in prev_json["fields"]}
    merged = list(prev_json["fields"])
    for f in new_json["fields"]:
        old = prev_fields.get(f["name"])
        if old is None:
            merged.append(f)
        elif old["type"] != f["type"]:
            raise ValueError(
                f"schema evolution: column {f['name']!r} type changed "
                f"({old['type']!r} -> {f['type']!r}); no implicit widening"
            )
    return {**prev_json, "fields": merged}


def versioned_write(
    df: DataFrame, path: str, mode: str = "append"
) -> int:
    """Write ``df`` as the next snapshot of the table at ``path``;
    returns the committed version (1-based). ``mode="append"`` keeps the
    previous snapshot's files and adds new ones; ``mode="overwrite"``
    starts a fresh file list (old files stay on disk for time travel
    until ``vacuum``). Raises ``ConcurrentCommitError`` if another
    writer commits the same version first — callers retry by re-invoking
    (the data files written by the losing attempt are orphans that
    ``vacuum`` collects; they were never visible)."""
    return _write_snapshot(df, path, mode)


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: the table AS OF ``version`` (default: latest).
    Reads exactly the manifest's file list — a half-finished writer is
    invisible because its files are in no manifest."""
    vs = versions(path)
    if not vs:
        raise FileNotFoundError(f"no committed versions at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in {vs}")
    m = _read_manifest(path, v)
    if not m["files"]:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(m["schema"]))
    # mergeSchema: pre-evolution files surface added columns as NULL
    return spark.read.option("mergeSchema", "true").parquet(
        *[str(Path(path) / f) for f in m["files"]]
    )


def read_version_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
) -> DataFrame:
    """Snapshot read with manifest-level file pruning: files whose
    committed (min, max) range for ``col`` cannot intersect [lo, hi]
    are dropped from the scan file list before Spark sees them — the
    zone-map skip Iceberg/Delta do from manifest stats, one tier above
    parquet row-group pruning.  The predicate is ALSO applied to the
    surviving rows, so the result is always exactly
    ``read_version(...).filter(lo <= col <= hi)`` — pruning only
    changes how many files get opened.  Files with no stats for
    ``col`` are conservatively kept."""
    from pyspark.sql import functions as F

    vs = versions(path)
    if not vs:
        raise FileNotFoundError(f"no committed versions at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in {vs}")
    m = _read_manifest(path, v)
    all_stats = m.get("file_stats", {})
    keep = []
    for f in m["files"]:
        rng = all_stats.get(f, {}).get(col)
        if rng is not None:
            fmin, fmax = rng
            if lo is not None and fmax < lo:
                continue
            if hi is not None and fmin > hi:
                continue
        keep.append(f)
    if not keep:
        from pyspark.sql.types import StructType

        df = spark.createDataFrame([], StructType.fromJson(m["schema"]))
    else:
        df = spark.read.option("mergeSchema", "true").parquet(
            *[str(Path(path) / f) for f in keep]
        )
    if lo is not None:
        df = df.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(col) <= F.lit(hi))
    return df


def rollback(path: str, to_version: int) -> int:
    """Commit a NEW version whose visible state equals ``to_version`` —
    history is append-only, like Iceberg's rollback snapshot.

    The source manifest's ``txn_id`` is NOT carried into the rollback
    commit (it moves to ``rolled_back_txn_id`` for audit): a rollback
    changes the visible state, so a producer retrying that transaction
    afterwards must be allowed to land, not skipped by the one-deep
    ledger in ``versioned_write_txn``.

    ``committed_at`` is stamped FRESH (never inherited from the source
    manifest): the rollback became the table's state NOW, so a
    ``read_as_of`` probe at a time when some later version was current
    must keep resolving to that later version, not be shadowed by a
    rollback commit carrying the rolled-back-to snapshot's old clock."""
    import time

    m = dict(_read_manifest(path, to_version))
    txn = m.pop("txn_id", None)
    vs = versions(path)
    nxt = vs[-1] + 1
    manifest = {
        **m,
        "version": nxt,
        "mode": f"rollback:{to_version}",
        "committed_at": time.time(),
    }
    if txn is not None:
        manifest["rolled_back_txn_id"] = txn
    _commit(path, nxt, manifest)
    return nxt


def vacuum(path: str, keep_last: int = 1) -> list[str]:
    """Drop data files referenced by NO retained manifest (the last
    ``keep_last`` versions survive; earlier manifests are removed).
    Returns the deleted file list. The one deliberately destructive
    operation in the module — time travel before the retention horizon
    is gone after this, which is exactly Iceberg/Delta VACUUM."""
    vs = versions(path)
    if not vs:
        return []
    keep = vs[-keep_last:] if keep_last > 0 else []
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(path, v)["files"])
    deleted = []
    data_root = Path(path) / "data"
    if data_root.is_dir():
        for p in sorted(data_root.rglob("*.parquet")):
            rel = str(p.relative_to(path))
            if rel not in live:
                p.unlink()
                deleted.append(rel)
        # Sweep the per-write UUID directories that no longer hold any
        # live data file: drop stray markers (_SUCCESS, .crc) and rmdir,
        # so a long-lived table doesn't accumulate empty directories.
        for d in sorted(data_root.iterdir()):
            if not d.is_dir():
                continue
            if any(str(p.relative_to(path)) in live for p in d.rglob("*.parquet")):
                continue
            for leftover in sorted(d.rglob("*"), reverse=True):
                if leftover.is_file():
                    leftover.unlink()
                elif leftover.is_dir():
                    leftover.rmdir()
            d.rmdir()
    for v in vs:
        if v not in keep:
            (_manifest_dir(path) / f"v{v}.json").unlink(missing_ok=True)
    return deleted


def read_as_of(spark: SparkSession, path: str, ts: float) -> DataFrame:
    """Timestamp time travel: the table as of wall-clock ``ts`` (unix
    seconds) — the version that was CURRENT at ``ts``, i.e. the one with
    the greatest ``committed_at`` <= ts (version number breaks clock
    ties), the Iceberg/Delta ``TIMESTAMP AS OF`` contract.  Max-by-time
    rather than max-by-version matters once rollbacks exist: a rollback
    commit restores OLD data at a NEW time, and a probe between the
    original commit and the rollback must keep resolving to what was
    visible then.  Commits written before the ``committed_at`` field
    existed fall back to the manifest file's mtime (the commit IS the
    manifest's creation, so mtime is the commit clock) — upgraded tables
    keep timestamp travel over their pre-existing history.  A ts before
    the first commit raises — an honest 'no snapshot existed then'
    instead of silently serving the oldest."""
    best: tuple[float, int] | None = None
    for v in versions(path):
        at = _read_manifest(path, v).get("committed_at")
        if at is None:
            try:
                at = (_manifest_dir(path) / f"v{v}.json").stat().st_mtime
            except OSError:
                continue
        if at <= ts and (best is None or (at, v) > best):
            best = (at, v)
    if best is None:
        raise ValueError(f"no snapshot of {path} existed at ts={ts}")
    return read_version(spark, path, best[1])


def compact(spark: SparkSession, path: str, target_files: int = 1) -> int:
    """OPTIMIZE / bin-packing compaction: rewrite the CURRENT snapshot's
    rows into ``target_files`` parquet files and commit the result as a
    new version (mode ``compact``) with an identical row set.  Streaming
    sinks commit one small file set per micro-batch; periodic compaction
    is how a real table format keeps the file count from eating the
    scan planner.  History is preserved — pre-compaction versions stay
    readable until ``vacuum`` reclaims their files — and the commit
    goes through the same optimistic ``_commit``, so a concurrent
    writer still gets exactly-one-winner semantics."""
    return _write_snapshot(
        read_version(spark, path).coalesce(target_files), path, "compact"
    )


def last_txn_id(path: str) -> str | None:
    """The app-level transaction id recorded by the most recent commit
    (None when the table is empty or the last commit carried none)."""
    vs = versions(path)
    if not vs:
        return None
    return _read_manifest(path, vs[-1]).get("txn_id")


def versioned_write_txn(
    df: DataFrame, path: str, txn_id: str, mode: str = "append"
) -> int | None:
    """``versioned_write`` with an application transaction id — the
    Delta ``txn`` / Iceberg snapshot-property mechanism that makes
    at-least-once producers (foreachBatch replays!) exactly-once: the
    txn id is recorded in the committed manifest, and a write whose
    ``txn_id`` equals the LAST commit's id is skipped (returns None) —
    the replayed batch already landed. Only the latest id is checked:
    foreachBatch replays are always of the most recent batch (Spark
    never re-runs batch N after N+1 committed), so a one-deep ledger is
    sufficient and stays O(1). Concurrent-commit losers retry through
    the same check and discover their batch landed."""
    if not isinstance(txn_id, str) or not txn_id:
        # None == None against a ledger-less head manifest would silently
        # SKIP the write — refuse ambiguous ids outright
        raise ValueError("versioned_write_txn: txn_id must be a non-empty string")
    if last_txn_id(path) == txn_id:
        return None
    return _write_snapshot(df, path, mode, txn_id=txn_id)
