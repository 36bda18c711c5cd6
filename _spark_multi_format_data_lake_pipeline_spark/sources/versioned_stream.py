"""Streaming source over versioned tables (``sinks/versioned.py``) —
the Delta "table as a stream" contract, jar-free.

``spark.readStream.format("versioned_changes").option("path", t)``
follows a versioned table's commit log: each micro-batch covers the
versions committed since the last offset, and its input partitions are
exactly the DATA FILES those commits added — planned driver-side from
the JSON manifests (metadata only), read executor-side with pyarrow.
Nothing is ever collected on the driver; a batch's cost is the new
files' bytes, however large the table is.

Semantics mirror Delta's streaming source: APPEND commits stream their
new rows; a commit that rewrites or logically deletes rows (upsert /
delete / compact / overwrite / DV commit) is refused with an error —
an append-only stream cannot represent it — unless
``skipChangeCommits=true``, which ignores those commits' file changes
and keeps streaming subsequent appends (Delta's ``skipChangeCommits``).
Offsets are plain ``{"version": N}`` dicts checkpointed by the engine;
replaying a (start, end] range re-plans the same manifests and re-reads
the same immutable files, which is the replayability contract
Structured Streaming requires.

Metadata-only commits (add/drop CHECK constraint — any commit whose
data-file list AND delete-vector state are unchanged) are no-ops: they
change what future writes must satisfy, not what rows exist, so the
stream passes over them without raising (and without needing
``skipChangeCommits``).  A checkpointed offset that has fallen behind
the vacuum retention horizon RAISES (Delta's offset-behind-retention
error): the trimmed manifests make the missed changes unreconstructable
and re-emitting the surviving snapshot would silently duplicate every
row the stream already delivered.  A FRESH stream (no checkpoint) on an
ever-vacuumed table instead bootstraps: it has delivered nothing, so
``initialOffset`` serves the earliest surviving snapshot as the initial
load (Delta's initial-snapshot behavior) via a marked offset that
replays batch 0 identically; ``startingVersion='earliest'`` requests
the same bootstrap explicitly.  ``startingTimestamp`` streams every
commit at or after a wall clock (past the head / behind retention
raise); ``endingVersion`` / ``endingTimestamp`` BOUND the stream — the
offset parks at the bound, so ``availableNow`` drains exactly through
it and stops (the backfill shape Delta's batch-only CDF options can't
express).

RATE LIMITING (Delta's ``maxFilesPerTrigger``/``maxBytesPerTrigger``):
with either option set, ``latestOffset`` walks the commit log from the
reader's cursor and stops at the cap, emitting SUB-COMMIT offsets
``{"version": V, "file_index": K}`` (K files of version V's committed
new-file list delivered) — one huge commit, or the initial snapshot,
then drains as a sequence of bounded micro-batches instead of one
table-sized one.  The byte cap is a soft max: every batch admits at
least one file.  Offsets slice the manifest's committed file-list
order, so a restart mid-commit replays the exact same split
(exactly-once).  The cursor is seeded eagerly at reader construction
(the Python DS API calls ``latestOffset`` before ``initialOffset`` and
passes no start offset); on a restarted query whose checkpoint is
ahead of the seed, ``partitions``' offset-order guards discard at most
one empty regressed batch and snap the cursor to the checkpoint — no
duplicate, no loss, at most one wasted trigger — PROVIDED the same
reader instance survives to serve the catch-up batch.  A second
restart (or clean stop) landing exactly on the regressed commit would
resume from a lying checkpoint; the reader therefore PERSISTS the
committed high-water offset via ``commit()`` and seeds fresh
instances AT the boundary — no regressed commits at all, caps hold
across restarts.  ON BY DEFAULT: the Python DS API hides the query's
checkpointLocation, so the floor defaults to a per-query-shape dir
under ``<table>/_stream_offsets/`` (see ``__init__`` for why sharing
one is loss/duplicate-free); ``offsetTrackingLocation`` overrides the
location (one dir per query, like ``checkpointLocation`` —
``drain_versioned_changes`` sets one beside its checkpoint) and
``offsetTrackingLocation=none`` opts out entirely.  A query whose
CHECKPOINT is behind an inherited floor (a second query with the same
option shape, or a deliberately reset checkpoint) gets the gap as ONE
batch the caps cannot bound — correctness requires the jump (capped
sub-floor ends would let the floor owner's engine log a regressed
offset, the double-restart duplicate window the floor closes), so
``floorJumpPolicy`` governs how loudly: ``warn`` (default) /
``error`` / ``silent``.  ``initialOffsetFromFloor=true`` makes a
FRESH query start AT the floor instead of replaying below it — for
explicit per-query tracking dirs that ARE the query's own delivery
record (the replication helpers set it).  With
``Trigger.AvailableNow`` the engine snapshots ONE end offset per run,
so a capped stream drains exactly one capped batch per availableNow
run (re-run to continue — each run picks up where the checkpoint
left off); use a running ``processingTime`` trigger to drain a whole
backlog under the cap in one query, as Delta's admission-control
integration would.

Partition-column handling matches the batch reader: values are parsed
from the Hive path through the COMMITTED schema (never re-inferred) and
re-attached as constants; the hidden ``__bucket`` layout column stays
hidden.  Row emission is Arrow RecordBatches (file-at-a-time pyarrow
read, cast to the committed schema — zero per-row Python on the fast
path) with a tuple-per-row fallback for exotic types the cast path
can't bridge; the planning path is O(new files) either way.
"""

from __future__ import annotations

from collections.abc import Iterator
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ..sinks.versioned import (
    _BUCKET_COL,
    _cdf_file_meta,
    _partition_values,
    _read_manifest,
    versions,
)

# commit modes whose file additions are pure appends (the initial commit
# is append-like whatever verb created it: there were no prior rows to
# change)
_APPEND_MODES = ("append",)

# extra output fields of readChangeFeed mode (Delta streaming CDF)
_CDF_FIELDS = [
    {
        "name": "_change_type",
        "type": "string",
        "nullable": True,
        "metadata": {},
    },
    {
        "name": "_commit_version",
        "type": "long",
        "nullable": True,
        "metadata": {},
    },
]


class _FilePartition(InputPartition):
    def __init__(
        self,
        abs_path: str,
        part_values: dict,
        cmap: dict,
        rel_name: str = "",
        dv_paths: tuple[str, ...] = (),
    ):
        self.abs_path = abs_path
        self.part_values = part_values  # keyed by PHYSICAL column name
        self.cmap = cmap  # logical → physical (files carry physical)
        # Initial-snapshot bootstrap only: the earliest surviving
        # manifest may carry DELETION VECTORS for this file — the
        # snapshot batch must serve current table state (Delta
        # initial-snapshot semantics), so the DV parquet paths ride the
        # partition and ``read`` drops the recorded positions before
        # emitting.  ``rel_name`` is the manifest-relative name the DV
        # rows key this file by.
        self.rel_name = rel_name
        self.dv_paths = tuple(dv_paths)


def _visible_fields(schema_json: dict, has_buckets: bool) -> list[dict]:
    return [
        f
        for f in schema_json["fields"]
        if not (has_buckets and f["name"] == _BUCKET_COL)
    ]


class VersionedChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = _resolve_path_option(options)
        if not self.path:
            raise ValueError("versioned_changes: option 'path' is required")
        self.skip_change_commits = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        # readChangeFeed (Delta's streaming CDF): row-level commits no
        # longer refuse — their MATERIALIZED change files
        # (enable_change_data_feed) stream as update_preimage /
        # update_postimage / delete rows, appends stream their data
        # files as inserts, and every row carries _change_type +
        # _commit_version.  Contradicts skipChangeCommits (one ignores
        # changes, the other demands them).
        self.read_change_feed = (
            str(options.get("readChangeFeed", "false")).lower() == "true"
        )
        if self.read_change_feed and self.skip_change_commits:
            raise ValueError(
                "versioned_changes: readChangeFeed and skipChangeCommits "
                "are contradictory — one demands row changes, the other "
                "ignores them"
            )
        # Rate limiting (Delta's maxFilesPerTrigger/maxBytesPerTrigger):
        # cap each micro-batch's admitted data files / manifest-recorded
        # bytes.  ``latestOffset`` then returns SUB-COMMIT offsets
        # ``{"version": V, "file_index": K}`` ("K files of version V's
        # deterministic new-file list delivered"), so one huge commit —
        # or the initial snapshot — streams as many bounded batches
        # instead of one table-sized one.  The byte cap is a soft max:
        # every batch admits at least one file (Delta's rule — a single
        # file larger than the cap must still make progress).
        mft = options.get("maxFilesPerTrigger")
        mbt = options.get("maxBytesPerTrigger")
        self._max_files = int(mft) if mft is not None else None
        self._max_bytes = int(mbt) if mbt is not None else None
        if self._max_files is not None and self._max_files < 1:
            raise ValueError("maxFilesPerTrigger must be >= 1")
        if self._max_bytes is not None and self._max_bytes < 1:
            raise ValueError("maxBytesPerTrigger must be >= 1")
        start = options.get("startingVersion", "0")
        st = options.get("startingTimestamp")
        # Timestamp options resolve at construction, but a RESOLUTION
        # FAILURE must not kill a RESTARTED query: the checkpoint, not
        # the option, governs a restart (Delta ignores starting options
        # once one exists), and vacuum can legitimately move the
        # horizon past a timestamp that resolved fine at first start.
        # The reader cannot know fresh-vs-restart here, so failures are
        # DEFERRED: recorded and raised from initialOffset — which the
        # engine only calls on a fresh stream.
        self._init_error: Exception | None = None
        if st is not None:
            # Delta's startingTimestamp: stream every commit at or
            # after this wall clock (resolution + the past-the-head /
            # behind-retention errors live in version_at_or_after).
            # Our start offset means "delivered through", so the first
            # qualifying version minus one is the seed.
            if options.get("startingVersion") is not None:
                raise ValueError(
                    "versioned_changes: startingVersion and "
                    "startingTimestamp are mutually exclusive"
                )
            from ..sinks.versioned import version_at_or_after

            try:
                self.start_version = (
                    version_at_or_after(self.path, float(st)) - 1
                )
            except (ValueError, FileNotFoundError) as e:
                self._init_error = e
                self.start_version = 0  # restart: checkpoint governs
            self.from_earliest = False
        elif str(start).strip().lower() == "earliest":
            # explicit "bootstrap from whatever survives" request
            self.start_version = 0
            self.from_earliest = True
        else:
            self.start_version = int(start)
            self.from_earliest = False
        # endingVersion / endingTimestamp: a BOUNDED stream — the
        # backfill shape ("drain the feed through v42 / through last
        # midnight, then stop").  latestOffset never advances past the
        # bound, so trigger(availableNow) terminates at it and a
        # continuous stream idles there.  Delta's batch CDF has these
        # options; giving them to the stream composes with availableNow
        # to make bounded replication a one-liner.
        ev_opt = options.get("endingVersion")
        et_opt = options.get("endingTimestamp")
        if ev_opt is not None and et_opt is not None:
            raise ValueError(
                "versioned_changes: endingVersion and endingTimestamp "
                "are mutually exclusive"
            )
        if et_opt is not None:
            from ..sinks.versioned import version_at_or_before

            try:
                self.end_version: int | None = version_at_or_before(
                    self.path, float(et_opt)
                )
            except (ValueError, FileNotFoundError) as e:
                # no surviving commit at/before the bound: a restarted
                # drained stream parks (nothing before the earliest
                # survivor may stream); a fresh stream raises below
                self._init_error = self._init_error or e
                vs0 = versions(self.path)
                self.end_version = (vs0[0] - 1) if vs0 else 0
        elif ev_opt is not None:
            self.end_version = int(ev_opt)
            if self.end_version < 1:
                raise ValueError(
                    "versioned_changes: endingVersion must be >= 1"
                )
        else:
            self.end_version = None
        if (
            self.end_version is not None
            and self.end_version <= self.start_version
            and self._init_error is None  # deferred failures park/raise
        ):
            raise ValueError(
                f"versioned_changes: endingVersion "
                f"{self.end_version} does not exceed the starting "
                f"offset v{self.start_version} — nothing to stream"
            )
        # the emitted field list is FIXED at stream start (the declared
        # schema): later schema evolution adds columns new files carry
        # but this stream does not emit — restart the stream to widen,
        # exactly Delta's behavior
        vs = versions(self.path)
        if not vs:
            raise FileNotFoundError(
                f"no committed versions at {self.path}"
            )
        m = _read_manifest(self.path, vs[-1])
        self._fields = _visible_fields(
            m["schema"], bool(m.get("bucket_by"))
        )
        if self.read_change_feed:
            self._fields = list(self._fields) + _CDF_FIELDS
        # column resolution pairs with the FIELD LIST's vintage, not
        # each planned commit's: physical names are stable forever, so
        # the construction-time logical->physical mapping locates every
        # live file's columns — a pre-rename file read under a
        # post-rename reader resolves through the NEW mapping (the old
        # manifest predates it and carries none)
        self._cmap = dict(m.get("column_mapping") or {})
        # Schema tracking (Delta's ``schemaTrackingLocation``): persist
        # the field-list vintage this reader emits under.  A restart
        # after a rename/drop then ADOPTS the new committed schema
        # (physical names are stable, so every live file still
        # resolves), updates the tracked copy, and surfaces a one-time
        # schema-changed marker (file + warning) recording old -> new —
        # the restart half of the mid-stream-evolution contract the
        # module docstring pins.  Without the option, behavior is
        # unchanged (the field list still re-derives from the head at
        # construction; nothing records that it changed).
        track = options.get("schemaTrackingLocation")
        if track:
            self._track_schema(str(track), vs[-1])
        # CURSOR: where the capped ``latestOffset`` walks from.  Seeded
        # EAGERLY with the stream's start offset — the engine calls
        # ``latestOffset`` before ``initialOffset`` on a fresh stream
        # (the Python DS API has no admission-control hook passing the
        # start in), so a lazy cursor would leave batch 0 — the initial
        # snapshot, the batch the cap exists for — unbounded.  On a
        # RESTARTED query the checkpoint may be ahead of this seed; the
        # engine's replay of an in-flight batch corrects it via
        # ``partitions`` before the first capped plan, and the
        # clean-boundary case degrades to at most one EMPTY regressed
        # batch (``partitions`` offset-order guard) before the cursor
        # snaps to the true position — never a duplicate row.
        self._cursor: dict = self._start_offset()
        self._regress_from: dict | None = None
        self._regress_to: dict | None = None
        # offsetTrackingLocation (restart-safe capped offsets): the
        # regression dance above keeps a capped restart exactly-once
        # only while the SAME reader instance survives to serve the
        # catch-up batch — the engine COMMITS the regressed end, so a
        # second restart (or a clean stop) landing on that boundary
        # resumes from a lying checkpoint and re-delivers.  The reader
        # therefore persists the engine's committed high-water offset
        # (``commit``) under a tiny state dir and a fresh instance
        # seeds its cursor AT the floor and never returns an offset
        # below it: no regressed commits, caps hold across restarts,
        # exactly-once without the dance.
        #
        # DEFAULT ON (r15): the Python DataSource API never tells the
        # reader its query's checkpointLocation, so with no explicit
        # option the floor lives under the TABLE at
        # ``<path>/_stream_offsets/<sha256(path + options)[:16]>`` —
        # one dir per query SHAPE.  Two concurrent queries only share a
        # floor when their full option sets match, and sharing is
        # loss/duplicate-free either way: the floor only ever RAISES an
        # end offset (each query's own checkpoint still governs what
        # was delivered), so a query lagging a shared floor merely gets
        # one larger-than-cap batch.  The persisted file is monotone
        # (``commit`` never lowers it) and a floor BEYOND the current
        # head is ignored as stale — the one way a floor can outlive
        # its table is the table being re-created underneath it, and
        # planning past the head would make the engine checkpoint
        # versions that don't exist yet (skipping their future rows).
        # ``offsetTrackingLocation=none`` opts out (in-memory floor
        # only — the pre-r15 documented divergence);
        # ``drain_versioned_changes`` still sets an explicit
        # per-checkpoint location, which is strictly sharper.
        self._floor: dict | None = None
        self._track_offsets: Path | None = None
        ol = options.get("offsetTrackingLocation")
        if ol is not None and str(ol).strip().lower() in (
            "none", "off", "false",
        ):
            ol = None
        elif not ol:
            import hashlib as _hashlib
            import json as _json

            ident = _hashlib.sha256(
                _json.dumps(
                    [
                        str(Path(self.path).resolve()),
                        sorted(
                            (str(k).lower(), str(v))
                            for k, v in dict(options).items()
                            # tracking/policy options don't change WHAT
                            # the stream delivers, so they must not
                            # change which floor governs it
                            if str(k).lower()
                            not in (
                                "offsettrackinglocation",
                                "floorjumppolicy",
                                "initialoffsetfromfloor",
                            )
                        ),
                    ]
                ).encode()
            ).hexdigest()[:16]
            ol = str(Path(self.path) / "_stream_offsets" / ident)
        if ol:
            import json as _json

            self._track_offsets = Path(str(ol))
            try:
                floor = _json.loads(
                    (self._track_offsets / "cursor.json").read_text()
                )
            except (OSError, ValueError):
                floor = None
            if not (isinstance(floor, dict) and "version" in floor):
                floor = None  # corrupt/foreign file: ignore, heal below
            if floor is not None and floor.get("version", 0) > vs[-1]:
                # stale incarnation: the head only ever grows, so a
                # floor beyond it can only be a leftover of a table
                # re-created at the same path — drop the file so the
                # dir heals and future commits persist normally
                # (best-effort: a read-only dir just keeps ignoring it)
                floor = None
                try:
                    (self._track_offsets / "cursor.json").unlink(
                        missing_ok=True
                    )
                except OSError:
                    pass
            if (
                floor is not None
                and self.end_version is not None
                and self._okey(floor)
                > self._okey({"version": self.end_version})
            ):
                # a floor persisted by an UNBOUNDED sharer of this
                # (explicit) location may lie past this query's bound —
                # cap it, or the clamp would hand the engine an end
                # offset beyond the declared endingVersion
                floor = {"version": self.end_version}
            if floor is not None:
                self._floor = floor
                if self._okey(floor) > self._okey(self._cursor):
                    self._cursor = dict(floor)
        # The floor's one hazard: a DIFFERENT query with the same
        # option shape (or a deliberately reset checkpoint) inherits a
        # persisted floor that does not reflect ITS deliveries — its
        # first batch then jumps (checkpoint, floor] in ONE batch,
        # ignoring the rate caps.  Returning capped sub-floor ends
        # instead is NOT safe (the true floor owner's engine would
        # durably log a regressed offset — the double-restart duplicate
        # window the floor exists to close), so correctness keeps the
        # jump; ``floorJumpPolicy`` decides how loudly: "warn"
        # (default — planning a cap-exceeding floor jump warns with
        # remediation), "error" (refuse the batch; the user picks a
        # fresh offsetTrackingLocation, =none, or accepts the jump
        # explicitly), "silent".  ``initialOffsetFromFloor=true`` makes
        # a FRESH query (no engine checkpoint) START at the floor
        # instead of replaying from the beginning — correct exactly
        # when the tracking dir is this query's own delivery record
        # (an explicit per-query location, e.g. the replication
        # helpers' cursor beside their checkpoint, where the floor may
        # have been advanced by the batch-mode fast path).
        self._floor_seed = dict(self._floor) if self._floor else None
        pol = str(options.get("floorJumpPolicy", "warn")).strip().lower()
        if pol not in ("warn", "error", "silent"):
            raise ValueError(
                "versioned_changes: floorJumpPolicy must be one of "
                f"warn/error/silent, got {pol!r}"
            )
        self._floor_jump_policy = pol
        self._init_from_floor = (
            str(options.get("initialOffsetFromFloor", "false")).lower()
            == "true"
        )

    def _track_schema(self, track_dir: str, head_version: int) -> None:
        """Compare the committed field list against the tracked vintage
        under ``track_dir``; on change, adopt the new one (already in
        ``self._fields``), rewrite the tracked copy, and surface a
        one-time marker file + warning.  First run just records."""
        import json
        import os as _os
        import time
        import uuid as _uuid
        import warnings

        d = Path(track_dir)
        d.mkdir(parents=True, exist_ok=True)
        cur = {"fields": self._fields, "column_mapping": self._cmap}
        p = d / "schema.json"

        def _write(obj: dict) -> None:
            tmp = d / f".tmp-{_uuid.uuid4().hex}"
            tmp.write_text(json.dumps(obj, indent=1))
            _os.replace(tmp, p)

        if not p.exists():
            _write({**cur, "head_version": head_version})
            return
        prev = json.loads(p.read_text())
        if (
            prev.get("fields") == cur["fields"]
            and prev.get("column_mapping") == cur["column_mapping"]
        ):
            return
        marker = d / f"schema_change_at_v{head_version}.json"
        if not marker.exists():
            marker.write_text(
                json.dumps(
                    {
                        "old": {
                            k: prev.get(k)
                            for k in ("fields", "column_mapping", "head_version")
                        },
                        "new": {**cur, "head_version": head_version},
                        "at": time.time(),
                    },
                    indent=1,
                )
            )
        warnings.warn(
            f"versioned_changes: source schema at {self.path} changed "
            f"since the tracked vintage (see {marker}); this restart "
            "emits under the NEW committed schema",
            stacklevel=2,
        )
        _write({**cur, "head_version": head_version})

    @staticmethod
    def _okey(off: dict) -> tuple:
        """Total order over stream offsets: a version is past all its
        partial prefixes (``{"version": v}`` ≡ every file of v
        delivered, so it sorts after ``{"version": v, "file_index": k}``
        for any k)."""
        return (off["version"], off.get("file_index", float("inf")))

    def _start_offset(self) -> dict:
        vs = versions(self.path)
        if (
            vs
            and vs[0] > 1
            and (self.from_earliest or self.start_version == 0)
        ):
            return {"version": vs[0] - 1, "snapshot_start": True}
        return {"version": self.start_version}

    def initialOffset(self) -> dict:
        # A FRESH stream (no checkpoint — the engine only calls
        # initialOffset then) on an ever-vacuumed table has delivered
        # nothing, so serving the earliest surviving snapshot as the
        # initial load duplicates nothing — Delta's initial-snapshot
        # behavior.  The marked offset is checkpointed with batch 0 and
        # replays identically; genuinely checkpointed plain offsets
        # that fell behind retention still raise in ``partitions``.
        if self._init_error is not None:
            # a timestamp option failed to resolve and this IS a fresh
            # stream (restarts never reach here) — the option is live,
            # so the deferred error is the honest answer
            raise self._init_error
        off = self._start_offset()
        if (
            self._init_from_floor
            and self._floor is not None
            and self._okey(self._floor) > self._okey(off)
        ):
            # initialOffsetFromFloor: this fresh query's tracking dir
            # IS its delivery record — start at the boundary instead of
            # replaying everything below it (see __init__)
            return dict(self._floor)
        return off

    def _iter_new_files(self, lo: int, ev: int, vs: list[int]):
        """Walk versions in (lo, ev], yielding (v, manifest, files,
        is_first, kind) for each commit that contributes rows — the
        shared commit-follow logic of ``partitions`` (which builds
        input partitions from the yields) and the capped
        ``latestOffset`` (which only counts files/bytes).  ``kind`` is
        ``"data"`` (files are new DATA files — append rows / the
        bootstrap snapshot) or ``"cdf"`` (files are the commit's
        materialized CHANGE files, readChangeFeed mode).  Metadata-only
        commits are passed over; non-append change commits raise
        unless ``skipChangeCommits`` (ignored) or ``readChangeFeed``
        (streamed from their feed files; raising when a row-level
        commit carries none — a silent gap would be worse).  File
        lists follow the manifest's committed order, so slicing by a
        checkpointed ``file_index`` replays identically."""
        prev: dict | None = None
        any_planned = False
        last_v: int | None = None
        for v in vs:
            if v <= lo or v > ev:
                continue
            if self.read_change_feed:
                # CDF contiguity: each commit's feed files are
                # self-contained, so a vacuumed version in the walk is
                # a SILENT hole in the change stream (unlike the
                # append diff, which accumulates across survivors).
                # Tag+vacuum leaves such gaps mid-history — refuse
                # rather than omit (the batch read_change_feed raises
                # the matching error).
                exp = (last_v if last_v is not None else lo) + 1
                if v != exp:
                    raise ValueError(
                        "versioned_changes: readChangeFeed needs every "
                        f"version in ({lo}, {ev}] but "
                        f"v{exp}..v{v - 1} were vacuumed at "
                        f"{self.path} — their change rows are "
                        "unreconstructable; restart from a fresh "
                        "checkpoint past the gap or rebuild from a "
                        "snapshot diff"
                    )
                last_v = v
            m = _read_manifest(self.path, v)
            if prev is None:
                pm = [pv for pv in vs if pv < v]
                prev = (
                    _read_manifest(self.path, pm[-1]) if pm else {"files": []}
                )
            is_first = v == vs[0]
            pf = set(prev["files"])
            new_files = [f for f in m["files"] if f not in pf]
            removed = [f for f in prev["files"] if f not in set(m["files"])]
            dv_same = (m.get("dv_files") or []) == (
                prev.get("dv_files") or []
            ) and (m.get("dv_counts") or {}) == (prev.get("dv_counts") or {})
            prev = m
            any_planned = True
            if not is_first and not new_files and not removed and dv_same:
                # metadata-only commit (add/drop-constraint, or any
                # verb that touched neither data files nor delete
                # vectors): no rows changed — pass over it instead of
                # stalling the stream
                continue
            is_append = m.get("mode") in _APPEND_MODES or is_first
            if not is_append:
                if self.read_change_feed:
                    if m.get("mode") == "compact":
                        continue  # row-preserving rewrite: empty feed
                    cdf = m.get("cdf_files") or []
                    if not cdf:
                        raise ValueError(
                            f"versioned_changes: version {v} is a "
                            f"{m.get('mode')!r} commit with no "
                            "materialized change files — committed "
                            "before enable_change_data_feed, or an "
                            "unsupported verb; restart from a fresh "
                            "checkpoint past it or use the batch "
                            "read_changes fallback"
                        )
                    yield v, m, cdf, False, "cdf"
                    continue
                if not self.skip_change_commits:
                    raise ValueError(
                        f"versioned_changes: version {v} is a "
                        f"{m.get('mode')!r} commit — an append-only "
                        "stream cannot represent row changes; set "
                        "skipChangeCommits=true to ignore them, or "
                        "readChangeFeed=true to stream their "
                        "materialized change rows (Delta's contract)"
                    )
                continue
            yield v, m, new_files, is_first, "data"
        if not any_planned and ev > lo:
            # range referenced versions that no longer exist (vacuumed):
            # honest error beats silently streaming nothing
            raise ValueError(
                f"versioned_changes: no manifests in "
                f"({lo}, {ev}] at {self.path}"
            )

    def _cap_hit(self, files: int, nbytes: int) -> bool:
        return bool(
            (self._max_files is not None and files >= self._max_files)
            or (self._max_bytes is not None and nbytes >= self._max_bytes)
        )

    def latestOffset(self) -> dict:
        off = self._latest_offset()
        if self._floor is not None and self._okey(off) < self._okey(
            self._floor
        ):
            # never hand the engine an offset below a committed
            # boundary we know about — a regressed commit is a lying
            # checkpoint (see offsetTrackingLocation in __init__)
            return dict(self._floor)
        return off

    def _latest_offset(self) -> dict:
        vs = versions(self.path)
        if self.end_version is not None:
            # bounded stream: commits past the bound are invisible —
            # the offset parks at the bound and availableNow terminates
            vs = [v for v in vs if v <= self.end_version]
        if not vs:
            return {"version": self.start_version}
        head = {"version": vs[-1]}
        if self._max_files is None and self._max_bytes is None:
            return head
        cur = self._cursor
        sv = cur["version"]
        s_idx = cur.get("file_index")
        if sv >= vs[-1] and s_idx is None:
            return head  # caught up
        lo = sv - 1 if s_idx is not None else sv
        if lo < vs[0] - 1 and not cur.get("snapshot_start"):
            # cursor fell behind retention: let partitions raise the
            # honest behind-retention error on the engine's next plan
            return head
        if (
            s_idx is not None
            and sv > 1
            and sv - 1 not in vs
            and not cur.get("snapshot_start")
            and not (
                self.read_change_feed
                and sv in vs
                and sv != vs[0]
                and (_read_manifest(self.path, sv).get("cdf_files"))
            )
        ):
            # Partial cursor whose DIFF BASE manifest (sv-1) was
            # vacuumed: sv surviving is not enough — file_index indexes
            # the new-file list diffed against sv-1, and any other base
            # misaligns the slice (a CDF slice is exempt: it indexes the
            # commit's own self-contained cdf_files list — see
            # partitions' guard).  Return head and let partitions raise
            # the honest error.
            return head
        files = 0
        nbytes = 0
        mark = dict(cur)
        snap = bool(cur.get("snapshot_start"))
        for v, m, new_files, _is_first, _kind in self._iter_new_files(
            lo, vs[-1], vs
        ):
            if _kind == "cdf":
                # change files have their own size plane (file_meta only
                # keys DATA files — a cdf lookup there would read 0 and
                # void byte pacing); legacy manifests without it get one
                # stat per file, the same cost the commit now pays
                meta = m.get("cdf_file_meta")
                if meta is None:
                    meta = _cdf_file_meta(self.path, new_files)
            else:
                meta = m.get("file_meta") or {}
            skip = s_idx if (s_idx is not None and v == sv) else 0
            for i in range(skip, len(new_files)):
                if files and self._cap_hit(files, nbytes):
                    self._cursor = mark
                    return mark
                files += 1
                nbytes += (meta.get(new_files[i], {}) or {}).get(
                    "bytes", 0
                ) or 0
                if i + 1 < len(new_files):
                    mark = {"version": v, "file_index": i + 1}
                    if snap and v == vs[0]:
                        # Partial mark INSIDE the bootstrap snapshot
                        # version: its file_index slices the FULL
                        # surviving file list (prev is empty by
                        # design), not a diff against v-1 — tag it so
                        # the diff-base-vacuumed guard knows the slice
                        # base is the snapshot and stays replayable.
                        mark["snapshot_start"] = True
                else:
                    mark = {"version": v}
            mark = {"version": v}
        self._cursor = head
        return head

    def partitions(self, start: dict, end: dict) -> list[_FilePartition]:
        out: list[_FilePartition] = []
        vs = versions(self.path)
        if self._floor is None or self._okey(start) > self._okey(
            self._floor
        ):
            # the engine's start IS a committed boundary — raise the
            # in-memory floor even without offsetTrackingLocation
            self._floor = dict(start)
        # floor-jump detection (see __init__): the engine's checkpoint
        # start is BELOW the floor this reader inherited from disk, so
        # this one batch spans the whole gap and the rate caps cannot
        # bound it — measure it and apply floorJumpPolicy below
        jump = (
            self._floor_seed is not None
            and (self._max_files is not None or self._max_bytes is not None)
            and self._okey(start) < self._okey(self._floor_seed)
            and self._okey(end) >= self._okey(self._floor_seed)
        )
        planned_bytes = 0
        # Offset-order guards for the capped reader's restart dance
        # (see __init__): the eager cursor seed can trail a restarted
        # query's checkpoint, making the first capped end REGRESS
        # behind the engine's start — plan nothing (those rows were
        # delivered before the restart), snap the cursor to the start,
        # and REMEMBER the regressed end: the engine commits it as the
        # batch boundary, so the NEXT batch arrives with exactly that
        # stale start and must resume from the true position instead
        # (its prefix was delivered pre-restart).  The mapping is
        # exact — recorded only by an observed regression and consumed
        # by the one batch that starts at it — so genuinely-behind
        # checkpoints still reach the retention error below, and
        # replays/steady-state batches take the plain path untouched.
        if self._okey(end) <= self._okey(start):
            if self._okey(self._cursor) < self._okey(start):
                self._cursor = dict(start)
                self._regress_from = dict(end)
                self._regress_to = dict(start)
            return []
        if self._regress_from is not None and start == self._regress_from:
            start = self._regress_to
            self._regress_from = self._regress_to = None
        if self._okey(self._cursor) < self._okey(end):
            self._cursor = dict(end)  # every planned batch advances it
        sv = start["version"]
        s_idx = start.get("file_index")
        ev = end["version"]
        e_idx = end.get("file_index")
        if vs and ev > sv:
            # Offset behind the vacuum retention horizon: version
            # numbering starts at 1, so an offset sv needs manifest sv
            # (its diff base) unless sv==0 streams the never-vacuumed
            # full history.  When that base is gone the missed changes
            # are unreconstructable — treating the earliest survivor as
            # a pure append would silently re-emit the whole snapshot
            # as duplicates, so RAISE instead (Delta's
            # offset-behind-retention contract).
            # A snapshot-start offset (fresh stream bootstrapping an
            # ever-vacuumed table, produced by ``initialOffset``) is
            # valid exactly while it still points one below the
            # earliest survivor: the first version then plans against
            # an empty prev and emits the full surviving snapshot.  If
            # vacuum moved the horizon past it (between checkpoint and
            # replay), replay could no longer reproduce batch 0, so it
            # degrades to the same behind-retention error.
            snapshot_ok = start.get("snapshot_start") and sv == vs[0] - 1
            if not snapshot_ok and (
                (0 < sv < vs[0]) or (sv == 0 and vs[0] > 1)
            ):
                raise ValueError(
                    f"versioned_changes: checkpointed offset version "
                    f"{sv} predates the earliest surviving manifest "
                    f"v{vs[0]} at {self.path} — the intervening commits "
                    "were vacuumed and cannot be replayed; restart the "
                    "stream from a fresh checkpoint (rows before the "
                    "retention horizon must be reprocessed explicitly)"
                )
            if (
                sv > vs[0]
                and sv not in vs
                and not self.read_change_feed
            ):
                # Offset inside a tag+vacuum INTERIOR gap (vacuum keeps
                # tagged versions, so gaps happen mid-history): the
                # append walk would diff the next survivor against a
                # survivor BELOW the offset, re-delivering files
                # committed at or before it — duplicates.  Same honest
                # refusal as the behind-retention case.  (readChangeFeed
                # mode raises its own contiguity error in the walk.)
                raise ValueError(
                    f"versioned_changes: checkpointed offset version "
                    f"{sv} references a vacuumed manifest (have {vs}) "
                    f"at {self.path} — the delivered prefix cannot be "
                    "diffed against a surviving base without "
                    "re-emitting rows; restart the stream from a "
                    "fresh checkpoint"
                )
        # A PARTIAL start offset ({"version": V, "file_index": K}, laid
        # down by a capped latestOffset) means K files of V's new-file
        # list were already delivered — planning resumes INSIDE V, so
        # the walk opens one version earlier and the first yield is
        # sliced.  A partial END offset truncates the last yield the
        # same way.  Both slices index the manifest's committed
        # file-list order, so a restart mid-commit replays the exact
        # same file split (the checkpoint-restart contract).
        #
        # That contract needs the slice BASE to replay too: file_index
        # indexes V's new-file list AS DIFFED AGAINST MANIFEST V-1.  If
        # vacuum removed V-1 (V surviving is not enough — vacuum keeps
        # tagged versions, so gaps happen mid-history, and the
        # behind-retention guard above only catches sv < vs[0]), the
        # replay would diff V against an older survivor — or against
        # EMPTY when V is the earliest — yielding a LONGER list whose
        # K-th element is not the K-th element originally delivered:
        # already-delivered files re-emit, breaking exactly-once.  The
        # one sanctioned empty-prev slice is the bootstrap snapshot
        # (tagged ``snapshot_start`` by the capped walk): there the
        # full surviving file list IS the delivered list, and it
        # replays identically while vs[0] is unchanged (the guard
        # above catches vs[0] moving).  Anything else raises the same
        # honest behind-retention error.
        for off, role in ((start, "start"), (end, "end")):
            o_idx = off.get("file_index")
            ov = off["version"]
            if (
                vs
                and o_idx is not None
                and ov > 1
                and ov - 1 not in vs
                and not (off.get("snapshot_start") and ov == vs[0])
                # a CDF-mode slice indexes the commit's OWN cdf_files
                # list (self-contained in its manifest) — no diff base
                # needed, so a vacuumed V-1 is harmless for it
                and not (
                    self.read_change_feed
                    and ov in vs
                    and ov != vs[0]  # the earliest survivor replans as
                    # a bootstrap SNAPSHOT, not a cdf slice
                    and (_read_manifest(self.path, ov).get("cdf_files"))
                )
            ):
                raise ValueError(
                    f"versioned_changes: checkpointed partial {role} "
                    f"offset v{ov}+{o_idx} at {self.path} needs "
                    f"manifest v{ov - 1} as its diff base, but that "
                    "version was vacuumed — the delivered file split "
                    "cannot be replayed; restart the stream from a "
                    "fresh checkpoint (rows before the retention "
                    "horizon must be reprocessed explicitly)"
                )
        lo = sv - 1 if s_idx is not None else sv
        for v, m, new_files, is_first, kind in self._iter_new_files(
            lo, ev, vs
        ):
            indexed = list(enumerate(new_files))
            if s_idx is not None and v == sv:
                indexed = indexed[s_idx:]
            if e_idx is not None and v == ev:
                indexed = [p for p in indexed if p[0] < e_idx]
            if not indexed:
                continue
            if jump:
                meta = (
                    m.get("cdf_file_meta")
                    if kind == "cdf"
                    else m.get("file_meta")
                ) or {}
                planned_bytes += sum(
                    (meta.get(f, {}) or {}).get("bytes", 0) or 0
                    for _i, f in indexed
                )
            if kind == "cdf":
                # materialized change files: no hive partition values,
                # no DV interplay; _change_type rides IN the parquet,
                # _commit_version rides as a constant (readChangeFeed
                # guarantees the extra fields are in self._fields)
                for _i, f in indexed:
                    out.append(
                        _FilePartition(
                            str(Path(self.path) / f),
                            {"_commit_version": v},
                            m.get("column_mapping") or {},
                            rel_name=f,
                        )
                    )
                continue
            fb = m.get("file_base") or {}
            cmap = m.get("column_mapping") or {}
            # The bootstrap's first version serves a SNAPSHOT, not an
            # append: when the earliest surviving manifest carries
            # deletion vectors (a DV delete happened before the vacuum
            # that trimmed the history), the raw data files still hold
            # the deleted rows — ship each DV'd file's vector paths so
            # ``read`` filters them and the batch matches
            # ``read_version`` exactly (Delta initial-snapshot
            # semantics).  Non-first versions are true appends whose
            # new files can carry no vectors.
            dv_counts = (m.get("dv_counts") or {}) if is_first else {}
            dv_paths = tuple(
                str(Path(fb.get(d, self.path)) / d)
                for d in (m.get("dv_files") or [])
            ) if dv_counts else ()
            cdf_consts = (
                {"_change_type": "insert", "_commit_version": v}
                if self.read_change_feed
                else {}
            )
            for _i, f in indexed:
                out.append(
                    _FilePartition(
                        str(Path(fb.get(f, self.path)) / f),
                        {
                            **{
                                cmap.get(n, n): pv
                                for n, pv in _partition_values(
                                    f, m["schema"], cmap
                                ).items()
                            },
                            **cdf_consts,
                        },
                        cmap,
                        rel_name=f,
                        dv_paths=dv_paths if f in dv_counts else (),
                    )
                )
        if jump and self._floor_jump_policy != "silent":
            exceeds = (
                self._max_files is not None and len(out) > self._max_files
            ) or (
                self._max_bytes is not None
                and planned_bytes > self._max_bytes
                and len(out) > 1
            )
            if exceeds:
                msg = (
                    f"versioned_changes: this query's checkpoint "
                    f"(offset {start}) is BEHIND the persisted offset "
                    f"floor {self._floor_seed} at "
                    f"{self._track_offsets or '<in-memory>'} — the "
                    f"floor was inherited from another query with the "
                    f"same option shape (or a reset checkpoint), so "
                    f"this ONE batch spans the whole gap: {len(out)} "
                    f"files / ~{planned_bytes} bytes, exceeding "
                    f"maxFilesPerTrigger={self._max_files} / "
                    f"maxBytesPerTrigger={self._max_bytes}.  Give this "
                    f"query its own offsetTrackingLocation (or =none) "
                    f"to stream the backlog under the caps, or set "
                    f"floorJumpPolicy=silent to accept unbounded "
                    f"catch-up batches"
                )
                if self._floor_jump_policy == "error":
                    raise ValueError(msg)
                import warnings

                warnings.warn(msg, stacklevel=2)
        return out

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        fields = self._fields
        table = pq.read_table(partition.abs_path)
        if partition.dv_paths:
            # initial-snapshot bootstrap with outstanding deletion
            # vectors: drop this file's DV'd positions (pos = row index
            # within the file; pyarrow preserves file row order) so the
            # snapshot batch serves current state, not resurrected rows
            import pyarrow.dataset as ds

            dv = ds.dataset(list(partition.dv_paths)).to_table(
                filter=ds.field("file") == partition.rel_name
            )
            dead = set(dv.column("pos").to_pylist())
            if dead:
                import numpy as np

                mask = np.ones(table.num_rows, dtype=bool)
                mask[list(dead)] = False
                table = table.filter(pa.array(mask))
        n = table.num_rows
        pv = partition.part_values
        try:
            # Arrow fast path: emit whole RecordBatches — column data
            # moves parquet → arrow → Spark with zero per-row Python.
            # Target arrow types come from the committed Spark schema
            # (the same conversion Spark's arrow ingest uses), partition
            # values become constant arrays, evolved-away columns nulls.
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType

            target = to_arrow_schema(
                StructType.fromJson({"type": "struct", "fields": fields})
            )
            arrays = []
            for i, f in enumerate(fields):
                name, at = f["name"], target.field(i).type
                phys = self._cmap.get(name, name)
                if phys in table.column_names:
                    arrays.append(
                        table.column(phys).combine_chunks().cast(at)
                    )
                elif phys in pv:
                    arrays.append(
                        pa.array([pv[phys]] * n).cast(at)
                    )
                else:
                    arrays.append(pa.nulls(n, at))  # pre-evolution file
            yield from pa.Table.from_arrays(
                arrays, schema=target
            ).to_batches()
        except Exception:
            # tuple fallback: exotic types the cast path can't bridge
            # still stream correctly, one row at a time
            series = []
            for f in fields:
                name = f["name"]
                phys = self._cmap.get(name, name)
                if phys in table.column_names:
                    series.append(table.column(phys).to_pylist())
                elif phys in pv:
                    series.append([pv[phys]] * n)
                else:
                    series.append([None] * n)
            yield from zip(*series)

    def commit(self, end: dict) -> None:
        # manifests are the log — nothing to clean up; but a committed
        # end is a delivery boundary: raise the floor (monotone — a
        # replayed batch's recommit never lowers it) and persist it
        # when offsetTrackingLocation is set, so a restarted instance
        # seeds at the boundary instead of dancing the regression
        # protocol (see __init__).
        if self._floor is not None and self._okey(end) <= self._okey(
            self._floor
        ):
            return
        self._floor = dict(end)
        if self._track_offsets is None:
            return
        import json as _json
        import os as _os
        import uuid as _uuid

        d = self._track_offsets
        # Persistence is an OPTIMIZATION over the in-memory floor (it
        # closes the double-restart window) — on a table root the
        # reader cannot write (read-only mount, another team's table),
        # the default-on location must DEGRADE to in-memory tracking
        # with a one-time warning, never kill the stream at its first
        # committed batch.
        try:
            d.mkdir(parents=True, exist_ok=True)
            # the FILE is monotone too: a second query sharing this
            # (default, per-query-shape) location that lags the first
            # must never lower the persisted boundary — a lowered floor
            # would re-open the regressed-commit window for the leader.
            # Plain read-compare-write (the race window is benign:
            # losing it can only persist a lower-but-valid floor, never
            # corrupt one).
            try:
                cur = _json.loads((d / "cursor.json").read_text())
                if self._okey(cur) >= self._okey(end):
                    return
            except (OSError, ValueError, TypeError, KeyError):
                pass  # unreadable/corrupt current floor: overwrite it
            tmp = d / f".tmp-{_uuid.uuid4().hex}"
            tmp.write_text(_json.dumps(end))
            _os.replace(tmp, d / "cursor.json")
        except OSError as e:
            import warnings

            self._track_offsets = None  # stop retrying every batch
            warnings.warn(
                f"versioned_changes: cannot persist the offset floor "
                f"at {d} ({e}); falling back to in-memory tracking — "
                "restarts of this query keep the documented "
                "single-restart protocol (set offsetTrackingLocation "
                "to a writable dir for the full guarantee)",
                stacklevel=2,
            )


def _resolve_path_option(options) -> str | None:
    """The table root from either addressing plane: ``path`` directly,
    or ``table`` (a ``db.table`` name) + ``catalogRoot`` (the
    VersionedCatalog registry root) — the name-addressed twin, so a
    stream can follow a registered table without knowing where it
    lives.  Both given must agree; ``table`` without ``catalogRoot``
    is an error (the registry cannot be guessed)."""
    path = options.get("path")
    name = options.get("table")
    if name:
        root = options.get("catalogRoot")
        if not root:
            raise ValueError(
                "versioned_changes: option 'table' needs 'catalogRoot' "
                "(the VersionedCatalog registry root) to resolve"
            )
        from ..catalog import VersionedCatalog

        resolved = VersionedCatalog(str(root)).resolve(str(name))
        if path and str(path) != resolved:
            raise ValueError(
                f"versioned_changes: 'path' ({path}) and 'table' "
                f"({name} -> {resolved}) disagree — pass one"
            )
        return resolved
    return path


class VersionedChangesDataSource(DataSource):
    """``spark.readStream.format("versioned_changes")
    .option("path", table_root).load()`` — or name-addressed:
    ``.option("table", "db.tbl").option("catalogRoot", registry_root)``
    (resolved through ``catalog.VersionedCatalog``)."""

    @classmethod
    def name(cls) -> str:
        return "versioned_changes"

    def schema(self):
        from pyspark.sql.types import StructType

        path = _resolve_path_option(self.options)
        if not path:
            raise ValueError("versioned_changes: option 'path' is required")
        vs = versions(path)
        if not vs:
            raise FileNotFoundError(f"no committed versions at {path}")
        m = _read_manifest(path, vs[-1])
        fields = _visible_fields(m["schema"], bool(m.get("bucket_by")))
        if str(self.options.get("readChangeFeed", "false")).lower() == (
            "true"
        ):
            fields = list(fields) + _CDF_FIELDS
        return StructType.fromJson(
            {**m["schema"], "fields": fields}
        )

    def streamReader(self, schema) -> VersionedChangesStreamReader:
        return VersionedChangesStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is safe)."""
    spark.dataSource.register(VersionedChangesDataSource)


def _parse_offset(s):
    """The engine surfaces the Python DS offset as either JSON or a
    Python-dict repr, depending on the progress serialization path."""
    import ast as _ast
    import json as _json

    try:
        out = _json.loads(s)
    except ValueError:
        return _ast.literal_eval(s)
    return _parse_offset(out) if isinstance(out, str) else out


def _plan_append_slice(
    path: str,
    lo: int,
    tgt: int,
    vs: list[int],
    max_files: int | None,
    max_bytes: int | None,
    skip_change: bool,
) -> tuple[int, list[tuple[int, dict, list[str]]]]:
    """One capped APPEND slice ``(lo, hi]`` for the batch drain: walk
    surviving manifests (append diffs accumulate across survivors, so
    tag+vacuum gaps are fine — the same walk the streaming source
    does), collecting each append commit's new data files until a cap
    is reached.  Metadata-only commits pass; non-append commits raise
    unless ``skip_change`` (the streaming source's contract).  Returns
    ``(hi, [(v, manifest, new_files), ...])``."""
    prev = _read_manifest(path, lo) if lo in vs else {"files": []}
    files = 0
    nbytes = 0
    hi = lo
    out: list[tuple[int, dict, list[str]]] = []
    for v in [x for x in vs if lo < x <= tgt]:
        m = _read_manifest(path, v)
        pf = set(prev.get("files") or [])
        new = [f for f in m["files"] if f not in pf]
        removed = [f for f in prev.get("files") or [] if f not in set(m["files"])]
        dv_same = (m.get("dv_files") or []) == (
            prev.get("dv_files") or []
        ) and (m.get("dv_counts") or {}) == (prev.get("dv_counts") or {})
        is_first = v == vs[0]
        prev = m
        if not is_first and not new and not removed and dv_same:
            hi = v
            continue  # metadata-only commit
        if not (m.get("mode") in _APPEND_MODES or is_first):
            if not skip_change:
                raise ValueError(
                    f"drain_versioned_changes: version {v} is a "
                    f"{m.get('mode')!r} commit — an append-only drain "
                    "cannot represent row changes; set "
                    "skip_change_commits=True to ignore them"
                )
            hi = v
            continue
        fm = m.get("file_meta") or {}
        out.append((v, m, new))
        files += len(new)
        nbytes += sum(
            (fm.get(x, {}) or {}).get("bytes", 0) or 0 for x in new
        )
        hi = v
        if (max_files is not None and files >= max_files) or (
            max_bytes is not None and nbytes >= max_bytes
        ):
            break
    return hi, out


def _drain_batch(
    spark,
    path: str,
    sink_path: str,
    checkpoint: str,
    *,
    build,
    sink_format: str,
    max_files: int | None,
    max_bytes: int | None,
    skip_change: bool,
    max_runs: int,
) -> int:
    """The BATCH engine of ``drain_versioned_changes``: capped append
    slices written to ``sink_path`` as SLICE-KEYED files through the
    shared cursor — each slice lands under deterministic names
    (``slice-v<from>-v<to>-<i>``) after deleting any same-slice
    leftovers, so a crash between write and cursor advance re-runs the
    slice into the same names and converges (idempotent), matching the
    stream engine's end-to-end exactly-once without its per-run JVM
    startup.  ``build`` must be a stateless per-row/projection
    transform (the same restriction foreachBatch imposes)."""
    from pyspark.sql import functions as F

    from ..sinks.versioned import _read_files, read_version

    cur_dir = Path(checkpoint) / "_vc_cursor"

    def _write_slice(df, lo: int, hi: int) -> None:
        if build is not None:
            df = build(df)
        # leftovers clear by START version only: a crash before the
        # cursor advance followed by new commits replans the same start
        # with a LARGER hi, and an exact-prefix clear would orphan the
        # crashed attempt's files as duplicates — any file starting at
        # lo+1 is an attempt at THIS slice (ranges partition the
        # version axis as the cursor advances)
        _land_slice(
            df,
            sink_path,
            sink_format,
            f"slice-v{lo + 1:06d}-v{hi:06d}-",
            clear_glob=f"slice-v{lo + 1:06d}-v*",
        )

    def _align(df, fields, cmap: dict, head_cmap: dict):
        # resolve through PHYSICAL column identity (stable across
        # renames), exactly like the streaming reader: a pre-rename
        # file's column lands under the head's logical name instead of
        # silently reading NULL
        phys_to_local = {cmap.get(c, c): c for c in df.columns}
        sel = []
        for f in fields:
            src = phys_to_local.get(head_cmap.get(f.name, f.name))
            sel.append(
                F.col(src).cast(f.dataType).alias(f.name)
                if src is not None
                else F.lit(None).cast(f.dataType).alias(f.name)
            )
        return df.select(sel)

    runs = 0
    for _ in range(max_runs):
        vs = versions(path)
        if not vs:
            return runs
        tgt = vs[-1]
        cur = _cursor_read(cur_dir / "cursor.json")
        if cur is not None and (
            cur.get("file_index") is not None or cur.get("snapshot_start")
        ):
            # a capped STREAM drain left a PARTIAL offset: the sink
            # already holds part of that commit as flat stream files,
            # so a commit-granular re-delivery would duplicate rows —
            # refuse instead of guessing
            raise ValueError(
                "drain_versioned_changes: the checkpoint holds a "
                f"partial streaming offset {cur}; finish the capped "
                "drain with engine='stream' before switching to the "
                "batch engine"
            )
        lo = 0 if cur is None else int(cur["version"])
        if lo >= tgt:
            return runs
        # emit every slice under the HEAD commit's visible schema (the
        # field-list vintage a fresh stream would declare)
        from pyspark.sql.types import StructType

        hm = _read_manifest(path, vs[-1])
        head_cmap = dict(hm.get("column_mapping") or {})
        fields = StructType.fromJson(
            {
                **hm["schema"],
                "fields": _visible_fields(
                    hm["schema"], bool(hm.get("bucket_by"))
                ),
            }
        ).fields
        if lo == 0 and vs[0] > 1:
            # fresh drain of an ever-vacuumed table: the earliest
            # surviving snapshot is the initial load
            em = _read_manifest(path, vs[0])
            snap = _align(
                read_version(spark, path, vs[0]),
                fields,
                dict(em.get("column_mapping") or {}),
                head_cmap,
            )
            _write_slice(snap, 0, vs[0])
            _cursor_advance(cur_dir, vs[0])
            runs += 1
            continue
        if 0 < lo and lo not in vs:
            # a cursor whose own manifest was vacuumed — below the
            # earliest survivor OR inside a tag+vacuum interior gap.
            # Either way the delivered prefix is unreconstructable:
            # diffing the next survivor against an older one would
            # re-deliver files committed before the cursor.
            raise ValueError(
                f"drain_versioned_changes: the drain cursor v{lo} "
                f"references a vacuumed manifest (have {vs}) at "
                f"{path} — the delivered prefix is unreconstructable; "
                "restart from a fresh checkpoint"
            )
        hi, cms = _plan_append_slice(
            path, lo, tgt, vs, max_files, max_bytes, skip_change
        )
        if not cms:
            _cursor_advance(cur_dir, hi)
            continue
        frames = [
            _align(
                _read_files(spark, path, new, m),
                fields,
                dict(m.get("column_mapping") or {}),
                head_cmap,
            )
            for _v, m, new in cms
            if new
        ]
        from functools import reduce

        _write_slice(reduce(lambda a, b: a.unionByName(b), frames), lo, hi)
        _cursor_advance(cur_dir, hi)
        runs += 1
    raise RuntimeError(
        f"drain_versioned_changes: backlog at {path} not drained in "
        f"{max_runs} slices (cap too small for the commit rate?)"
    )


def drain_versioned_changes(
    spark,
    path: str,
    sink_path: str,
    checkpoint: str,
    *,
    build=None,
    sink_format: str = "parquet",
    output_mode: str = "append",
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
    skip_change_commits: bool = False,
    max_runs: int = 10000,
    extra_options: dict | None = None,
    engine: str = "stream",
) -> int:
    """Drain a versioned table's FULL backlog under a rate cap in one
    call — the semantics Delta gives ``trigger(availableNow=True)``
    under admission control.  The Python DataSource API exposes no
    availableNow hook (one availableNow run of a capped
    ``versioned_changes`` stream delivers exactly ONE capped
    micro-batch — module docstring), so the stream engine runs ONE
    continuously-triggered micro-batch query against the checkpoint
    and blocks until the stream has caught up to the table head
    (``processAllAvailable``): every batch stays bounded by the cap
    AND the call returns only when the backlog as of the run's start
    is fully delivered — exactly-once end to end through the engine
    checkpoint, with the same batch ids (and therefore the same
    batch-keyed sink slice names) the pre-r16 availableNow-per-batch
    loop produced, for one JVM query startup instead of one per batch.

    ``build`` (optional) maps the streaming DataFrame before the sink —
    projections/filters, same restrictions as any streaming query.
    Returns the number of micro-batches that delivered data.  Progress
    is detected from the run's committed end offset; a run that
    neither delivers rows nor advances the offset while the head is
    unreached raises instead of spinning (that state is unreachable
    short of a concurrent vacuum breaking replay — which
    ``partitions`` reports with its own honest error on the next run).

    ``engine="batch"`` (r16) drains the same backlog as capped APPEND
    SLICES through the same cursor file, writing each slice to
    ``sink_path`` under deterministic slice-keyed file names (crash →
    same-name rewrite → converges) — no JVM streaming-query startup
    per capped batch, for bulk backfills.  Caps close at COMMIT
    granularity there (the streaming engine remains the sub-commit
    splitter), ``output_mode`` must be ``append``, ``extra_options``
    are not supported, and ``build`` must be a stateless
    projection/filter (the foreachBatch restriction, now load-bearing).
    The default stays ``"stream"`` — the engine-faithful
    admission-control demonstrator; both engines share the cursor, so
    a batch backfill can hand over to a streaming tail (the batch run
    clears the Spark checkpoint's engine state and the stream reader
    starts AT the cursor)."""
    if engine not in ("stream", "batch"):
        raise ValueError(
            "drain_versioned_changes: engine must be 'stream' or "
            f"'batch', got {engine!r}"
        )
    _refuse_metadata_sink(sink_path)
    if engine == "batch":
        if output_mode != "append":
            raise ValueError(
                "drain_versioned_changes: engine='batch' drains "
                "append-mode only (stateful output modes need the "
                "streaming engine)"
            )
        if extra_options:
            raise ValueError(
                "drain_versioned_changes: extra_options are streaming-"
                "reader options — use engine='stream' with them"
            )
        runs = _drain_batch(
            spark,
            path,
            sink_path,
            checkpoint,
            build=build,
            sink_format=sink_format,
            max_files=max_files_per_trigger,
            max_bytes=max_bytes_per_trigger,
            skip_change=skip_change_commits,
            max_runs=max_runs,
        )
        _wipe_engine_checkpoint(checkpoint)
        return runs
    register(spark)
    reader = (
        spark.readStream.format("versioned_changes").option("path", path)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger", str(max_bytes_per_trigger))
    if skip_change_commits:
        reader = reader.option("skipChangeCommits", "true")
    # each drain CALL constructs a fresh reader against the same engine
    # checkpoint — the restart case every call; tracking the committed
    # offset beside the checkpoint makes each call seed at the boundary
    # (no regression dance, no empty batches, restart-safe).  The
    # per-checkpoint cursor IS this query's delivery record, so a
    # fresh/reset engine checkpoint (including after a batch-engine
    # backfill) starts AT the cursor instead of re-delivering rows the
    # sink already holds.
    reader = reader.option(
        "offsetTrackingLocation", str(Path(checkpoint) / "_vc_cursor")
    ).option("initialOffsetFromFloor", "true")
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, str(v))

    # foreachBatch with batch-keyed slice names instead of the file
    # sink: a batch replay rewrites the SAME names (exactly-once), and
    # there is no _spark_metadata log to hide the batch engine's slice
    # files from batch readers — the two engines share one sink layout,
    # so a batch backfill can hand over to this streaming tail.  The
    # scope carries the checkpoint's WIPE INCARNATION: after a
    # batch-engine run resets the engine state, batch ids restart at 0,
    # and an unchanged scope would make the new batch 0's pre-delete
    # erase the previous incarnation's batch-0 slice from the sink.
    from ..streaming.sinks import _txn_scope

    inc = _sink_incarnation(checkpoint)
    scope = _txn_scope(checkpoint) + (f"i{inc}" if inc else "")
    landed_ids: set[int] = set()

    def _land(batch_df, batch_id):
        # No isEmpty() pre-flight: that was a SECOND job per batch
        # through the Python DS read (guide §1.2 — the write itself
        # proves emptiness: an all-empty-task parquet write lands zero
        # part files).  Batch offsets are deterministic, so a batch
        # that lands nothing now landed nothing in every earlier
        # attempt too — the slice-keyed clear inside _land_slice is a
        # no-op for it.  Counting by BATCH ID instead of a bare
        # counter keeps the returned count exact when a stop() races a
        # mid-flight batch and the outer loop's next query replays it
        # (the slice rewrite is idempotent; the count must be too).
        if _land_slice(
            batch_df,
            sink_path,
            sink_format,
            f"slice-b{scope}-{batch_id:06d}-",
        ):
            landed_ids.add(batch_id)

    def start_sink(df):
        if build is not None:
            df = build(df)
        return (
            df.writeStream.foreachBatch(_land)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode)
            .trigger(processingTime="0 seconds")
            .start()
        )

    return _capped_drain_loop(
        path,
        reader,
        start_sink,
        None,
        max_runs,
        "drain_versioned_changes",
        cursor_dir=Path(checkpoint) / "_vc_cursor",
        delivered=lambda: len(landed_ids),
    )


def _capped_drain_loop(
    src_path: str,
    reader,
    start_sink,
    ending_version: int | None,
    max_runs: int,
    helper: str,
    cursor_dir: Path | None = None,
    delivered=None,
) -> int:
    """The shared drain loop of ``drain_versioned_changes`` /
    ``replicate_versioned_changes`` (stream engine): ONE running
    micro-batch query (``start_sink(reader.load())`` →
    ``processAllAvailable`` → ``stop``) drains the whole backlog as a
    sequence of capped micro-batches, until the committed end offset
    reaches the TARGET — ``ending_version`` capped at the head as of
    the run (a bound past the head is 'drain everything available',
    not an error), or the head itself when unbounded.  Raises on
    genuine no-progress and on the iteration cap; returns the number
    of micro-batches that delivered data.

    Until r16 this looped one ``availableNow`` run per capped batch —
    the Python DS API's availableNow fallback snapshots ONE end offset
    per run, so an N-batch backlog paid N JVM streaming-query startups
    (~2-3.5 s each, SF-independent — measured in OPTIMIZATION_r16.md).
    A running ``processingTime`` trigger delivers the same capped
    batches (the caps bound each ``latestOffset`` step, exactly as in
    the running-stream query q266) through the same checkpoint with
    the same batch ids — so the sink's batch-keyed slice names, the
    exactly-once replay story and the returned count are unchanged —
    for ONE startup.  The outer loop survives a commit racing the
    drain's tail: a rare second query picks up the remainder.

    ``cursor_dir``: the shared cursor file is advanced DRIVER-SIDE to
    the run's committed end offset — the engine never invokes the
    reader's ``commit()`` for the final batch before ``stop()``, so
    without this the cursor file would lag the engine checkpoint and a
    batch-engine handover would re-deliver from the beginning.

    ``delivered``: zero-arg callable returning the cumulative count of
    non-empty batches the sink landed (maintained by the caller's
    foreachBatch).  ``recentProgress`` keeps only the last ~100
    entries, so a long single-query drain needs the sink's own count
    to report an exact total."""
    data_runs = 0
    last_end: dict | None = None
    for _ in range(max_runs):
        before = delivered() if delivered is not None else 0
        q = start_sink(reader.load())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        q.awaitTermination()
        progressed = [p for p in q.recentProgress if p["numInputRows"] > 0]
        if delivered is not None:
            data_runs += delivered() - before
            progressed = progressed or (delivered() > before)
        else:
            data_runs += len(progressed)
        ends = [
            p["sources"][0]["endOffset"]
            for p in q.recentProgress
            if p.get("sources")
        ]
        end = _parse_offset(ends[-1]) if ends else None
        if end is not None and cursor_dir is not None:
            _cursor_advance(cursor_dir, end)
        vs = versions(src_path)
        head = vs[-1] if vs else 0
        tgt = head if ending_version is None else min(ending_version, head)
        if end is not None and end.get("version") == tgt and (
            "file_index" not in end
        ):
            return data_runs  # drained through the target as of this run
        if not progressed:
            if end is None or end == last_end:
                if not vs:
                    return data_runs  # nothing committed yet
                raise RuntimeError(
                    f"{helper}: no progress at offset {end} with "
                    f"target v{tgt} at {src_path}"
                )
        last_end = end
    raise RuntimeError(
        f"{helper}: backlog at {src_path} not drained in {max_runs} "
        f"runs (cap too small for the commit rate?)"
    )


def _cdc_op_frame(ch, F):
    """Shared feed→I/U/D transform of both replication engines:
    preimages drop, the remaining change types map to the
    ``versioned_apply_changes`` op column."""
    return (
        ch.filter(F.col("_change_type") != "update_preimage")
        .withColumn(
            "op",
            F.when(F.col("_change_type") == "delete", F.lit("D"))
            .when(
                F.col("_change_type") == "update_postimage", F.lit("U")
            )
            .otherwise(F.lit("I")),
        )
        .drop("_change_type")
    )


def _okey_off(off: dict) -> tuple:
    return (off["version"], off.get("file_index", float("inf")))


def _cursor_read(cur_file: Path) -> dict | None:
    """The shared cursor file (the streaming engine's offset floor):
    None for absent/corrupt."""
    import json as _json

    try:
        c = _json.loads(cur_file.read_text())
    except (OSError, ValueError):
        return None
    return c if isinstance(c, dict) and "version" in c else None


def _cursor_advance(cur_dir: Path, off: int | dict) -> None:
    """Atomically raise the cursor to ``off`` (a plain version or a
    full offset dict) — monotone, like the floor it shares a file
    with."""
    import json as _json
    import os as _os
    import uuid as _uuid

    cur = _cursor_read(cur_dir / "cursor.json")
    new = {"version": off} if isinstance(off, int) else dict(off)
    if cur is not None and _okey_off(cur) >= _okey_off(new):
        return
    cur_dir.mkdir(parents=True, exist_ok=True)
    tmp = cur_dir / f".tmp-{_uuid.uuid4().hex}"
    tmp.write_text(_json.dumps(new))
    _os.replace(tmp, cur_dir / "cursor.json")


def _land_slice(
    df,
    sink_path: str,
    sink_format: str,
    prefix: str,
    clear_glob: str | None = None,
) -> int:
    """Land one drained slice in the sink under DETERMINISTIC file
    names: write to a temp dir, delete leftovers matching
    ``clear_glob`` (default: same-prefix files — a previous attempt's
    partial slice), then move each file to ``<prefix><i><ext>``.  A
    replay of the same slice — batch-engine re-run after a crash, or a
    foreachBatch batch replay — rewrites the same names and converges:
    sink-side exactly-once without a ``_spark_metadata`` transaction
    log (whose presence makes batch reads IGNORE files the log doesn't
    list — the reason both drain engines share this layout instead of
    the streaming file sink).  Returns the number of files landed — 0
    means the slice was empty (an all-empty-task write emits no part
    files), which the stream sink uses instead of a separate
    ``isEmpty()`` job."""
    import os as _os
    import shutil
    import uuid as _uuid

    tmp = Path(sink_path) / f"_tmp-slice-{_uuid.uuid4().hex}"
    df.write.format(sink_format).mode("overwrite").save(str(tmp))
    dst = Path(sink_path)
    for old in dst.glob(clear_glob or (prefix + "*")):
        old.unlink()
    outs = sorted(
        p
        for p in tmp.iterdir()
        if p.is_file() and not p.name.startswith(("_", "."))
    )
    for i, f in enumerate(outs):
        _os.replace(f, dst / f"{prefix}{i:04d}{f.suffix}")
    shutil.rmtree(tmp, ignore_errors=True)
    return len(outs)


def _refuse_metadata_sink(sink_path: str) -> None:
    """Both drain engines write slice-keyed plain files; a sink
    carrying a streaming file-sink ``_spark_metadata`` log would hide
    them from batch readers (reads through such a log IGNORE unlisted
    files) — refuse rather than land invisible rows."""
    if (Path(sink_path) / "_spark_metadata").exists():
        raise ValueError(
            f"drain_versioned_changes: {sink_path} carries a streaming "
            "file-sink _spark_metadata log (a pre-r16 drain landed "
            "here); batch readers of such a directory ignore files the "
            "log doesn't list, so newly drained slices would be "
            "invisible — drain into a fresh sink directory (or remove "
            "_spark_metadata after verifying no orphan part files)"
        )


def _sink_incarnation(checkpoint: str) -> int:
    """How many times this checkpoint's engine state has been wiped —
    part of the stream drain's slice-name scope, because batch ids
    restart at 0 after a wipe and an unchanged scope would make the
    new batch 0's pre-delete erase a previous incarnation's slice."""
    try:
        return int(
            (Path(checkpoint) / "_vc_cursor" / "incarnation").read_text()
        )
    except (OSError, ValueError):
        return 0


def _wipe_engine_checkpoint(checkpoint: str) -> None:
    """After a batch-engine run the cursor file is the source of truth;
    clear the Spark streaming checkpoint's engine state so a following
    stream run starts fresh and (via initialOffsetFromFloor) AT the
    cursor instead of re-delivering the batch-applied window.  Bumps
    the sink incarnation so the next stream run's restarted batch ids
    land under fresh slice names (see ``_sink_incarnation``)."""
    import shutil

    for sub in ("offsets", "commits", "metadata", "sources", "state"):
        shutil.rmtree(Path(checkpoint) / sub, ignore_errors=True)
    d = Path(checkpoint) / "_vc_cursor"
    d.mkdir(parents=True, exist_ok=True)
    (d / "incarnation").write_text(str(_sink_incarnation(checkpoint) + 1))


def _plan_feed_slice(
    src: str,
    lo: int,
    tgt: int,
    vs: list[int],
    max_files: int | None,
    max_bytes: int | None,
) -> tuple[int, int]:
    """One capped change-feed slice ``(lo, hi]``: walk the manifests —
    METADATA ONLY, O(versions in range) — accumulating each commit's
    change-bearing file count/bytes (cdf files for row-level commits,
    new data files for appends, old+new for overwrites, nothing for
    compact/metadata commits) and stop at the first version where a
    cap is reached.  Commit-granular: a single commit larger than the
    cap still forms a slice (the soft-cap rule — progress beats the
    bound, same as the streaming source's at-least-one-file rule,
    minus its sub-commit splitting).  Returns ``(hi, files)``; raises
    on a mid-range vacuum hole (the feed contract — a silent gap
    would replicate wrong)."""
    missing = [g for g in range(lo + 1, tgt + 1) if g not in vs]
    if missing:
        raise ValueError(
            f"replicate_versioned_changes: version(s) {missing} inside "
            f"({lo}, {tgt}] were vacuumed at {src} — their changes are "
            "unreconstructable; replicate a gap-free range or rebuild "
            "the replica from a snapshot"
        )
    prev = _read_manifest(src, lo) if lo in vs else {"files": []}
    files = 0
    nbytes = 0
    hi = lo
    for v in range(lo + 1, tgt + 1):
        m = _read_manifest(src, v)
        mode = str(m.get("mode", ""))
        cdf = m.get("cdf_files") or []
        same_rows = (
            m["files"] == prev.get("files")
            and (m.get("dv_files") or []) == (prev.get("dv_files") or [])
            and dict(m.get("dv_counts") or {})
            == dict(prev.get("dv_counts") or {})
        )
        if cdf:
            meta = m.get("cdf_file_meta")
            if meta is None:
                meta = _cdf_file_meta(src, cdf)
            f_n = len(cdf)
            f_b = sum(
                (meta.get(x, {}) or {}).get("bytes", 0) or 0 for x in cdf
            )
        elif same_rows or mode == "compact":
            f_n = f_b = 0
        elif mode == "append" or v == vs[0]:
            pf = set(prev.get("files") or [])
            fm = m.get("file_meta") or {}
            new = [x for x in m["files"] if x not in pf]
            f_n = len(new)
            f_b = sum(
                (fm.get(x, {}) or {}).get("bytes", 0) or 0 for x in new
            )
        elif mode == "overwrite":
            fm = m.get("file_meta") or {}
            pm = prev.get("file_meta") or {}
            f_n = len(m["files"]) + len(prev.get("files") or [])
            f_b = sum(
                (fm.get(x, {}) or {}).get("bytes", 0) or 0
                for x in m["files"]
            ) + sum(
                (pm.get(x, {}) or {}).get("bytes", 0) or 0
                for x in prev.get("files") or []
            )
        else:
            # row-level commit without feed files: read_change_feed
            # raises the honest error when the slice reads — count it
            # minimally so the slice still advances to the raise
            f_n, f_b = 1, 0
        prev = m
        hi = v
        files += f_n
        nbytes += f_b
        if (max_files is not None and files >= max_files) or (
            max_bytes is not None and nbytes >= max_bytes
        ):
            break
    return hi, files


def _replicate_batch(
    spark,
    src: str,
    dst: str,
    checkpoint: str,
    keys: list[str],
    *,
    max_files: int | None,
    max_bytes: int | None,
    ending_version: int | None,
    guard: bool,
    allow_evo: bool,
    max_runs: int,
) -> int:
    """The BATCH engine of ``replicate_versioned_changes``: contiguous
    ``read_change_feed`` slices applied through the SAME cursor file
    the streaming engine's offset floor uses — identical end state and
    at-least-once/idempotent-apply guarantee, without paying one JVM
    streaming-query startup (~3-6 s, SF-independent) per capped
    micro-batch.  Per slice: plan (metadata-only walk, O(admitted
    files)), read the feed, keyed apply as ONE commit, then durably
    advance the cursor — a crash between apply and advance re-applies
    one slice, which keyed I/U/D application converges under (the same
    at-least-once contract foreachBatch gives the streaming engine)."""
    from pyspark.sql import functions as F

    from ..sinks.versioned import (
        read_change_feed,
        read_version,
        versioned_apply_changes,
    )
    from ..sinks.versioned import versions as _versions

    cur_dir = Path(checkpoint) / "_vc_cursor"
    cur_file = cur_dir / "cursor.json"
    _read_cursor = lambda: _cursor_read(cur_file)
    _advance = lambda v: _cursor_advance(cur_dir, v)

    def _apply(ch) -> None:
        # no isEmpty pre-flight: the planner only sends slices whose
        # commits carry change files (n_files > 0), so the extra Spark
        # job would re-prove what the manifests already say
        sv = None
        if guard:
            dvs = _versions(dst)
            sv = dvs[-1] if dvs else None
        versioned_apply_changes(
            _cdc_op_frame(ch, F),
            dst,
            keys,
            op_col="op",
            seq_col="_commit_version",
            source_version=sv,
            allow_schema_evolution=allow_evo,
        )

    data_runs = 0
    for _ in range(max_runs):
        vs = versions(src)
        if not vs:
            return data_runs
        head = vs[-1]
        tgt = head if ending_version is None else min(ending_version, head)
        cur = _read_cursor()
        if cur is not None and cur.get("snapshot_start"):
            # a capped STREAMING run left a partial bootstrap mark:
            # commit granularity redoes the whole snapshot (idempotent
            # keyed inserts — same converged state)
            cur = None
        if cur is None:
            lo = 0
        elif cur.get("file_index") is not None:
            # partial commit from a capped streaming run: delivered
            # through version-1 plus a prefix of version — re-deliver
            # the commit wholly (idempotent)
            lo = int(cur["version"]) - 1
        else:
            lo = int(cur["version"])
        if lo >= tgt:
            return data_runs
        if lo < vs[0] - 1 or (0 < lo < vs[0]):
            if lo == 0:
                # nothing delivered yet and the early history is
                # vacuumed: bootstrap from the earliest surviving
                # snapshot (Delta initial-snapshot semantics)
                boot = vs[0]
                if ending_version is not None and ending_version < boot:
                    raise ValueError(
                        f"replicate_versioned_changes: ending_version "
                        f"{ending_version} predates the earliest "
                        f"surviving snapshot v{boot} at {src}"
                    )
                snap = (
                    read_version(spark, src, boot)
                    .withColumn("_change_type", F.lit("insert"))
                    .withColumn(
                        "_commit_version", F.lit(boot).cast("long")
                    )
                )
                _apply(snap)
                data_runs += 1
                _advance(boot)
                continue
            raise ValueError(
                f"replicate_versioned_changes: the replication cursor "
                f"v{lo} predates the earliest surviving manifest "
                f"v{vs[0]} at {src} — the intervening commits were "
                "vacuumed and cannot be replayed; rebuild the replica "
                "from a snapshot"
            )
        hi, n_files = _plan_feed_slice(
            src, lo, tgt, vs, max_files, max_bytes
        )
        if n_files == 0:
            _advance(hi)  # metadata/compact-only commits: no rows
            continue
        _apply(read_change_feed(spark, src, lo, hi))
        data_runs += 1
        _advance(hi)
    raise RuntimeError(
        f"replicate_versioned_changes: backlog at {src} not drained in "
        f"{max_runs} slices (cap too small for the commit rate?)"
    )


def replicate_versioned_changes(
    spark,
    src: str,
    dst: str,
    checkpoint: str,
    key_cols: list[str] | tuple[str, ...],
    *,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
    ending_version: int | None = None,
    guard_concurrent_target: bool = True,
    allow_schema_evolution: bool = False,
    catalog=None,
    max_runs: int = 10000,
    extra_options: dict | None = None,
    engine: str = "auto",
) -> int:
    """END-TO-END CDC REPLICATION (Delta's "CDF → MERGE" pattern):
    follow ``src``'s change feed as a ``readChangeFeed`` stream and
    apply every micro-batch to the versioned table ``dst`` through
    ``versioned_apply_changes`` inside ``foreachBatch`` — the composed
    workload the two halves exist for: a versioned table as CDC
    *source* feeding a versioned table as CDC *target*, keyed, rate-
    capped, restart-safe, and bounded if asked.

    Loop shape is ``drain_versioned_changes``'s: one running
    micro-batch query per call drains the backlog as capped
    micro-batches against ONE shared engine checkpoint — every CALL is
    a fresh reader instance, i.e. the restart case by construction,
    with the (default-on) persisted offset floor keeping capped offsets
    exact across calls.  Per batch: ``update_preimage`` rows drop, the
    remaining feed rows map to I/U/D (insert / update_postimage /
    delete), and ``seq_col="_commit_version"`` collapses multi-commit
    batches to the LAST change per key — so one batch spanning an
    update and a later delete of the same key applies the delete.
    foreachBatch is at-least-once on engine retry; re-applying a keyed
    I/U/D batch is state-idempotent on ``dst`` (an extra commit, never
    divergent rows), which is exactly the guarantee level Delta's own
    foreachBatch-merge replication recipe documents.

    ``guard_concurrent_target=True`` passes each apply
    ``source_version`` = the ``dst`` head it merged against, so a
    concurrent writer landing on ``dst`` between batches turns silent
    divergence into a clean ``ConcurrentCommitError`` (Iceberg's
    validateFromSnapshot applied to replication).

    ``ending_version`` bounds the replication — backfill ``dst``
    through a fixed ``src`` version and stop (the point-in-time clone
    shape); without it the loop stops at ``src``'s head as of the
    final run.  Returns the number of runs that delivered data —
    precisely (r16+): distinct micro-batches/slices whose
    POST-TRANSFORM op frame was non-empty, i.e. batches that actually
    applied a change to ``dst``; a batch carrying only
    ``update_preimage`` rows (or rows a ``skipChangeCommits`` reader
    dropped) applies nothing and does not count, where the pre-r16
    loop counted any run with ``numInputRows > 0``.

    ``allow_schema_evolution=True`` lets the replica FOLLOW source
    schema evolution: each availableNow run's fresh reader adopts the
    source's committed head schema (pre-evolution change files read
    NULL for later columns, exactly like the batch reader), and the
    per-batch apply is allowed to add the new columns to ``dst``.
    Without it, a widened batch refuses at the apply — the honest
    default, since silently dropping a new column would diverge the
    replica.

    ``catalog`` (a ``catalog.VersionedCatalog``) makes ``src``/``dst``
    NAME-addressable: a registered ``db.table`` resolves to its bound
    root; an UNREGISTERED ``dst`` name lands at the registry's default
    path and is registered once replication creates it (the same
    create-by-name contract as the W5 merge selector).  Strings that
    don't pass the registry's name validator stay plain paths; a bare
    relative path that happens to look like a name (``backup.v2``)
    would be taken as one — spell relative paths with a separator
    (``./backup.v2``).

    ``engine`` picks the execution engine (r16):

    - ``"batch"`` — capped ``read_change_feed`` slices applied through
      the same ``_vc_cursor`` file (``_replicate_batch``): identical
      end state, caps honored at COMMIT granularity (a single commit
      larger than the cap forms one slice — the soft-cap rule without
      the streaming source's sub-commit splitting), and no JVM
      streaming-query startup per micro-batch — a bounded backfill of
      N capped batches costs N×(admitted bytes) instead of N×(3-6 s
      fixed engine overhead).  The return value counts data-delivering
      SLICES.
    - ``"stream"`` — the availableNow loop over the
      ``versioned_changes`` streaming source (the r15 path; sub-commit
      capped offsets, ``extra_options`` honored).  Its reader sets
      ``initialOffsetFromFloor``, so a run whose engine checkpoint is
      fresh (or was reset by a prior batch-engine run) picks up AT the
      shared cursor instead of re-delivering.
    - ``"auto"`` (default) — ``batch``, unless ``extra_options`` are
      given (reader options only the streaming source understands).

    Both engines drive the SAME cursor file, so they interleave
    safely: a batch run also clears the Spark streaming checkpoint's
    engine state (the cursor supersedes it; apply is idempotent), and
    the next stream run starts at the cursor."""
    if engine not in ("auto", "batch", "stream"):
        raise ValueError(
            "replicate_versioned_changes: engine must be one of "
            f"auto/batch/stream, got {engine!r}"
        )
    if engine == "batch" and extra_options:
        raise ValueError(
            "replicate_versioned_changes: extra_options are streaming-"
            "reader options — use engine='stream' (or 'auto') with them"
        )
    if engine == "auto":
        engine = "stream" if extra_options else "batch"
    dst_name: str | None = None
    if catalog is not None:
        src = catalog.try_resolve(src) or src
        resolved = catalog.try_resolve(dst)
        if resolved is not None:
            dst = resolved
        elif "/" not in dst and type(catalog).is_name(dst):
            # an unregistered db.table name (the registry's validator
            # is the gate, so 'my-dir.v2' falls through as a path):
            # create at the default path, register once replication has
            # created the table.  A bare relative path that HAPPENS to
            # validate ('backup.v2') is taken as a name — spell relative
            # destinations with a separator ('./backup.v2').
            dst_name, dst = dst, catalog.default_path(dst)
    from pyspark.sql import functions as F

    from ..sinks.versioned import versioned_apply_changes
    from ..sinks.versioned import versions as _versions

    keys = list(key_cols)
    if engine == "batch":
        runs = _replicate_batch(
            spark,
            src,
            dst,
            checkpoint,
            keys,
            max_files=max_files_per_trigger,
            max_bytes=max_bytes_per_trigger,
            ending_version=ending_version,
            guard=guard_concurrent_target,
            allow_evo=allow_schema_evolution,
            max_runs=max_runs,
        )
        _wipe_engine_checkpoint(checkpoint)
        if dst_name is not None and _versions(dst):
            catalog.register(dst_name, dst)
        return runs

    register(spark)

    applied_ids: set[int] = set()

    def _apply(bdf, batch_id):
        ch = _cdc_op_frame(bdf, F)
        if ch.isEmpty():
            return
        sv = None
        if guard_concurrent_target:
            dvs = _versions(dst)
            sv = dvs[-1] if dvs else None
        versioned_apply_changes(
            ch,
            dst,
            keys,
            op_col="op",
            seq_col="_commit_version",
            source_version=sv,
            allow_schema_evolution=allow_schema_evolution,
        )
        # counted by BATCH ID, post-apply: a stop() racing a mid-flight
        # batch makes the outer loop's next query replay the same id —
        # the keyed apply converges, and the set keeps the returned
        # count exact across the replay.  Semantics (r16+): a run
        # "delivered data" when its post-transform op frame is
        # non-empty — a batch holding only update_preimage rows (or
        # rows dropped by skipChangeCommits) applies nothing and does
        # not count.
        applied_ids.add(batch_id)

    reader = (
        spark.readStream.format("versioned_changes")
        .option("path", src)
        .option("readChangeFeed", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger", str(max_bytes_per_trigger))
    if ending_version is not None:
        reader = reader.option("endingVersion", str(ending_version))
    reader = reader.option(
        "offsetTrackingLocation", str(Path(checkpoint) / "_vc_cursor")
    ).option(
        # the per-checkpoint cursor IS this query's delivery record
        # (possibly advanced by a prior batch-engine run): a fresh
        # engine checkpoint starts AT it, never re-delivers below it
        "initialOffsetFromFloor",
        "true",
    )
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, str(v))

    def start_sink(df):
        return (
            df.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint)
            .trigger(processingTime="0 seconds")
            .start()
        )

    runs = _capped_drain_loop(
        src,
        reader,
        start_sink,
        ending_version,
        max_runs,
        "replicate_versioned_changes",
        cursor_dir=Path(checkpoint) / "_vc_cursor",
        delivered=lambda: len(applied_ids),
    )
    if dst_name is not None and _versions(dst):
        catalog.register(dst_name, dst)
    return runs


def replicate_database(
    spark,
    catalog,
    src_db: str,
    dst_db: str,
    checkpoint_root: str,
    key_cols: dict[str, list[str]] | None = None,
    *,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
    ending_versions: dict[str, int] | None = None,
    guard_concurrent_target: bool = True,
    allow_schema_evolution: bool = False,
    engine: str = "auto",
    max_runs: int = 10000,
) -> dict[str, dict]:
    """DATABASE-LEVEL CDC replication — the reference's actual merge
    topology (merge_to_minio.py:126-192 loops a catalog's tables into
    another catalog BY NAME) composed from r15/r16's pieces: enumerate
    ``src_db`` in the ``VersionedCatalog``, and for each table run
    ``replicate_versioned_changes(src_db.t → dst_db.t)`` with its own
    checkpoint dir under ``checkpoint_root`` and per-table ERROR
    ISOLATION (one broken feed never stops the sweep — the reference's
    per-table try/except contract, and ``run_merge``'s report shape).

    Re-invoking is the restart: every table resumes from its own
    durable cursor, caught-up tables are no-ops.  ``key_cols`` maps
    table name → merge keys; a missing entry auto-detects via the W6
    key finder (``sinks/merge.py::find_key_column``) against the
    source head — no detectable key is a per-table error, not a sweep
    failure.  ``ending_versions`` bounds individual tables (the
    point-in-time-clone shape); unlisted tables drain to their heads.

    Returns ``{table: {"runs": n, "final_rows": rows, "path": dst}}``
    per replicated table (``final_rows`` is ``None`` when the table
    was already caught up — a no-op restart never pays a replica
    scan) or ``{"error": msg}`` for isolated failures.
    """
    from ..sinks.versioned import read_version

    results: dict[str, dict] = {}
    for tbl in catalog.list_tables(src_db):
        src_name = f"{src_db}.{tbl}"
        dst_name = f"{dst_db}.{tbl}"
        try:
            keys = (key_cols or {}).get(tbl)
            if keys is None:
                from ..sinks.merge import find_key_column

                key = find_key_column(
                    read_version(spark, catalog.resolve(src_name))
                )
                if key is None:
                    raise ValueError(
                        f"no key column detected for {src_name}; pass "
                        "key_cols={...}"
                    )
                keys = [key]
            runs = replicate_versioned_changes(
                spark,
                src_name,
                dst_name,
                str(Path(checkpoint_root) / tbl),
                keys,
                max_files_per_trigger=max_files_per_trigger,
                max_bytes_per_trigger=max_bytes_per_trigger,
                ending_version=(ending_versions or {}).get(tbl),
                guard_concurrent_target=guard_concurrent_target,
                allow_schema_evolution=allow_schema_evolution,
                catalog=catalog,
                max_runs=max_runs,
                engine=engine,
            )
            path = catalog.resolve(dst_name)
            results[tbl] = {
                "runs": runs,
                # a caught-up no-op stays cheap: don't pay a full
                # replica scan just to report an unchanged count
                "final_rows": (
                    read_version(spark, path).count() if runs else None
                ),
                "path": path,
            }
        except Exception as e:  # noqa: BLE001 — per-table isolation,
            # the reference merge_to_minio.py:189-192 contract
            results[tbl] = {"error": str(e)[:200]}
    return results
