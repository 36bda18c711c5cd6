"""Manifest-plane scale rehearsal (r13 verdict item 5): synthesize a
~100k-file snapshot — METADATA ONLY, zero data writes — and turn the
100 TB design claims into asserted budgets:

- a delta commit's bytes scale with the CHANGED files, never the table;
- a full checkpoint's JSON stays O(columns) (per-file plane in the
  content-addressed parquet sidecar) and resolves in bounded time;
- bloom probes lazy-load only the sidecars their candidates reference;
- vacuum's re-anchor of a retained delta keeps the bounded encoding.

The budgets are deliberately loose (CI-safe) — the point is the
complexity class, not the constant; measured values are printed for
SCALING.md's table.
"""

from __future__ import annotations

import json
import time

import _spark_multi_format_data_lake_pipeline_spark.sinks.versioned as V

N_FILES = 100_000
FILES_PER_SIDECAR = 1_000


def _schema():
    return {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }


def _synth_state(t: str) -> dict:
    files = [f"data/d0/part-{i:06d}.parquet" for i in range(N_FILES)]
    # bloom plane: content-addressed sidecar REFS, 1000 files per
    # sidecar (the writer batches one sidecar per commit; a long-lived
    # table accumulates many)
    bloom: dict[str, str] = {}
    for s in range(N_FILES // FILES_PER_SIDECAR):
        chunk = files[s * FILES_PER_SIDECAR : (s + 1) * FILES_PER_SIDECAR]
        name = V._write_bloom_sidecar(t, {f: {"id": "ab" * 64} for f in chunk})
        for f in chunk:
            bloom[f] = name
    return {
        "version": 1,
        "mode": "overwrite",
        "committed_at": 1000.0,
        "files": files,
        "row_count": N_FILES * 1000,
        "schema": _schema(),
        "bloom_by": {"cols": ["id"], "m": 4096, "k": 5},
        "file_stats": {
            f: {"id": [i * 1000, i * 1000 + 999]} for i, f in enumerate(files)
        },
        "file_meta": {
            f: {"bytes": 128 * 1024 * 1024, "rows": 1000, "v": 1}
            for f in files
        },
        "bloom": bloom,
    }


def test_manifest_plane_scale_rehearsal_100k_files(tmp_path):
    t = str(tmp_path / "tbl")
    state1 = _synth_state(t)

    t0 = time.time()
    V._commit_state(t, state1, None)
    commit_ckpt_s = time.time() - t0
    mdir = V._manifest_dir(t)
    v1_bytes = (mdir / "v1.json").stat().st_size
    plane_bytes = sum(
        p.stat().st_size for p in V._plane_dir(t).glob("p-*.parquet")
    )
    assert v1_bytes < 16_384, (
        f"checkpoint JSON must stay O(columns) at 100k files, got "
        f"{v1_bytes} bytes"
    )
    assert (mdir / "v1.json").read_text().count("part-") == 0, (
        "no file name may leak into the checkpoint JSON"
    )

    # cold resolution: parquet plane -> full snapshot dict
    V._RESOLVE_CACHE.clear()
    t0 = time.time()
    m1 = V._read_manifest(t, 1)
    resolve_ckpt_s = time.time() - t0
    assert len(m1["files"]) == N_FILES
    assert len(m1["file_stats"]) == N_FILES
    assert resolve_ckpt_s < 20.0

    # delta commit: append 10 files to a 100k-file table
    new10 = [f"data/d1/part-{i:03d}.parquet" for i in range(10)]
    state2 = {
        **m1,
        "version": 2,
        "mode": "append",
        "committed_at": 2000.0,
        "files": list(m1["files"]) + new10,
        "row_count": m1["row_count"] + 10_000,
        "file_stats": {
            **m1["file_stats"],
            **{f: {"id": [10**9, 10**9 + 999]} for f in new10},
        },
        "file_meta": {
            **m1["file_meta"],
            **{f: {"bytes": 1 << 20, "rows": 1000, "v": 2} for f in new10},
        },
    }
    t0 = time.time()
    V._commit_state(t, state2, m1)
    commit_delta_s = time.time() - t0
    v2_bytes = (mdir / "v2.json").stat().st_size
    assert json.loads((mdir / "v2.json").read_text())["kind"] == "delta"
    assert v2_bytes < 8_192, (
        f"a 10-file append on a 100k-file table must commit O(changed "
        f"files) bytes, got {v2_bytes}"
    )

    # delta resolution (checkpoint + tail)
    V._RESOLVE_CACHE.clear()
    t0 = time.time()
    m2 = V._read_manifest(t, 2)
    resolve_delta_s = time.time() - t0
    assert len(m2["files"]) == N_FILES + 10
    # warm resolution is the memoized path
    t0 = time.time()
    V._read_manifest(t, 2)
    resolve_warm_s = time.time() - t0
    assert resolve_warm_s < 0.5

    # bloom sidecar lazy load: probing 50 candidate files from one
    # sidecar's range opens exactly ONE sidecar, not 100
    V._SIDECAR_CACHE.clear()
    t0 = time.time()
    hits = [
        V._sidecar_entry_for(t, m2, f, "bloom", "blooms")
        for f in m2["files"][:50]
    ]
    bloom_lazy_s = time.time() - t0
    assert all(h == {"id": "ab" * 64} for h in hits)
    assert len(V._SIDECAR_CACHE) == 1, (
        "a 50-file probe inside one sidecar's range must open exactly "
        f"one sidecar, opened {len(V._SIDECAR_CACHE)}"
    )

    # vacuum re-anchor: dropping v1 rewrites the retained v2 delta as
    # its resolved FULL form — which must stay parquet-plane bounded
    t0 = time.time()
    deleted = V.vacuum(t, keep_last=1)
    vacuum_s = time.time() - t0
    assert deleted == []  # metadata-only table: no data files to sweep
    assert V.versions(t) == [2]
    v2b = (mdir / "v2.json").stat().st_size
    assert json.loads((mdir / "v2.json").read_text())["kind"] == "checkpoint"
    assert v2b < 16_384, (
        f"the re-anchored manifest must keep the bounded encoding, got "
        f"{v2b} bytes"
    )
    V._RESOLVE_CACHE.clear()
    m2b = V._read_manifest(t, 2)
    assert len(m2b["files"]) == N_FILES + 10
    assert m2b["file_stats"] == dict(m2["file_stats"])
    # referenced bloom sidecars survive the metadata sweep
    assert (
        V._sidecar_entry_for(t, m2b, m2b["files"][0], "bloom", "blooms")
        is not None
    )

    print(
        "\nSCALE_REHEARSAL "
        + json.dumps(
            {
                "n_files": N_FILES,
                "checkpoint_json_bytes": v1_bytes,
                "plane_parquet_bytes": plane_bytes,
                "delta_commit_bytes": v2_bytes,
                "commit_checkpoint_s": round(commit_ckpt_s, 2),
                "commit_delta_s": round(commit_delta_s, 2),
                "resolve_checkpoint_cold_s": round(resolve_ckpt_s, 2),
                "resolve_delta_cold_s": round(resolve_delta_s, 2),
                "resolve_warm_s": round(resolve_warm_s, 4),
                "bloom_lazy_load_50_files_s": round(bloom_lazy_s, 4),
                "vacuum_reanchor_s": round(vacuum_s, 2),
                "reanchored_checkpoint_bytes": v2b,
            }
        )
    )


# ---------------------------------------------------------------------------
# CDF-plane rehearsal (r15): a change feed with ~10k materialized change
# files — commit bytes, capped/uncapped stream planning, and the
# contiguity refusal, all asserted as budgets.  The stream-planning half
# is METADATA ONLY (latestOffset/partitions never stat data files — the
# byte pacing reads the committed cdf_file_meta plane); the
# read_change_feed half uses 1k REAL (tiny, byte-identical) change
# files so Spark's own file-index planning is in the measurement.
# ---------------------------------------------------------------------------

CDF_COMMITS = 100
CDF_FILES_PER_COMMIT = 100


def _cdf_table(t: str, n_commits: int, files_per_commit: int) -> None:
    data_files = [f"data/d0/part-{i:03d}.parquet" for i in range(10)]
    prev = None
    state = {
        "version": 1,
        "mode": "overwrite",
        "committed_at": 1000.0,
        "files": data_files,
        "row_count": 10_000,
        "schema": _schema(),
        "change_data_feed": True,
        "file_meta": {
            f: {"bytes": 1 << 20, "rows": 1000, "v": 1} for f in data_files
        },
    }
    V._commit_state(t, state, prev)
    prev = V._read_manifest(t, 1)
    for v in range(2, n_commits + 2):
        cdf = [
            f"_change_data/c{v:04d}/part-{i:03d}.parquet"
            for i in range(files_per_commit)
        ]
        # a copy-on-write upsert always rotates data files (unchanged
        # file sets classify as metadata-only and stream as no-ops), so
        # each synthetic commit rewrites one of the ten
        old = prev["files"][v % 10]
        rewritten = f"data/d{v:04d}/part-000.parquet"
        # carried files keep their order, the rewrite APPENDS (the real
        # CoW shape — an in-place replacement would break the delta
        # encoding's carried-order contract and force a full manifest)
        files = [f for f in prev["files"] if f != old] + [rewritten]
        meta = dict(prev["file_meta"])
        meta.pop(old, None)
        meta[rewritten] = {"bytes": 1 << 20, "rows": 1000, "v": v}
        state = {
            **prev,
            "version": v,
            "mode": "upsert",
            "committed_at": 1000.0 * v,
            "files": files,
            "file_meta": meta,
            "cdf_files": cdf,
            "cdf_file_meta": {f: {"bytes": 1 << 20} for f in cdf},
        }
        V._commit_state(t, state, prev)
        prev = V._read_manifest(t, v)


def test_cdf_plane_scale_rehearsal_10k_feed_files(tmp_path):
    from _spark_multi_format_data_lake_pipeline_spark.sources.versioned_stream import (
        VersionedChangesStreamReader,
    )

    t = str(tmp_path / "tbl")
    t0 = time.time()
    _cdf_table(t, CDF_COMMITS, CDF_FILES_PER_COMMIT)
    build_s = time.time() - t0
    head = CDF_COMMITS + 1
    n_cdf = CDF_COMMITS * CDF_FILES_PER_COMMIT

    # commit bytes: a 100-change-file commit on the feed plane stays
    # O(that commit's change files) — never the accumulated feed
    mdir = V._manifest_dir(t)
    delta_bytes = (mdir / f"v{head}.json").stat().st_size
    assert json.loads((mdir / f"v{head}.json").read_text())["kind"] == (
        "delta"
    )
    assert delta_bytes < 32_768, (
        f"a {CDF_FILES_PER_COMMIT}-file CDF commit must stay O(changed "
        f"files), got {delta_bytes} bytes"
    )

    # BYTE-PACED batch planning: a 50 MB cap admits ~50 of the 1 MB
    # files — latestOffset must stop at the cap without touching the
    # rest of the 10k-file backlog (and never stat a single file)
    r = VersionedChangesStreamReader(
        {
            "path": t,
            "readChangeFeed": "true",
            "maxBytesPerTrigger": str(50 << 20),
        }
    )
    t0 = time.time()
    off = r.latestOffset()
    capped_plan_s = time.time() - t0
    assert off.get("version", 0) <= 2, f"cap must stop early, got {off}"
    assert capped_plan_s < 2.0
    parts = r.partitions(r.initialOffset(), dict(off))
    assert len(parts) <= 51, (
        f"a 50 MB cap over 1 MB files must admit ~50, got {len(parts)}"
    )

    # UNCAPPED-equivalent walk to the head (a cap past the backlog):
    # O(versions + files) manifest math across 100 commits / 10k files
    r2 = VersionedChangesStreamReader(
        {
            "path": t,
            "readChangeFeed": "true",
            "maxFilesPerTrigger": str(2 * n_cdf),
        }
    )
    t0 = time.time()
    off2 = r2.latestOffset()
    walk_plan_s = time.time() - t0
    assert off2 == {"version": head}
    assert walk_plan_s < 10.0

    # full-feed partition construction: 10k input partitions, metadata
    # only, bounded time
    t0 = time.time()
    parts_all = r2.partitions({"version": 1}, {"version": head})
    parts_s = time.time() - t0
    assert len(parts_all) == n_cdf
    assert parts_s < 10.0

    # contiguity refusal stays O(versions): drop a mid-history manifest
    # (a tag+vacuum gap) — the feed must refuse fast, BEFORE resolving
    # any per-version state across the gap
    (mdir / "v55.json").unlink()
    t0 = time.time()
    try:
        # planning-only entry point: the guard runs before any frame
        # construction, so a refusal needs no SparkSession at all
        import pytest as _pytest

        with _pytest.raises(ValueError, match="vacuumed"):
            from _spark_multi_format_data_lake_pipeline_spark.sinks.versioned import (
                read_change_feed,
            )

            read_change_feed(None, t, 1, head)
    finally:
        gap_s = time.time() - t0
    assert gap_s < 2.0

    print(
        "\nSCALE_REHEARSAL_CDF "
        + json.dumps(
            {
                "n_commits": CDF_COMMITS,
                "n_cdf_files": n_cdf,
                "build_commits_s": round(build_s, 2),
                "delta_commit_bytes": delta_bytes,
                "byte_capped_plan_s": round(capped_plan_s, 4),
                "walk_to_head_plan_s": round(walk_plan_s, 2),
                "partitions_10k_s": round(parts_s, 2),
                "gap_refusal_s": round(gap_s, 4),
            }
        )
    )


def test_cdf_plane_read_change_feed_planning_real_files(spark, tmp_path):
    """read_change_feed over 20 commits x 50 REAL change files: the
    DataFrame construction (Spark file-index planning included) and the
    full count stay bounded — the batch-feed twin of the metadata-only
    stream rehearsal above."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pathlib import Path as _P

    from _spark_multi_format_data_lake_pipeline_spark.sinks.versioned import read_change_feed

    t = str(tmp_path / "tbl")
    # one tiny change file, byte-identical for all 1000 names
    buf = pa.BufferOutputStream()
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "v": pa.array(["a", "b"]),
                "_change_type": pa.array(["insert", "delete"]),
            }
        ),
        buf,
    )
    blob = buf.getvalue().to_pybytes()
    data_files = ["data/d0/part-000.parquet"]
    prev = None
    V._commit_state(
        t,
        {
            "version": 1,
            "mode": "overwrite",
            "committed_at": 1000.0,
            "files": [],
            "row_count": 0,
            "schema": _schema(),
            "change_data_feed": True,
        },
        prev,
    )
    prev = V._read_manifest(t, 1)
    n_commits, per = 20, 50
    for v in range(2, n_commits + 2):
        cdf = []
        d = _P(t) / "_change_data" / f"c{v:04d}"
        d.mkdir(parents=True)
        for i in range(per):
            rel = f"_change_data/c{v:04d}/part-{i:03d}.parquet"
            (_P(t) / rel).write_bytes(blob)
            cdf.append(rel)
        V._commit_state(
            t,
            {
                **prev,
                "version": v,
                "mode": "upsert",
                "committed_at": 1000.0 * v,
                "cdf_files": cdf,
                "cdf_file_meta": {f: {"bytes": len(blob)} for f in cdf},
            },
            prev,
        )
        prev = V._read_manifest(t, v)
    t0 = time.time()
    df = read_change_feed(spark, t, 1, n_commits + 1)
    plan_s = time.time() - t0
    assert plan_s < 20.0, f"feed planning took {plan_s:.1f}s"
    t0 = time.time()
    n = df.count()
    count_s = time.time() - t0
    assert n == n_commits * per * 2
    print(
        "\nSCALE_REHEARSAL_CDF_BATCH "
        + json.dumps(
            {
                "n_real_cdf_files": n_commits * per,
                "feed_plan_s": round(plan_s, 2),
                "feed_count_s": round(count_s, 2),
            }
        )
    )


def test_cdc_batch_slice_planning_rehearsal(tmp_path):
    """r16 batch-replication planning budgets over the 10k-change-file
    feed: each slice plans from MANIFEST METADATA only (O(versions
    walked + admitted files), no file stats, no stream startup, no
    Spark at all), byte caps close a slice at commit granularity, the
    whole-backlog walk re-reads each manifest O(1) times per slice
    boundary, and a mid-history vacuum hole refuses fast."""
    from _spark_multi_format_data_lake_pipeline_spark.sources.versioned_stream import (
        _plan_feed_slice,
    )

    t = str(tmp_path / "tbl")
    _cdf_table(t, CDF_COMMITS, CDF_FILES_PER_COMMIT)
    head = CDF_COMMITS + 1
    vs = V.versions(t)

    # one capped slice: 50 MB cap over 100 MB commits -> exactly one
    # commit per slice (commit-granular soft cap), planned fast
    t0 = time.time()
    hi, files = _plan_feed_slice(t, 1, head, vs, None, 50 << 20)
    one_slice_s = time.time() - t0
    assert hi == 2 and files == CDF_FILES_PER_COMMIT
    assert one_slice_s < 2.0, f"slice planning took {one_slice_s:.2f}s"

    # a 250 MB cap admits two 100 MB commits and closes on the third
    hi3, files3 = _plan_feed_slice(t, 1, head, vs, None, 250 << 20)
    assert hi3 == 4 and files3 == 3 * CDF_FILES_PER_COMMIT

    # file cap: 150 files over 100-file commits -> two commits
    hi_f, files_f = _plan_feed_slice(t, 1, head, vs, 150, None)
    assert hi_f == 3 and files_f == 2 * CDF_FILES_PER_COMMIT

    # whole-backlog walk: lo advances slice by slice to the head; the
    # loop is O(commits) slices and bounded time over 10k feed files
    t0 = time.time()
    lo, n_slices = 1, 0
    while lo < head:
        lo, _ = _plan_feed_slice(t, lo, head, vs, None, 50 << 20)
        n_slices += 1
    walk_s = time.time() - t0
    assert n_slices == CDF_COMMITS
    assert walk_s < 10.0, f"backlog slice walk took {walk_s:.2f}s"
    print(
        f"\nCDC batch planning: one_slice={one_slice_s*1e3:.1f}ms, "
        f"{n_slices}-slice backlog walk={walk_s:.2f}s"
    )

    # a vacuumed mid-history version refuses before any reads
    (V._manifest_dir(t) / "v55.json").unlink()
    vs2 = V.versions(t)
    t0 = time.time()
    try:
        _plan_feed_slice(t, 1, head, vs2, None, 50 << 20)
        raise AssertionError("must refuse the vacuum hole")
    except ValueError as e:
        assert "vacuumed" in str(e)
    assert time.time() - t0 < 1.0
