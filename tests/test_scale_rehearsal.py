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
