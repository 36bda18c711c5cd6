"""Phase profiler for the hot versioned/streaming queries (r17, guide §1).

Monkeypatches timing wrappers onto the versioned verbs and runs the hot
queries at the given SF, printing an exclusive-time breakdown per query.

Usage: python plans/r17/profile_hot.py [sf_dir] [q1 q2 ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from _spark_multi_format_data_lake_pipeline_spark.session import get_spark  # noqa: E402

_STACK: list[list] = []  # frames: [name, t0, child_time]
_ACC: dict[str, list[float]] = {}  # name -> [calls, exclusive, inclusive]


def _wrap(mod, name):
    fn = getattr(mod, name)
    if getattr(fn, "_profiled", False):
        return

    def wrapper(*a, **kw):
        frame = [name, time.time(), 0.0]
        _STACK.append(frame)
        try:
            return fn(*a, **kw)
        finally:
            _STACK.pop()
            dt = time.time() - frame[1]
            rec = _ACC.setdefault(name, [0, 0.0, 0.0])
            rec[0] += 1
            rec[1] += dt - frame[2]
            rec[2] += dt
            if _STACK:
                _STACK[-1][2] += dt

    wrapper._profiled = True
    setattr(mod, name, wrapper)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [
        "q272_versioned_branch_merge_diverged",
        "q287_versioned_database_replication",
        "q275_versioned_stream_drain",
        "q285_versioned_cdc_replication",
        "q280_versioned_merge_cdf_row_tracking",
        "q276_versioned_change_feed",
        "q277_versioned_stream_change_feed",
        "q286_versioned_branch_feed",
        "q279_versioned_row_tracking",
        "q229_versioned_apply_cdc_state",
        "q222_versioned_upsert_changes",
        "q230_versioned_history_audit",
        "q231_versioned_dv_delete",
        "q236_versioned_bucket_lookup",
        "q260_versioned_identity_column",
        "q268_versioned_branch_merge_back",
        "q270_versioned_clustered_table",
    ]

    import _spark_multi_format_data_lake_pipeline_spark.sinks.versioned as V
    import _spark_multi_format_data_lake_pipeline_spark.sources.versioned_stream as S
    import _spark_multi_format_data_lake_pipeline_spark.sinks.cdc as C

    for n in (
        "versioned_write", "_write_snapshot", "versioned_upsert",
        "versioned_delete", "_delete_with_vectors", "versioned_update",
        "versioned_apply_changes", "_apply_changes_commit",
        "read_change_feed", "read_version", "merge_branch",
        "_merge_branch_diverged", "create_branch", "clone_table",
        "enable_change_data_feed", "vacuum", "_harvest",
        "_harvest_file_stats", "_build_blooms", "_build_ndv", "compact",
        "_assign_fresh_row_ids", "_validate_constraints", "_write_cdf",
        "_read_files", "branch_diff", "versioned_min_max",
        "enable_row_tracking", "read_version_keyed", "read_version_bloom",
        "read_version_bloom_multi", "_commit_state",
    ):
        if hasattr(V, n):
            _wrap(V, n)
    for n in (
        "drain_versioned_changes", "replicate_versioned_changes",
        "_replicate_batch", "_drain_batch", "_capped_drain_loop",
        "replicate_database", "_land_slice", "_plan_feed_slice",
    ):
        if hasattr(S, n):
            _wrap(S, n)
    for n in ("apply_cdc_batch",):
        if hasattr(C, n):
            _wrap(C, n)

    from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES

    spark = get_spark("profile_hot")
    QUERIES["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").count()

    out = {}
    for qn in names:
        _ACC.clear()
        t0 = time.time()
        QUERIES[qn].fn(spark, sf_dir).count()
        total = time.time() - t0
        phases = {
            k: {"n": v[0], "excl": round(v[1], 2), "incl": round(v[2], 2)}
            for k, v in sorted(_ACC.items(), key=lambda kv: -kv[1][1])
            if v[2] >= 0.05
        }
        out[qn] = {"total": round(total, 2), "phases": phases}
        print(f"== {qn}: {total:.2f}s")
        for k, v in phases.items():
            print(f"   {k:34s} n={v['n']:<3d} excl={v['excl']:6.2f} incl={v['incl']:6.2f}")
        sys.stdout.flush()
    print("PROFILE_JSON " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
