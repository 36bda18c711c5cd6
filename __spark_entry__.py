"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in ``_spark_multi_format_data_lake_pipeline_spark/queries/``; this module just
surfaces it in the driver's shape.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES

# The driver's correctness gate samples the first 50 entries of ``queries()``
# per round.  To get every catalog query a driver-green row across rounds, we
# rotate: a small always-on core first, then queries whose implementation
# changed since their last green record (manually listed below), then every
# query the driver has never *verified*, then the already-verified rest.
#
# "Verified" is stricter than "appeared in a CORRECTNESS file": an entry only
# counts when rows/schema/hash all matched, or — for queries registered
# rows-only by design (no oracle) — when the driver recorded a row count
# without error.  Entries with any other ``err`` are treated as unchecked so
# a failed query automatically rotates back into the window next round.
_ALWAYS_ON = ("q01_pricing_summary", "q43_user_sessions", "q54_minhash_near_dup")

# Queries whose implementation changed after their most recent green driver
# record.  Keep in sync when editing query bodies: add the name here, remove
# it once a newer CORRECTNESS_r*.json shows it green again.
_RECHECK = (
    # Hash-green queries whose bodies or consumed helpers changed after
    # their latest green record.  All seven r12 entries came back green
    # in CORRECTNESS_r12 and leave per the removal rule.  r13
    # restructured the manifest metadata plane (bloom masks moved to
    # content-addressed sidecar files; full checkpoints moved to
    # parquet entries) — every versioned query consumes _read_manifest
    # /_commit_state, so one representative per consumer family
    # rotates in: copy-on-write rewrite (q222), merge-on-read DV
    # (q231), bloom probes (q239/q245 — the direct mask consumers),
    # compact (q246), shallow clone (q241), branch merge-back (q268),
    # tag-protected vacuum (q251), and the streaming source whose
    # offset/vacuum guards also changed this round (q242/q266).
    "q222_versioned_upsert_changes",
    "q231_versioned_dv_delete",
    "q239_versioned_bloom_lookup",
    "q245_versioned_bloom_multi_lookup",
    "q246_versioned_compact_dv_zorder",
    "q241_versioned_clone_upsert",
    "q268_versioned_branch_merge_back",
    "q251_versioned_tag_retention",
    "q242_versioned_stream_follow",
    "q266_versioned_stream_rate_limited",
    # r13 also: dv_covers pruning touches every DV-carrying commit
    # (upsert/update rebase + carry), and two oracle-pair stabilizers
    # changed query bodies (q133 round-tie nudge, q214 negative-zero
    # normalization).
    "q265_versioned_concurrent_append_delete",
    "q253_versioned_update_rows",
    "q133_exact_percentiles",
    "q214_cusum_changepoint",
    # r13 late: the contiguous-id assigner moved to data-borne
    # partition ids (union-composition fix) and the skyline survivor
    # pass followed — their oracle rows re-verify.
    "q110_stable_ids",
    "q260_versioned_identity_column",
    "q172_pareto_parts",
)


# Queries registered AFTER this round's 50-slot window was already full
# of never-verified backlog: they deliberately wait exactly one round
# (first driver row in the next CORRECTNESS file). The backlog-fits test
# allows overflow ONLY for names listed here, so queueing stays an
# explicit decision, never silent. Each is already oracle-proven locally
# at sf0.01 AND sf0.1 (tools/check.py; PLANS.md round-5 records). Remove
# a name once a CORRECTNESS file shows it verified.
#
# r6: drained — the four r5-queued names (q177/q179/q180/q181) are still
# never-verified so they sit at the head of the fresh backlog and get
# their first driver rows this round without queueing.
_QUEUED = ()


def _is_verified(name: str, rec: dict) -> bool:
    if rec.get("err") == "no_oracle":
        rows_only = QUERIES[name].oracle is None
        return rows_only and rec.get("spark_rows") is not None
    return (
        rec.get("rows_match") is True
        and rec.get("schema_match") is True
        and rec.get("hash_match") is True
    )


def _rotated_names() -> list[str]:
    verified: set[str] = set()
    try:
        for path in sorted(Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json")):
            for name, rec in json.loads(path.read_text()).items():
                if name in QUERIES and isinstance(rec, dict) and _is_verified(name, rec):
                    verified.add(name)
    except Exception:  # pragma: no cover - any parse issue → registry order
        return list(QUERIES)
    names = list(QUERIES)
    core = [n for n in _ALWAYS_ON if n in QUERIES]
    recheck = [n for n in _RECHECK if n in QUERIES and n not in core]
    head = set(core) | set(recheck)
    fresh = [n for n in names if n not in verified and n not in head]
    rest = [n for n in names if n in verified and n not in head]
    return core + recheck + fresh + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return QUERIES["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].fn for name in _rotated_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _rotated_names()
        if QUERIES[name].oracle is not None
    }
