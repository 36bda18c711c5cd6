"""Driver-contract invariants for __spark_entry__ (no Spark session needed):
the rotation must expose every catalog query exactly once, keep the
always-on core first, front-load recheck + never-verified queries, and
treat errored driver records as unchecked."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import __spark_entry__ as E
from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES

REPO = Path(E.__file__).resolve().parent


def _driver_verified() -> set[str]:
    out: set[str] = set()
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, rec in json.loads(p.read_text()).items():
            if name in QUERIES and isinstance(rec, dict) and E._is_verified(name, rec):
                out.add(name)
    return out


def test_rotation_is_a_permutation_of_the_catalog():
    names = E._rotated_names()
    assert sorted(names) == sorted(QUERIES)
    assert len(names) == len(set(names))


def test_rotation_front_loads_recheck_then_never_verified():
    names = E._rotated_names()
    core = [n for n in E._ALWAYS_ON if n in QUERIES]
    assert names[: len(core)] == core
    recheck = [n for n in E._RECHECK if n in QUERIES and n not in core]
    assert names[len(core) : len(core) + len(recheck)] == recheck
    verified = _driver_verified()
    if not verified:  # fresh repo: registry order is fine
        return
    head = set(core) | set(recheck)
    fresh = [n for n in names if n not in verified and n not in head]
    # every never-verified query must come before every verified one (after
    # the core + recheck head), so the driver's 50-slot window always eats
    # unproven queries first
    tail = names[len(core) + len(recheck) :]
    assert tail[: len(fresh)] == fresh


def test_errored_records_do_not_count_as_verified():
    # a hash-green record verifies
    assert E._is_verified(
        "q01_pricing_summary",
        {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
    )
    # any failed comparison does not
    assert not E._is_verified(
        "q01_pricing_summary",
        {"rows_match": False, "schema_match": True, "hash_match": False, "err": None},
    )
    # a runtime error does not
    assert not E._is_verified(
        "q01_pricing_summary",
        {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"},
    )
    # no_oracle only verifies queries that are rows-only BY DESIGN
    rows_only = next(n for n in QUERIES if QUERIES[n].oracle is None)
    oracle_paired = next(n for n in QUERIES if QUERIES[n].oracle is not None)
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": 7, "err": "no_oracle"}
    assert E._is_verified(rows_only, rec)
    assert not E._is_verified(oracle_paired, rec)


def test_backlog_fits_driver_window():
    """Core + recheck + every never-verified query must fit the driver's
    50-slot correctness window, otherwise part of the backlog silently
    misses another round. Counts window OCCUPANCY with the same head
    decomposition as _rotated_names: verified core/recheck entries still
    hold head slots, so counting only the unproven tail would let e.g.
    48 unproven + 3 core + 2 recheck pass while 3 unproven queries fall
    outside the window. ONE sanctioned exception: names in ``_QUEUED``
    (registered after the window filled, explicitly accepted to wait
    exactly one round) may overflow — and ONLY they may; any other
    overflowing query is still a failure."""
    names = E._rotated_names()
    verified = _driver_verified()
    core = [n for n in E._ALWAYS_ON if n in QUERIES]
    recheck = [n for n in E._RECHECK if n in QUERIES and n not in core]
    head = set(core) | set(recheck)
    fresh = [n for n in names if n not in verified and n not in head]
    ordered_head = core + recheck + fresh
    overflow = set(ordered_head[50:])
    queued = set(getattr(E, "_QUEUED", ()))
    assert overflow <= queued, (
        f"core({len(core)}) + recheck({len(recheck)}) + unproven({len(fresh)})"
        f" = {len(ordered_head)} exceeds the 50-slot window with "
        f"UNSANCTIONED overflow: {sorted(overflow - queued)}"
    )
    # queued entries must actually be unproven backlog (a verified query
    # has no business waiting in the queue — remove it from _QUEUED)
    assert queued <= set(fresh), (
        f"_QUEUED contains non-backlog names: {sorted(queued - set(fresh))}"
    )


def test_changed_query_bodies_must_be_rechecked():
    """Mechanized recheck discipline: if a query's function source or
    oracle changed since QUERY_HASHES.json was generated, the query must
    be unproven (rotates into the window anyway) or listed in _RECHECK —
    otherwise a silent edit to a verified query would dodge the driver
    gate forever. Fix by adding the name to _RECHECK (driver re-proves
    it) and regenerating: python tools/query_hashes.py --write.
    NOTE: helper-module edits don't move these hashes — those still need
    a manual _RECHECK entry (tools/query_hashes.py docstring)."""
    sys.path.insert(0, str(REPO / "tools"))
    import query_hashes

    manifest = query_hashes.load_manifest()
    assert manifest, "QUERY_HASHES.json missing - run tools/query_hashes.py --write"
    cur = query_hashes.compute()
    verified = _driver_verified()
    offenders = [
        n
        for n in cur
        if n in manifest
        and manifest[n] != cur[n]
        and n in verified
        and n not in E._RECHECK
        and n not in E._ALWAYS_ON
    ]
    assert not offenders, (
        f"query bodies changed but not queued for driver recheck: {offenders}; "
        "add to _RECHECK in __spark_entry__.py, then "
        "python tools/query_hashes.py --write"
    )


def test_oracle_keys_subset_of_queries():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_readme_counts_match_registry():
    """README's catalog-size line must track the registry (VERDICT r6
    flagged the stale '194-query' line): the total and the oracle-paired
    / rows-only split are greppable facts, so pin them."""
    total = len(QUERIES)
    paired = sum(1 for q in QUERIES.values() if q.oracle is not None)
    rows_only = total - paired
    text = (REPO / "README.md").read_text()
    assert f"{total}-query catalog" in text, (
        f"README catalog count stale: expected '{total}-query catalog'"
    )
    assert f"{paired} oracle-paired" in text, (
        f"README oracle-paired count stale: expected '{paired} oracle-paired'"
    )
    assert f"{rows_only} rows-only" in text, (
        f"README rows-only count stale: expected '{rows_only} rows-only'"
    )
