"""Driver-contract invariants for __spark_entry__ (no Spark session needed):
the rotation must expose every catalog query exactly once, keep the
always-on core first, and front-load queries the driver has never checked."""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as E
from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES

REPO = Path(E.__file__).resolve().parent


def _driver_checked() -> set[str]:
    out: set[str] = set()
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        out.update(json.loads(p.read_text()))
    return out


def test_rotation_is_a_permutation_of_the_catalog():
    names = E._rotated_names()
    assert sorted(names) == sorted(QUERIES)
    assert len(names) == len(set(names))


def test_rotation_front_loads_never_checked_queries():
    names = E._rotated_names()
    core = [n for n in E._ALWAYS_ON if n in QUERIES]
    assert names[: len(core)] == core
    checked = _driver_checked()
    if not checked:  # fresh repo: registry order is fine
        return
    fresh = [n for n in names if n not in checked and n not in core]
    # every never-checked query must come before every already-checked one
    # (after the core), so the driver's 50-slot window always eats fresh
    # queries first
    tail = names[len(core):]
    assert tail[: len(fresh)] == fresh


def test_oracle_keys_subset_of_queries():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    assert all(isinstance(s, str) and s.strip() for s in o.values())
