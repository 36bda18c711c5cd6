"""Oracle output-type lint.

DuckDB widens ``SUM(BIGINT) OVER (...)`` (and plain ``SUM(BIGINT)`` in
some positions) to HUGEINT, which pandas materializes as float64 — the
driver's serialized value-hash then sees ``3.0`` on the oracle side vs
``3`` on the Spark side and fails, even though rows/schema match and
Python ``==`` says they're equal (the r6 q186/q208 bug).  This lint
binds every registered oracle against the sf0.001 views and fails on
any HUGEINT / UHUGEINT / DECIMAL output column, so that bug class can't
ship again.  DECIMAL is flagged for the same reason: pandas renders it
as object/float and the hash comparison vs Spark's double diverges.

Run:  python tools/oracle_lint.py [sf_dir]   (binds only — seconds, not
minutes; wired into round-end validation next to tools/funnel_audit.py)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

BAD_TYPES = {"HUGEINT", "UHUGEINT"}
BAD_PREFIXES = ("DECIMAL",)


def lint(sf_dir: str = "/root/testdata/sf0.001") -> list[str]:
    from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    problems: list[str] = []
    for name, q in sorted(QUERIES.items()):
        if q.oracle is None:
            continue
        try:
            rel = con.sql(q.oracle)
        except Exception as exc:  # binding failure is its own lint error
            problems.append(f"{name}: oracle failed to bind: {exc}")
            continue
        for col, typ in zip(rel.columns, rel.types):
            ts = str(typ)
            if ts in BAD_TYPES or ts.startswith(BAD_PREFIXES):
                problems.append(f"{name}: column {col!r} has driver-hash-unsafe type {ts}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    problems = lint(sf_dir)
    for p in problems:
        print(f"LINT {p}")
    print(f"oracle_lint: {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
