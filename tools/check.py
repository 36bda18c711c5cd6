"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive value multiset (floats rounded the same way both engines
already round in the queries).

Usage:  python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def duck_conn(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        try:
            if pd.isna(v):
                return None
        except (TypeError, ValueError):
            pass
        # Type-strict: the driver's serialized value-hash distinguishes
        # int 3 from float 3.0 (the r6 HUGEINT→float64 oracle bug passed
        # here under Python's `3.0 == 3` but failed the driver).  Tag
        # floats so an int-valued float never compares equal to an int.
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            return ("f", round(v, 6))
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm(x) for x in v)
        return v

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from _spark_multi_format_data_lake_pipeline_spark.session import get_spark
    from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES

    unknown = sorted(only - set(QUERIES))
    if unknown:
        # A typo'd name must be an error, not a vacuous "0 failed": a
        # green gate that can pass without running anything is a gate bug.
        print(
            "ERROR: unknown query name(s): " + ", ".join(unknown),
            file=sys.stderr,
        )
        return 2

    spark = get_spark("check")
    con = duck_conn(sf_dir)

    n_pass = n_fail = 0
    for name, q in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.sql(q.oracle).df()
        except Exception:
            print(f"FAIL {name}: duckdb raised")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} duck={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} duck={sorted(odf.columns)}")
        if not problems:
            cs, co = canon(sdf), canon(odf)
            if cs != co:
                diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
