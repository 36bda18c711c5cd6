"""Dump .explain('formatted') for named queries to plans/r17/<q>_<tag>.txt.

Usage: python plans/r17/dump_plans.py <repo> <tag> [sf_dir] q1 q2 ...
The repo arg lets the same script dump "before" plans from a pinned
worktree and "after" plans from the working tree.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

OUT = Path("/root/repo/plans/r17")


def main() -> None:
    repo, tag = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3]
    names = sys.argv[4:]
    sys.path.insert(0, repo)
    from _spark_multi_format_data_lake_pipeline_spark.session import get_spark
    from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES

    spark = get_spark(f"plans_{tag}")
    QUERIES["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").count()
    for n in names:
        df = QUERIES[n].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (OUT / f"{n}_{tag}.txt").write_text(buf.getvalue())
        print(f"dumped {n}_{tag} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
