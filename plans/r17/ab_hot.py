"""Interleaved A/B for the r17-touched hot queries (tools/ab_bench.py
method verbatim — A,B,A,B per rep, fresh interpreter per side — with the
query list taken from argv so the touched set can be measured without
editing the driver-checked tools/ directory).

Usage: python plans/r17/ab_hot.py <repo_a> <repo_b> <sf_dir> <reps> q1 q2 ...
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from _spark_multi_format_data_lake_pipeline_spark.session import get_spark
from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES
spark = get_spark("ab_hot")
names = json.loads(sys.argv[3])
QUERIES["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").count()
out = {}
for n in names:
    QUERIES[n].fn(spark, sys.argv[2]).count()  # warm
    t0 = time.time()
    QUERIES[n].fn(spark, sys.argv[2]).count()
    out[n] = round(time.time() - t0, 3)
print("AB_RESULT " + json.dumps(out))
spark.stop()
"""


def run_side(repo: str, sf_dir: str, queries: list[str]) -> dict[str, float]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, sf_dir, json.dumps(queries)],
        capture_output=True,
        text=True,
        cwd=repo,
        env=env,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"side {repo} produced no result; tail: {p.stdout[-500:]} "
        f"{p.stderr[-500:]}"
    )


def main() -> None:
    repo_a, repo_b, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4])
    queries = sys.argv[5:]
    a_runs: list[dict] = []
    b_runs: list[dict] = []
    for r in range(reps):
        a_runs.append(run_side(repo_a, sf_dir, queries))
        b_runs.append(run_side(repo_b, sf_dir, queries))
        print(f"rep {r + 1}/{reps} done", file=sys.stderr)
    med = lambda runs, n: statistics.median(run[n] for run in runs)
    per_q = {
        n: {
            "a": round(med(a_runs, n), 3),
            "b": round(med(b_runs, n), 3),
            "b_over_a": round(med(b_runs, n) / med(a_runs, n), 3),
        }
        for n in queries
    }
    ratios = sorted(v["b_over_a"] for v in per_q.values())
    mid = len(ratios) // 2
    med_ratio = (
        ratios[mid] if len(ratios) % 2 else (ratios[mid - 1] + ratios[mid]) / 2
    )
    print(
        json.dumps(
            {
                "metric": "ab_hot_r17",
                "repo_a": repo_a,
                "repo_b": repo_b,
                "sf_dir": sf_dir,
                "reps": reps,
                "queries": per_q,
                "raw_a": a_runs,
                "raw_b": b_runs,
                "median_b_over_a": round(med_ratio, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
