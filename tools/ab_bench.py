"""Interleaved A/B bench between two checkouts of this repo (the r10
host-variance method, made repeatable): run the same representative
queries against the same testdata from two worktrees, interleaved
A,B,A,B,... so host weather hits both sides equally, and report
per-query medians + the median B/A ratio.

Usage:
    python tools/ab_bench.py <repo_a> <repo_b> [sf_dir] [reps]

Each rep spawns a fresh python per side (the two checkouts must not
share an interpreter); one Spark session per spawn, warmed on sf0.001
before timing.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q20_top3_orders_per_customer",
    "q43_user_sessions",
    "q54_minhash_near_dup",
    "q56_topk_cosine",
    "q85_tfidf_top_terms",
    "q166_prefix_filter_neardup",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from _spark_multi_format_data_lake_pipeline_spark.session import get_spark
from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES
spark = get_spark("ab_bench")
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


def run_side(repo: str, sf_dir: str) -> dict[str, float]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, sf_dir, json.dumps(QUERIES)],
        capture_output=True,
        text=True,
        cwd=repo,
        env=env,
        timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"side {repo} produced no result; tail: {p.stdout[-500:]} "
        f"{p.stderr[-500:]}"
    )


def main() -> None:
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    a_runs: list[dict] = []
    b_runs: list[dict] = []
    for r in range(reps):
        a_runs.append(run_side(repo_a, sf_dir))
        b_runs.append(run_side(repo_b, sf_dir))
        print(f"rep {r + 1}/{reps} done", file=sys.stderr)
    med = lambda runs, n: statistics.median(run[n] for run in runs)
    per_q = {
        n: {
            "a": round(med(a_runs, n), 3),
            "b": round(med(b_runs, n), 3),
            "b_over_a": round(med(b_runs, n) / med(a_runs, n), 3),
        }
        for n in QUERIES
    }
    ratios = sorted(v["b_over_a"] for v in per_q.values())
    mid = len(ratios) // 2
    med_ratio = (
        ratios[mid]
        if len(ratios) % 2
        else (ratios[mid - 1] + ratios[mid]) / 2
    )
    print(
        json.dumps(
            {
                "metric": "ab_bench",
                "repo_a": repo_a,
                "repo_b": repo_b,
                "sf_dir": sf_dir,
                "reps": reps,
                "queries": per_q,
                "total_a": round(sum(v["a"] for v in per_q.values()), 3),
                "total_b": round(sum(v["b"] for v in per_q.values()), 3),
                "median_b_over_a": round(med_ratio, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
