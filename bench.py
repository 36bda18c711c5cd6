"""Benchmark harness: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a count() (forces the full plan without
driver-side collect overhead skewing results toward small outputs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline suite: one representative per operator family, weighted
# toward the fact-table (lineitem/orders/events) queries that dominate at
# 100 TB. Bounded-window pair queries (q53/q57) and the ANN probe are
# excluded: their cost is fixed by design, not SF-dependent.
HEADLINE = [
    "q01_pricing_summary",
    "q02_brand_revenue",
    "q03_shipping_priority",
    "q04_order_priority_semi",
    "q05_nation_volume",
    "q06_revenue_forecast",
    "q07_customer_order_stats",
    "q09_repeat_orders_30d",
    "q10_asof_prev_purchase",
    "q11_distinct_suppliers",
    "q20_top3_orders_per_customer",
    "q22_running_customer_spend",
    "q40_props_json_extract",
    "q42_hourly_event_rollup",
    "q43_user_sessions",
    "q50_exact_dedup",
    "q51_text_stats",
    "q54_minhash_near_dup",
    "q56_topk_cosine",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from _spark_multi_format_data_lake_pipeline_spark.session import get_spark
    from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES

    spark = get_spark("bench")
    # JVM/codegen warm-up on a tiny SF so headline timings measure the
    # queries, not classloading
    QUERIES["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        QUERIES[name].fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
