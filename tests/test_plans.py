"""Plan-property regression tests: the physical plans the engine promises
(PLANS.md) must not silently degrade — pushdown reaching parquet scans,
pruned read schemas, dims broadcast."""

from __future__ import annotations

import pytest

from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES


def _plan(spark, sf_dir, name) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(em)


def test_q01_filter_pushed_and_pruned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached the scan
    assert "l_orderkey" not in plan  # unused columns pruned from ReadSchema


def test_q06_two_predicate_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q06_revenue_forecast")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24.0)" in plan


def test_q02_broadcasts_dim(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_brand_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q05_star_join_all_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q05_nation_volume")
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan
    # the one fact-side shuffle is the aggregation, not the joins
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q56_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q56_topk_cosine")
    assert "Exchange hashpartitioning" not in plan  # map + TakeOrdered only
    assert "TakeOrderedAndProject" in plan
