"""Salted aggregation/join equivalence and bucketed shuffle-free joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from _spark_multi_format_data_lake_pipeline_spark.catalog import CatalogManager
from _spark_multi_format_data_lake_pipeline_spark.operators.skew import salted_agg, salted_join
from _spark_multi_format_data_lake_pipeline_spark.registry import TableHandle
from _spark_multi_format_data_lake_pipeline_spark.sinks.writer import write_tables


@pytest.fixture()
def skewed(spark):
    # one hot key (90%) + long tail
    rows = [("hot", i, float(i % 7)) for i in range(9000)]
    rows += [(f"k{i%50}", i, float(i % 5)) for i in range(1000)]
    return spark.createDataFrame(rows, "k string, id int, v double")


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        (r.k): (r.n, round(r.s, 6))
        for r in skewed.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r.k): (r.n, round(r.s, 6))
        for r in salted_agg(
            skewed, ["k"], {"n": ("v", "count"), "s": ("v", "sum")}, salt=8
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], "k string, label string"
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(skewed, dim, "k", salt=8).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


DB = "bucket_test_db"


def test_bucketed_join_avoids_shuffle(spark):
    cat = CatalogManager(spark)
    cat.drop_database(DB)
    cat.create_database(DB)
    try:
        left = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") % 100).alias("a")
        )
        right = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("b")
        )
        write_tables(
            spark,
            [
                TableHandle(left, "t_left", "PARQUET", 10000, 2),
                TableHandle(right, "t_right", "PARQUET", 10000, 2),
            ],
            database=DB,
            bucket_by={"t_left": (8, ["k"]), "t_right": (8, ["k"])},
            recreate_database=False,
        )
        l = spark.table(f"{DB}.t_left")
        r = spark.table(f"{DB}.t_right")
        # force a non-broadcast join so the bucket layout is what matters
        joined = l.hint("merge").join(r, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10000
    finally:
        cat.drop_database(DB)


def test_aqe_splits_planted_skewed_join(spark):
    """SCALING.md claims AQE skew-split covers power-law join keys; this
    manufactures one (90% of rows on a single key, incompressible payload
    so shuffle bytes actually exceed the threshold) and asserts the
    runtime plan really was rewritten: SortMergeJoin(skew=true) with a
    'skewed' AQEShuffleRead on the hot side. Thresholds are lowered to
    test scale; the rewrite logic is identical at 256MB defaults. The
    executed plan is read after collect() — count() short-circuits and
    never finalizes AQE stages."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ]
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        # force SMJ (no broadcast) and thresholds small enough for test data
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")

        payload = F.concat(
            *[
                F.sha2(F.concat(F.col("id").cast("string"), F.lit(f"s{i}")), 256)
                for i in range(4)
            ]
        )
        left = spark.range(0, 100_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            payload.alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = left.join(right, "k")
        rows = joined.collect()
        assert len(rows) == 100_000  # inner join is lossless here

        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin(skew=true)" in final, final
        assert "coalesced and skewed" in final, final
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
