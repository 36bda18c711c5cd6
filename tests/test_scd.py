"""SCD2 dimension maintenance (sinks/scd.py): change closes + reopens,
no-ops pass through, inserts land current, point-in-time view answers."""

import pytest
from pyspark.sql import functions as F

from _spark_multi_format_data_lake_pipeline_spark.sinks.scd import (
    scd2_apply,
    scd2_as_of,
    scd2_init,
)

ATTRS = ["segment", "balance"]


@pytest.fixture()
def dim(spark):
    snap = spark.createDataFrame(
        [
            (1, "BUILDING", 100.0, "2024-01-01 00:00:00"),
            (2, "MACHINERY", 200.0, "2024-01-01 00:00:00"),
        ],
        "custkey bigint, segment string, balance double, ts string",
    )
    return scd2_init(snap, "custkey", ATTRS, "ts")


def _upd(spark, rows):
    return spark.createDataFrame(
        rows, "custkey bigint, segment string, balance double, ts string"
    )


def test_change_closes_and_reopens(spark, dim):
    out = scd2_apply(
        dim,
        _upd(spark, [(1, "BUILDING", 150.0, "2024-02-01 00:00:00")]),
        "custkey",
        ATTRS,
        "ts",
    )
    rows = sorted(
        out.filter("custkey = 1").collect(), key=lambda r: r["valid_from"]
    )
    assert len(rows) == 2
    old, new = rows
    assert not old["is_current"] and str(old["valid_to"]).startswith("2024-02-01")
    assert old["balance"] == 100.0
    assert new["is_current"] and new["balance"] == 150.0
    # untouched key 2 still single current row
    assert out.filter("custkey = 2 AND is_current").count() == 1
    # invariant: exactly one current row per key
    assert out.filter("is_current").groupBy("custkey").count().filter("count > 1").count() == 0


def test_identical_update_is_noop(spark, dim):
    out = scd2_apply(
        dim,
        _upd(spark, [(1, "BUILDING", 100.0, "2024-02-01 00:00:00")]),
        "custkey",
        ATTRS,
        "ts",
    )
    r = out.filter("custkey = 1").collect()
    assert len(r) == 1 and r[0]["is_current"]
    assert str(r[0]["valid_from"]).startswith("2024-01-01")


def test_new_key_inserts_current(spark, dim):
    out = scd2_apply(
        dim,
        _upd(spark, [(3, "FURNITURE", 300.0, "2024-03-01 00:00:00")]),
        "custkey",
        ATTRS,
        "ts",
    )
    r = out.filter("custkey = 3").collect()
    assert len(r) == 1 and r[0]["is_current"] and r[0]["segment"] == "FURNITURE"
    assert out.count() == 3


def test_latest_of_batch_wins(spark, dim):
    out = scd2_apply(
        dim,
        _upd(
            spark,
            [
                (1, "BUILDING", 120.0, "2024-02-01 00:00:00"),
                (1, "BUILDING", 180.0, "2024-02-15 00:00:00"),
            ],
        ),
        "custkey",
        ATTRS,
        "ts",
    )
    cur = out.filter("custkey = 1 AND is_current").collect()
    assert len(cur) == 1 and cur[0]["balance"] == 180.0


def test_as_of_point_in_time(spark, dim):
    v2 = scd2_apply(
        dim,
        _upd(spark, [(1, "BUILDING", 150.0, "2024-02-01 00:00:00")]),
        "custkey",
        ATTRS,
        "ts",
    )
    jan = scd2_as_of(v2, "2024-01-15 00:00:00")
    feb = scd2_as_of(v2, "2024-02-15 00:00:00")
    assert jan.filter("custkey = 1").head()["balance"] == 100.0
    assert feb.filter("custkey = 1").head()["balance"] == 150.0
    # chained second change preserves full history
    v3 = scd2_apply(
        v2,
        _upd(spark, [(1, "AUTOMOBILE", 175.0, "2024-03-01 00:00:00")]),
        "custkey",
        ATTRS,
        "ts",
    )
    assert v3.filter("custkey = 1").count() == 3
    assert scd2_as_of(v3, "2024-02-15 00:00:00").filter("custkey = 1").head()["balance"] == 150.0
