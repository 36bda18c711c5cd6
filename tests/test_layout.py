"""z-order layout: the clustering must bound per-partition spans on ALL
interleaved columns (that is the entire point vs a plain sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from _spark_multi_format_data_lake_pipeline_spark.operators.layout import zorder_by, zorder_key


def _spans(df, col):
    """per-partition (max-min) of col, averaged."""
    spans = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .agg(F.avg("span"))
        .head()[0]
    )
    return spans


def test_zorder_key_interleaves_bits(spark):
    row = (
        spark.createDataFrame([(0b101, 0b011)], "x bigint, y bigint")
        .select(zorder_key(["x", "y"], bits=3).alias("z"))
        .head()
    )
    # x bits at even positions, y at odd: x=101, y=011 -> z = 0b011011? ->
    # bit layout (b2y b2x b1y b1x b0y b0x) = (0 1 1 0 1 1)
    assert row["z"] == 0b011011


def test_zorder_bounds_both_dimensions(spark):
    pts = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("bigint").alias("y")
    )
    z = zorder_by(pts, ["x", "y"], bits=6, num_partitions=16)
    x_sorted = pts.repartitionByRange(16, "x").sortWithinPartitions("x")

    zx, zy = _spans(z, "x"), _spans(z, "y")
    sx, sy = _spans(x_sorted, "x"), _spans(x_sorted, "y")
    # plain x-sort: x is tightly bounded but y spans ~the full 0..63 range
    assert sy > 55
    # z-order: BOTH dims bounded well below the full range
    assert zx < 32 and zy < 32
    # and the worst z-order dim beats the plain sort's worst dim by 2x+
    assert max(zx, zy) * 2 < sy


def test_zorder_key_overflow_guard(spark):
    import pytest

    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)


def test_zorder_preserves_rows(spark):
    pts = spark.range(1000).select(
        (F.col("id") * 7 % 100).alias("x"), (F.col("id") * 13 % 100).alias("y")
    )
    z = zorder_by(pts, ["x", "y"], bits=5, num_partitions=8)
    assert z.count() == 1000
    assert z.columns == ["x", "y"]
