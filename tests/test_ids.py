"""assign_contiguous_ids: parallel contiguous numbering must equal the
single-partition row_number formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from _spark_multi_format_data_lake_pipeline_spark.operators.ids import assign_contiguous_ids


def test_ids_contiguous_and_ordered(spark):
    df = spark.range(0, 1000).select((F.col("id") * 7 % 1000).alias("k"))
    out = assign_contiguous_ids(df, ["k"], num_partitions=8).collect()
    assert sorted(r.stable_id for r in out) == list(range(1000))
    by_key = sorted(out, key=lambda r: r.k)
    assert [r.stable_id for r in by_key] == list(range(1000))


def test_ids_more_partitions_than_rows(spark):
    df = spark.range(0, 5).select(F.col("id").alias("k"))
    out = assign_contiguous_ids(df, ["k"], num_partitions=16).collect()
    assert sorted(r.stable_id for r in out) == [0, 1, 2, 3, 4]
    assert {r.k: r.stable_id for r in out} == {i: i for i in range(5)}


def test_ids_adaptive_partitions_and_folded_count(spark):
    """r17: with num_partitions=None the range shuffle's width is left
    to AQE coalescing (scale-adaptive, not a pinned conf constant) and
    with_count=True reports the exact row count off the numbering's own
    per-partition collect — ids must be identical to the explicit-width
    form, and the count must be free of a separate count() job."""
    df = spark.range(0, 777).select((F.col("id") * 13 % 777).alias("k"))
    numbered, n = assign_contiguous_ids(df, ["k"], with_count=True)
    assert n == 777
    out = numbered.collect()
    assert sorted(r.stable_id for r in out) == list(range(777))
    by_key = sorted(out, key=lambda r: r.k)
    assert [r.stable_id for r in by_key] == list(range(777))
    # empty input: count 0, empty frame, no error
    empty, n0 = assign_contiguous_ids(
        df.filter(F.lit(False)), ["k"], with_count=True
    )
    assert n0 == 0 and empty.count() == 0


def test_ids_skewed_input_partitions(spark):
    # heavily skewed source partitioning must not matter after the range
    # repartition; string keys exercise non-numeric boundaries
    df = (
        spark.range(0, 300)
        .select(F.format_string("doc-%05d", F.col("id")).alias("k"))
        .coalesce(1)
    )
    out = assign_contiguous_ids(df, ["k"], num_partitions=6).collect()
    by_key = sorted(out, key=lambda r: r.k)
    assert [r.stable_id for r in by_key] == list(range(300))
