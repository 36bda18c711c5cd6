"""Semantic test for q152 daily gap-fill (driver parity via tools/check.py)."""

from __future__ import annotations

import datetime as dt

from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES


def test_gap_fill_densifies_and_zero_fills(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # user 7: events on Jan 1 (x2) and Jan 4 -> gaps on Jan 2, 3
        (1, "2024-01-01 10:00:00", 7),
        (2, "2024-01-01 11:00:00", 7),
        (3, "2024-01-04 09:00:00", 7),
        # user 8: single day -> single row, no gaps
        (4, "2024-02-01 00:00:00", 8),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime.fromisoformat(r[1]) for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    out = QUERIES["q152_daily_gap_fill"].fn(spark, str(tmp_path)).collect()
    u7 = sorted((r for r in out if r.user_id == 7), key=lambda r: r.day)
    assert [r.day for r in u7] == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"
    ]
    assert [r.n_events for r in u7] == [2, 0, 0, 1]
    assert [r.cum_events for r in u7] == [2, 2, 2, 3]  # flat across gaps
    u8 = [r for r in out if r.user_id == 8]
    assert len(u8) == 1 and u8[0].n_events == 1 and u8[0].cum_events == 1


def test_dau_wau_contribution_explode_matches_naive(spark, sf_dir):
    """The contribution-explode sliding-distinct trick must equal the
    naive range-join definition: WAU(day) = distinct users active in
    [day-6, day]."""
    from pyspark.sql import functions as F

    from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES
    from _spark_multi_format_data_lake_pipeline_spark.sources.lake import load_table

    got = {
        r.day: (r.dau, r.wau)
        for r in QUERIES["q154_dau_wau_stickiness"].fn(spark, sf_dir).collect()
    }
    activity = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    days = activity.select("day").distinct()
    naive = (
        days.alias("d")
        .join(
            activity.alias("a"),
            (F.col("a.day") <= F.col("d.day"))
            & (F.col("a.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy("d.day")
        .agg(F.countDistinct("a.user_id").alias("wau"))
    )
    expected = {
        r.day.isoformat(): r.wau for r in naive.collect()
    }
    assert {d: w for d, (_, w) in got.items()} == expected
