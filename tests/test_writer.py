"""W1 writer + F9 verification report."""

from __future__ import annotations

import pytest

from _spark_multi_format_data_lake_pipeline_spark.catalog import CatalogManager
from _spark_multi_format_data_lake_pipeline_spark.registry import TableHandle
from _spark_multi_format_data_lake_pipeline_spark.sinks.writer import verify_tables, write_tables

DB = "writer_test_db"


@pytest.fixture()
def cleanup(spark):
    yield
    CatalogManager(spark).drop_database(DB)


def test_write_and_verify(spark, cleanup):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], schema="id int, v string")
    df2 = spark.createDataFrame([(9,)], schema="x int")
    handles = [
        TableHandle(df1, "json_products", "JSON", 2, 2),
        TableHandle(df2, "csv_misc", "CSV", 1, 1),
    ]
    results = write_tables(spark, handles, database=DB)
    assert results == {"json_products": 2, "csv_misc": 1}

    report = verify_tables(spark, DB)
    assert set(report) == {"json_products", "csv_misc"}
    assert report["json_products"]["rows"] == 2
    assert report["json_products"]["columns"] == ["id", "v"]


def test_write_partitioned(spark, cleanup):
    df = spark.createDataFrame(
        [(1, "x", "2024-01-01"), (2, "y", "2024-01-02")],
        schema="id int, v string, day string",
    )
    write_tables(
        spark,
        [TableHandle(df, "events_part", "PARQUET", 2, 3)],
        database=DB,
        partition_by={"events_part": ["day"]},
    )
    got = spark.table(f"{DB}.events_part")
    assert got.count() == 2
    assert "day" in got.columns


def test_max_records_per_file_splits_output(spark, cleanup, tmp_path):
    df = spark.range(0, 100).coalesce(1)
    handles = [TableHandle(df, "wide_table", "PARQUET", 100, 1)]
    write_tables(
        spark, handles, database=DB, max_records_per_file=25
    )
    files = [
        f
        for f in (spark.table(f"{DB}.wide_table")
                  .select("_metadata.file_name").distinct().collect())
    ]
    # single task, 100 rows, cap 25 -> four data files
    assert len(files) == 4
    assert spark.table(f"{DB}.wide_table").count() == 100
