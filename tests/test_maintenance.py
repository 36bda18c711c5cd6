"""Compaction + statistics maintenance."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from _spark_multi_format_data_lake_pipeline_spark.catalog import CatalogManager
from _spark_multi_format_data_lake_pipeline_spark.sinks.maintenance import analyze_table, compact_table


@pytest.fixture()
def db(spark):
    name = f"maint_{uuid.uuid4().hex[:6]}"
    CatalogManager(spark).create_database(name)
    yield name
    CatalogManager(spark).drop_database(name)


def test_compact_reduces_files(spark, db):
    t = f"{db}.fragmented"
    # 64 tiny files
    spark.range(0, 10000).repartition(64).write.saveAsTable(t)
    res = compact_table(spark, t, target_file_mb=128)
    assert res["files_before"] == 64
    assert res["files_after"] < res["files_before"]
    assert spark.table(t).count() == 10000


def test_analyze_populates_stats(spark, db):
    t = f"{db}.stats_t"
    spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 10).alias("k")
    ).write.saveAsTable(t)
    analyze_table(spark, t, columns=["k"])
    desc = {r.col_name: r.data_type for r in spark.sql(f"DESCRIBE EXTENDED {t}").collect()}
    assert "Statistics" in desc  # rowCount/sizeInBytes recorded
