"""Config-builder parity (SURVEY.md §2 Part A.7 F1/F2/F5): topology dicts
must be constructible and complete without the Iceberg/S3 runtime."""

from __future__ import annotations

from _spark_multi_format_data_lake_pipeline_spark.config import (
    S3Config,
    executor_sizing,
    iceberg_catalog_conf,
    iceberg_extensions_conf,
    merge_job_overlay,
    s3a_conf,
)


def test_local_iceberg_catalog():
    conf = iceberg_catalog_conf("local", "/tmp/warehouse")
    assert conf["spark.sql.catalog.local"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.local.type"] == "hadoop"
    assert conf["spark.sql.catalog.local.warehouse"] == "/tmp/warehouse"
    assert not any(".s3." in k for k in conf)


def test_s3_iceberg_catalog():
    s3 = S3Config("http://localhost:9000", "ak", "sk")
    conf = iceberg_catalog_conf("minio_catalog", "s3a://bucket/wh", s3)
    assert conf["spark.sql.catalog.minio_catalog.io-impl"].endswith("S3FileIO")
    assert conf["spark.sql.catalog.minio_catalog.s3.endpoint"] == "http://localhost:9000"
    assert conf["spark.sql.catalog.minio_catalog.s3.path-style-access"] == "true"


def test_s3a_conf_complete():
    conf = s3a_conf(S3Config("http://minio:9000", "ak", "sk", ssl_enabled=False))
    assert conf["spark.hadoop.fs.s3a.connection.maximum"] == "100"
    assert conf["spark.hadoop.fs.s3a.multipart.size"] == str(100 * 1024 * 1024)
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"
    assert conf["spark.hadoop.fs.s3a.attempts.maximum"] == "3"


def test_merge_overlay_and_sizing():
    o = merge_job_overlay()
    assert o["spark.sql.shuffle.partitions"] == "50"
    assert o["spark.sql.files.maxPartitionBytes"] == str(64 * 1024 * 1024)
    s = executor_sizing(num_executors=10)
    assert s["spark.executor.instances"] == "10"
    assert "spark.sql.extensions" in iceberg_extensions_conf()


def test_jar_manifest_shapes():
    from _spark_multi_format_data_lake_pipeline_spark.config import jar_manifest

    base = jar_manifest()
    assert base == [
        "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.8.1"
    ]
    s3 = jar_manifest(with_s3=True)
    assert len(s3) == 3 and any("hadoop-aws" in j for j in s3)
    # reference main.py:17-19 parity: the (unused-there-too) MySQL and
    # Mongo connector coordinates are declared behind a flag
    jdbc = jar_manifest(with_jdbc_connectors=True)
    assert "mysql:mysql-connector-java:8.0.33" in jdbc
    assert any("mongo-spark-connector" in j for j in jdbc)


def test_cleanup_plan_is_declarative():
    from _spark_multi_format_data_lake_pipeline_spark.config import (
        object_store_cleanup_plan,
    )

    plan = object_store_cleanup_plan("lake", "warehouse/")
    assert plan["action"] == "delete_objects" and plan["bucket"] == "lake"
