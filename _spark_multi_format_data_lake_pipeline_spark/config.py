"""Deployment configuration builders (SURVEY.md §2 Part A.7: F1 session
sizing, F2 Iceberg/S3A conf, F5 merge-job overlay).

Pure dict builders — they do not require the Iceberg runtime or an S3
endpoint to construct, so the topology is unit-testable in this sandbox
and usable as-is on a real cluster with the jars on the classpath
(reference ``config/spark_config.py:62-116``, ``config/catalog_config.py``,
``merge_to_minio.py:67-79``).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class S3Config:
    """Object-store endpoint (reference ``config/minio_config.py:8-24``)."""

    endpoint: str
    access_key: str
    secret_key: str
    path_style_access: bool = True
    ssl_enabled: bool = False
    region: str = "us-east-1"


def iceberg_catalog_conf(
    name: str, warehouse: str, s3: S3Config | None = None
) -> dict[str, str]:
    """spark.sql.catalog.* settings for a Hadoop-type Iceberg catalog
    (reference ``config/catalog_config.py:10-63``): filesystem-pointer
    catalog, no metastore; S3FileIO when an endpoint is given."""
    conf = {
        f"spark.sql.catalog.{name}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{name}.type": "hadoop",
        f"spark.sql.catalog.{name}.warehouse": warehouse,
    }
    if s3 is not None:
        conf.update(
            {
                f"spark.sql.catalog.{name}.io-impl": "org.apache.iceberg.aws.s3.S3FileIO",
                f"spark.sql.catalog.{name}.s3.endpoint": s3.endpoint,
                f"spark.sql.catalog.{name}.s3.access-key-id": s3.access_key,
                f"spark.sql.catalog.{name}.s3.secret-access-key": s3.secret_key,
                f"spark.sql.catalog.{name}.s3.path-style-access": str(s3.path_style_access).lower(),
                f"spark.sql.catalog.{name}.client.region": s3.region,
            }
        )
    return conf


def iceberg_extensions_conf() -> dict[str, str]:
    """Session extension enabling MERGE INTO / row-level ops on Iceberg
    (reference ``config/spark_config.py:80``)."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        )
    }


def s3a_conf(s3: S3Config) -> dict[str, str]:
    """Hadoop S3A tuning (reference ``config/spark_config.py:84-116``):
    keys, endpoint, path-style, pool of 100, fast upload, 100 MB
    multipart, bounded retries/timeouts."""
    return {
        "spark.hadoop.fs.s3a.endpoint": s3.endpoint,
        "spark.hadoop.fs.s3a.access.key": s3.access_key,
        "spark.hadoop.fs.s3a.secret.key": s3.secret_key,
        "spark.hadoop.fs.s3a.path.style.access": str(s3.path_style_access).lower(),
        "spark.hadoop.fs.s3a.connection.ssl.enabled": str(s3.ssl_enabled).lower(),
        "spark.hadoop.fs.s3a.endpoint.region": s3.region,
        "spark.hadoop.fs.s3a.connection.maximum": "100",
        "spark.hadoop.fs.s3a.fast.upload": "true",
        "spark.hadoop.fs.s3a.multipart.size": "104857600",
        "spark.hadoop.fs.s3a.attempts.maximum": "3",
        "spark.hadoop.fs.s3a.connection.timeout": "60000",
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    }


def merge_job_overlay(shuffle_partitions: int = 50) -> dict[str, str]:
    """Conf overlay for catalog-to-catalog merge jobs (reference
    ``merge_to_minio.py:67-79``): smaller shuffle width, 64 MB input
    splits, storage-lean memory fractions, long network timeouts."""
    return {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.files.maxPartitionBytes": str(64 * 1024 * 1024),
        "spark.memory.fraction": "0.8",
        "spark.memory.storageFraction": "0.3",
        "spark.network.timeout": "1200s",
        "spark.executor.heartbeatInterval": "60s",
    }


def executor_sizing(
    executor_memory: str = "4g",
    executor_cores: int = 4,
    num_executors: int | None = None,
    driver_memory: str = "4g",
    max_result_size: str = "2g",
) -> dict[str, str]:
    """F1 sizing knobs (reference ``config/spark_config.py:15-60``).
    num_executors=None leaves dynamic allocation to the cluster manager."""
    conf = {
        "spark.executor.memory": executor_memory,
        "spark.executor.cores": str(executor_cores),
        "spark.driver.memory": driver_memory,
        "spark.driver.maxResultSize": max_result_size,
    }
    if num_executors is not None:
        conf["spark.executor.instances"] = str(num_executors)
    return conf


def jar_manifest(
    spark_minor: str = "4.0",
    scala: str = "2.13",
    iceberg_version: str = "1.8.1",
    hadoop_aws_version: str = "3.4.1",
    with_s3: bool = False,
    with_jdbc_connectors: bool = False,
) -> list[str]:
    """Maven coordinates for the lakehouse runtime (reference
    ``config/minio_config.py:39-47``, ``main.py:17-25`` — F6). The sandbox
    has no Maven access, so this list is *declared* here and only consumed
    by ``session.get_spark(jars=...)`` when a cluster can resolve it; every
    code path that needs the Iceberg runtime degrades to the jar-free
    equivalent when absent (sinks/merge.py).

    ``with_jdbc_connectors`` adds the MySQL/MongoDB connector
    coordinates the reference declares (main.py:17-19) — unused by any
    reference code path too, carried for manifest parity behind a flag
    so the default list stays exactly what the engine can exercise.
    """
    jars = [
        f"org.apache.iceberg:iceberg-spark-runtime-{spark_minor}_{scala}:{iceberg_version}",
    ]
    if with_s3:
        jars += [
            f"org.apache.iceberg:iceberg-aws-bundle:{iceberg_version}",
            f"org.apache.hadoop:hadoop-aws:{hadoop_aws_version}",
        ]
    if with_jdbc_connectors:
        jars += [
            "mysql:mysql-connector-java:8.0.33",
            f"org.mongodb.spark:mongo-spark-connector_{scala}:10.4.1",
        ]
    return jars


def object_store_cleanup_plan(bucket: str, prefix: str = "") -> dict:
    """Deliberately NOT an implementation of the reference's boto3 bucket
    purge (``main.py:56-86`` — F7): a destructive out-of-band delete has no
    place inside an analytics engine. Returns the parameters a deployment's
    external janitor job would use; documented divergence (SURVEY.md §2
    A.7).
    """
    return {"bucket": bucket, "prefix": prefix, "action": "delete_objects"}
