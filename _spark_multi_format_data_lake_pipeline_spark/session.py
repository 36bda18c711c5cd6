"""SparkSession factory.

Distills the reference's session layering (reference ``config/spark_config.py:15-198``:
Iceberg conf -> Arrow conf -> performance conf -> user overrides) into one
builder that works jar-free in this sandbox and scales to a real cluster.

Scale notes (100 TB / 1000 executors):
- AQE on: runtime partition coalescing, skew-join splitting, join-strategy
  switching. This replaces the reference's hand-tuned shuffle.partitions.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE coalesces.
  On a real cluster set it ~2-3x total cores; here 32 matches local[32].
- Arrow enabled session-wide so every Python<->JVM hop is columnar
  (reference ``config/spark_config.py:124-132``).
- Kryo + 128 MB maxPartitionBytes mirror the reference's merge-job overlay
  (reference ``merge_to_minio.py:67-79``) but sized for modern executors.
"""

from __future__ import annotations

import os
from typing import Mapping

from pyspark.sql import SparkSession

_DEF_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def default_conf(shuffle_partitions: int | None = None) -> dict[str, str]:
    """Baseline conf applied to every session (test or cluster)."""
    n = shuffle_partitions or int(_DEF_CPUS)
    return {
        # -- adaptivity: the scale story. AQE re-plans at runtime using real
        #    shuffle stats: coalesces small partitions, splits skewed ones,
        #    and demotes sort-merge joins to broadcast when a side is small.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # -- runtime bloom-filter pruning (off by default): for a shuffle
        #    join whose build side is selective, inject a bloom filter of
        #    the build-side join keys into the probe-side SCAN, dropping
        #    non-matching rows before the shuffle. At 100 TB this is the
        #    difference between shuffling the whole fact table and
        #    shuffling only rows that can join.
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.shuffle.partitions": str(n),
        "spark.default.parallelism": str(n),
        # -- columnar Python boundary (Arrow), reference F3
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.pyspark.fallback.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # -- scan sizing: 128MB splits keep scan tasks balanced at any SF
        "spark.sql.files.maxPartitionBytes": "134217728",
        # -- serialization
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        # -- broadcast joins: dims up to 64MB go broadcast (region/nation/
        #    customer/supplier/part at bench SF are all far below this)
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # -- timestamps: parquet ns columns (events.ts) read losslessly
        "spark.sql.session.timeZone": "UTC",
        # write modern TIMESTAMP_MICROS, not the deprecated INT96 Spark
        # still defaults to: INT96 columns carry NO parquet min/max
        # statistics, which silently disables every time-range prune
        # (versioned zone maps AND row-group skipping) on LTZ columns
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
        "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
        # Spark rejects parquet TIMESTAMP(NANOS) outright; read the raw int64
        # and convert in the loader (events.ts) — lossless to the us level.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }


def get_spark(
    app_name: str = "spark_multi_format_data_lake_pipeline",
    master: str | None = None,
    extra_conf: Mapping[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real deployment pass ``None`` with a cluster manager configured, or
    e.g. ``yarn`` / ``k8s://...``.
    """
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{_DEF_CPUS}]")
    conf = default_conf()
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop(spark: SparkSession) -> None:
    """Graceful shutdown (reference F8: clearCache then stop)."""
    try:
        spark.catalog.clearCache()
    finally:
        spark.stop()
