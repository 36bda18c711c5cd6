"""Lake table loader for the driver's TPC-H-ish testdata.

Plain ``spark.read.parquet`` per table: the parquet scan is already the
optimal physical source (columnar, predicate-pushdown- and
column-pruning-capable). At 100 TB these would be partitioned/bucketed
Iceberg tables; the DataFrame surface below is identical either way, which
is the point of declaring everything against Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Defensive: the driver's verify harness builds ITS OWN SparkSession,
    # which won't carry session.py's conf. Both settings are runtime-
    # settable SQL confs and are required for correctness here:
    # - nanosAsLong: events.ts is parquet TIMESTAMP(NANOS), which Spark 4
    #   otherwise refuses to read at all;
    # - UTC session tz: timestamp->string formatting (q42 etc.) must agree
    #   with DuckDB's timezone-naive timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as raw int64 ns.
        # Normalize to a microsecond timestamp (floor division — matches
        # DuckDB's ns->us cast truncation) so downstream ops see a real
        # timestamp column.
        if dict(df.dtypes).get("ts") == "bigint":
            # integer div — float division would lose precision at 1e18 ns
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every lake table as a temp view so Spark SQL queries can
    name them exactly like the DuckDB oracle does."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
