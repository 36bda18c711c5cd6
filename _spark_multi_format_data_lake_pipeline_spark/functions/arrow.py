"""Arrow interchange helpers (SURVEY.md §2 Part A.6, X1-X3).

The session enables Arrow globally (session.py), so ``toPandas`` /
``createDataFrame`` already cross the JVM<->Python boundary in columnar
batches sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``
(reference ``utils/arrow_utils.py:8-59``, ``config/spark_config.py:124-132``).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def to_pandas(df: DataFrame) -> pd.DataFrame:
    """X1 (reference utils/arrow_utils.py:8-31): Arrow-batched collect.
    Driver-memory bound by definition — only for result sets, never for
    fact tables (use mapInPandas to keep batches on executors)."""
    return df.toPandas()


def from_pandas(spark: SparkSession, pdf: pd.DataFrame, schema=None) -> DataFrame:
    """X2 (reference utils/arrow_utils.py:34-59)."""
    if schema is not None:
        return spark.createDataFrame(pdf, schema=schema)
    return spark.createDataFrame(pdf)


def normalize_partitions(df: DataFrame, max_partitions: int = 200, rows_per_partition: int = 10000) -> DataFrame:
    """X3 (reference utils/arrow_utils.py:62-84): coalesce over-partitioned
    frames before driver transfer. AQE already coalesces post-shuffle; this
    remains for freshly-read inputs. Count-free variant would use
    ``df.rdd.getNumPartitions()`` only — kept count-based for parity."""
    n = df.rdd.getNumPartitions()
    if n <= max_partitions:
        return df
    rows = df.count()
    target = min(max_partitions, max(1, rows // rows_per_partition))
    return df.coalesce(target)
