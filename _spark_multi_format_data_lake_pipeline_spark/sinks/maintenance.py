"""Table maintenance: small-file compaction and statistics collection.

At 100 TB the two silent killers of scan performance are small files
(per-file open/footer costs dominate) and missing table statistics (the
cost-based optimizer falls back to rule-of-thumb join orders). Streaming
upserts and frequent merges produce exactly those conditions, so the
engine ships the counter-moves as first-class operations.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def compact_table(
    spark: SparkSession,
    table: str,
    target_file_mb: int = 128,
) -> dict:
    """Rewrite ``table`` into ~target_file_mb files (stage + rename swap,
    same pattern as the merge engine). Returns before/after file counts."""
    import math

    df = spark.table(table)
    n_files_before = len(df.inputFiles())
    # size estimate via the relation's statistics (works for parquet tables)
    size_bytes = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n_target = max(1, math.ceil(int(str(size_bytes)) / (target_file_mb * 1024 * 1024)))

    stage = f"{table}__compact"
    df.repartition(n_target).write.mode("overwrite").format("parquet").saveAsTable(stage)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")
    spark.catalog.refreshTable(table)
    return {
        "files_before": n_files_before,
        "files_after": len(spark.table(table).inputFiles()),
        "approx_bytes": int(str(size_bytes)),
    }


def analyze_table(spark: SparkSession, table: str, columns: list[str] | None = None) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS (+ FOR COLUMNS): feeds the
    cost-based optimizer's join re-ordering and broadcast decisions."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
