"""Catalog / DDL surface (SURVEY.md §2 Part A.5, D1-D9).

Works against the built-in ``spark_catalog`` (in-memory or Hive); the same
SQL works against an Iceberg catalog when the runtime jars are configured
(see sinks/writer.py for the format selection). The reference's dynamic
catalog registration (D8) maps to ``spark.conf.set`` calls here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class CatalogManager:
    def __init__(self, spark: SparkSession, catalog: str = "spark_catalog"):
        self.spark = spark
        self.catalog = catalog

    def _q(self, db: str) -> str:
        return f"{self.catalog}.{db}" if self.catalog else db

    def drop_database(self, db: str) -> None:
        """D1 (reference main.py:122)."""
        self.spark.sql(f"DROP DATABASE IF EXISTS {self._q(db)} CASCADE")

    def create_database(self, db: str) -> None:
        """D2 (reference utils/spark_write_iceberg.py:50)."""
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {self._q(db)}")

    def list_tables(self, db: str) -> list[str]:
        """D4 (reference utils/catalog_manager.py:16-18)."""
        rows = self.spark.sql(f"SHOW TABLES IN {self._q(db)}").collect()
        # SHOW TABLES also lists session temp views — exclude them, they
        # are not tables of this database
        return [r.tableName for r in rows if not r.isTemporary]

    def list_databases(self) -> list[str]:
        """D5 (reference utils/catalog_manager.py:27)."""
        rows = self.spark.sql(
            f"SHOW DATABASES IN {self.catalog}" if self.catalog else "SHOW DATABASES"
        ).collect()
        return [r[0] for r in rows]

    def table_exists(self, qualified_name: str) -> bool:
        """D6 — via the catalog API, not try/except (reference
        utils/catalog_manager.py:40-46 used the probe form)."""
        return self.spark.catalog.tableExists(qualified_name)

    def table(self, qualified_name: str) -> DataFrame:
        """S6 (reference merge_to_minio.py:174)."""
        return self.spark.table(qualified_name)

    def register_catalog(self, name: str, conf: dict[str, str]) -> None:
        """D8 (reference config/catalog_config.py:10-63): runtime catalog
        registration via spark.sql.catalog.{name}.* settings."""
        for k, v in conf.items():
            self.spark.conf.set(f"spark.sql.catalog.{name}.{k}", v)

    def clear_cache(self) -> None:
        """D9 (reference utils/merge_utils.py:56)."""
        self.spark.catalog.clearCache()
