"""Registration machinery for the query catalog.

Each query is a pair: a Spark implementation ``fn(spark, sf_dir) ->
DataFrame`` and (when SQL-expressible) a DuckDB oracle SQL string run on the
same parquet tables. The driver compares row count + schema +
order-insensitive value hash, so:

- every computed column is aliased IDENTICALLY on both sides;
- floating aggregates are rounded on both sides (double summation order
  differs between engines);
- temporal outputs are formatted to strings on both sides (Spark
  timestamp_ntz vs DuckDB timestamp[ns] would otherwise hash-differ).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco
