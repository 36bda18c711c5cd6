"""Table registry (SURVEY.md §1.1: the reference models 'table = one source
file' as tuples ``(DataFrame, table_name, source_type, row_count,
col_count)`` — reference ``schema_manager.py:108-139``). A dataclass instead
of a bare tuple, same contract."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class TableHandle:
    df: DataFrame
    name: str
    source_type: str
    row_count: int
    col_count: int

    def as_tuple(self):
        """The reference's tuple shape, for drop-in compatibility."""
        return (self.df, self.name, self.source_type, self.row_count, self.col_count)
