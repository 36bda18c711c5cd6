from .writer import write_tables, verify_tables
from .merge import TableMerger, find_key_column

__all__ = ["write_tables", "verify_tables", "TableMerger", "find_key_column"]
