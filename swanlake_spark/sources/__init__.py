"""Data sources: warehouse table registration and format readers."""

from swanlake_spark.sources.registry import (
    TESTDATA_TABLES,
    read_table,
    register_tables,
)

__all__ = ["TESTDATA_TABLES", "read_table", "register_tables"]
