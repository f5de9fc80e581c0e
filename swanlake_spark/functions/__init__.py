"""Scalar-function surface: the DuckDB→Spark dialect shim.

The reference passes SQL verbatim to DuckDB, so its users write
DuckDB-dialect function names. Spark shares most spellings (SURVEY.md
§2.4); this package transpiles the divergent ones so a reference user's
query runs unchanged: ``engine.query(sql, dialect="duckdb")``.
"""

from swanlake_spark.functions.dialect import transpile_duckdb

__all__ = ["transpile_duckdb"]
