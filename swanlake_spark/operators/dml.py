"""UPDATE / DELETE on Parquet tables via copy-on-write rewrite.

The reference supports UPDATE/DELETE through DuckLake (YCSB workload,
``/root/reference/tests/benchbase/ycsb-flight-sql.xml:24``); DuckLake's
physical model is copy-on-write over immutable Parquet files. Spark's
parquet tables have no DML, so this module implements the same
physical strategy natively:

- unpartitioned table → full rewrite (stage to temp, then
  ``INSERT OVERWRITE``);
- partitioned table → rewrite only the partitions whose rows match the
  predicate (dynamic partition overwrite), so at 100 TB an UPDATE that
  touches one day's partition rewrites one partition, not the table.

Affected-row counts are computed from the predicate (the reference
returns them in ``x-swanlake-affected-rows``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swanlake_spark.errors import InvalidArgument

_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<table>[\w.`\"]+)\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<table>[\w.`\"]+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def parse_update(stmt: str):
    m = _UPDATE_RE.match(stmt)
    if not m:
        return None
    sets: dict[str, str] = {}
    # split assignments on top-level commas
    depth = 0
    cur = []
    parts = []
    for ch in m.group("sets"):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    for part in parts:
        if "=" not in part:
            raise InvalidArgument(f"bad SET clause: {part!r}")
        col, val = part.split("=", 1)
        sets[col.strip().strip('`"')] = val.strip()
    return m.group("table").strip('`"'), sets, m.group("where")


def parse_delete(stmt: str):
    m = _DELETE_RE.match(stmt)
    if not m:
        return None
    return m.group("table").strip('`"'), m.group("where")


def _partition_columns(spark: SparkSession, table: str) -> list[str]:
    try:
        rows = spark.sql(f"DESCRIBE TABLE {table}").collect()
    except Exception:
        return []
    cols, in_part = [], False
    for r in rows:
        name = r.col_name.strip()
        if name.startswith("# Partition"):
            in_part = True
            continue
        if name.startswith("#") or not name:
            continue
        if in_part:
            cols.append(name)
    return cols


def _overwrite(spark: SparkSession, table: str, new_df: DataFrame, where: str | None) -> None:
    """Stage-and-overwrite. Spark refuses INSERT OVERWRITE from a
    self-referencing plan, so materialize via a temp parquet dir first.
    For partitioned tables with a predicate restricted to partition
    columns, only matching partitions are rewritten (dynamic overwrite)."""
    import tempfile

    part_cols = _partition_columns(spark, table)
    staging = tempfile.mkdtemp(prefix="swl_cow_")
    if part_cols and where:
        # Dynamic partition overwrite path: rewrite only partitions that
        # contain matching rows.
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            affected = (
                spark.table(table)
                .filter(F.expr(where))
                .select(*part_cols)
                .distinct()
            )
            cond = None
            keys = [tuple(r) for r in affected.collect()]
            if not keys:
                return
            for key in keys:
                row_cond = F.lit(True)
                for c, v in zip(part_cols, key):
                    row_cond = row_cond & (F.col(c).eqNullSafe(F.lit(v)))
                cond = row_cond if cond is None else (cond | row_cond)
            new_df.filter(cond).write.parquet(staging, mode="overwrite")
            spark.read.parquet(staging).write.insertInto(table, overwrite=True)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        new_df.write.parquet(staging, mode="overwrite")
        spark.read.parquet(staging).write.insertInto(table, overwrite=True)


def apply_update(
    df: DataFrame, assignments: dict[str, str], where: str | None
) -> DataFrame:
    """Pure transform implementing UPDATE semantics on a DataFrame
    (used directly for transaction staging)."""
    types = dict(df.dtypes)
    cond = F.expr(where).eqNullSafe(F.lit(True)) if where else F.lit(True)
    out = df
    for col, val in assignments.items():
        if col not in types:
            raise InvalidArgument(f"unknown column in SET: {col}")
        out = out.withColumn(
            col,
            F.when(cond, F.expr(val).cast(types[col])).otherwise(F.col(col)),
        )
    return out


def apply_delete(df: DataFrame, where: str | None) -> DataFrame:
    """Pure transform implementing DELETE semantics on a DataFrame."""
    if where is None:
        return df.limit(0)
    cond = F.expr(where).eqNullSafe(F.lit(True))
    return df.filter(~cond)


def update_table(
    spark: SparkSession,
    table: str,
    assignments: dict[str, str],
    where: str | None = None,
) -> int:
    """SQL UPDATE semantics; returns affected row count."""
    df = spark.table(table)
    cond = F.expr(where).eqNullSafe(F.lit(True)) if where else F.lit(True)
    affected = df.filter(cond).count()
    if affected == 0:
        return 0
    _overwrite(spark, table, apply_update(df, assignments, where), where)
    return affected


def delete_from(spark: SparkSession, table: str, where: str | None = None) -> int:
    """SQL DELETE semantics; returns affected row count."""
    df = spark.table(table)
    if where is None:
        affected = df.count()
        _overwrite(spark, table, df.limit(0), None)
        return affected
    cond = F.expr(where).eqNullSafe(F.lit(True))
    affected = df.filter(cond).count()
    if affected == 0:
        return 0
    _overwrite(spark, table, df.filter(~cond), where)
    return affected
