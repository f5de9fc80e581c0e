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
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swanlake_spark.errors import InvalidArgument
from swanlake_spark.plans.parser import _IDENT, _mask_literals, _scan, _unquote

_TABLE_RE = rf"{_IDENT}(?:\.{_IDENT}){{0,2}}"
_UPDATE_HEAD = re.compile(rf"^\s*UPDATE\s+(?P<table>{_TABLE_RE})", re.IGNORECASE)
_DELETE_HEAD = re.compile(
    rf"^\s*DELETE\s+FROM\s+(?P<table>{_TABLE_RE})", re.IGNORECASE
)


def _keyword_at_depth0(masked: str, word: str, start: int = 0) -> int:
    """Position of the first occurrence of ``word`` at paren-depth 0 in
    the literal-masked statement, or -1. Masking + depth tracking means
    keywords inside strings, comments, quoted identifiers, or subqueries
    never match — the scanner-grade parsing the round-1 regexes lacked."""
    up = masked.upper()
    depth = 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and i >= start and up.startswith(word, i):
            before_ok = i == 0 or not (masked[i - 1].isalnum() or masked[i - 1] in '_"`')
            j = i + len(word)
            after_ok = j >= len(masked) or not (masked[j].isalnum() or masked[j] in '_"`')
            if before_ok and after_ok:
                return i
    return -1


def _split_depth0_commas(text: str) -> list[str]:
    """Split on commas at paren-depth 0, honoring strings/comments."""
    depth = 0
    cuts = []
    for i, c in _scan(text):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            cuts.append(i)
    parts, start = [], 0
    for cut in cuts:
        parts.append(text[start:cut])
        start = cut + 1
    parts.append(text[start:])
    return parts


def _strip_stmt(stmt: str) -> str:
    return stmt.rstrip().rstrip(";").rstrip()


def parse_update(stmt: str):
    """``UPDATE t SET a = e1, b = e2 [WHERE pred]`` → (table, sets, where).

    Scanner-based: SET/WHERE are located at paren-depth 0 in the
    literal-masked text, so subquery predicates
    (``WHERE k IN (SELECT ...)``), keywords inside string literals, and
    commas inside function calls all parse correctly
    (reference DML arrives via prepared statements,
    ``swanlake-core/src/engine/prepared_statements.rs:103-137``)."""
    stmt = _strip_stmt(stmt)
    m = _UPDATE_HEAD.match(stmt)
    if not m:
        return None
    masked = _mask_literals(stmt)
    set_pos = _keyword_at_depth0(masked, "SET", m.end("table"))
    if set_pos < 0:
        return None
    where_pos = _keyword_at_depth0(masked, "WHERE", set_pos + 3)
    sets_end = where_pos if where_pos >= 0 else len(stmt)
    sets_text = stmt[set_pos + 3 : sets_end]
    where = stmt[where_pos + 5 :].strip() if where_pos >= 0 else None
    sets: dict[str, str] = {}
    for part in _split_depth0_commas(sets_text):
        eq = next((i for i, c in _scan(part) if c == "="), -1)
        if eq < 0:
            raise InvalidArgument(f"bad SET clause: {part.strip()!r}")
        sets[_unquote(part[:eq].strip())] = part[eq + 1 :].strip()
    return _unquote(m.group("table")), sets, where


def parse_delete(stmt: str):
    """``DELETE FROM t [WHERE pred]`` → (table, where); scanner-based."""
    stmt = _strip_stmt(stmt)
    m = _DELETE_HEAD.match(stmt)
    if not m:
        return None
    masked = _mask_literals(stmt)
    where_pos = _keyword_at_depth0(masked, "WHERE", m.end("table"))
    where = stmt[where_pos + 5 :].strip() if where_pos >= 0 else None
    return _unquote(m.group("table")), where


def where_has_subquery(where: str | None) -> bool:
    """True if the predicate contains a subquery (SELECT/EXISTS outside
    literals) — those can't go through ``F.expr`` and take the SQL
    set-op rewrite path instead."""
    if not where:
        return False
    return bool(re.search(r"\b(SELECT|EXISTS)\b", _mask_literals(where), re.IGNORECASE))


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


def _table_location(spark: SparkSession, table: str) -> str | None:
    try:
        rows = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    except Exception:
        return None
    for r in rows:
        if r.col_name.strip() == "Location":
            return r.data_type.strip()
    return None


def staging_dir(spark: SparkSession, table: str) -> str:
    """Cluster-visible staging path for copy-on-write rewrites.

    A driver-local ``tempfile.mkdtemp`` only works on local[n] where
    driver and executors share a filesystem; on a real cluster each
    executor would write to its *own* ``file:/tmp`` and the subsequent
    read sees partial data. Staging therefore lives as a *sibling* of the
    table's location — same FileSystem (HDFS, s3a, local), so reachable
    by every executor, but outside the table directory, which INSERT
    OVERWRITE truncates wholesale. The ``_`` prefix keeps it invisible
    to directory-level scans (Hadoop's default PathFilter hides
    ``_``/``.`` names during file listing)."""
    base = _table_location(spark, table)
    if base is None:
        base = spark.conf.get("spark.sql.warehouse.dir")
    else:
        base = base.rstrip("/").rsplit("/", 1)[0] if "/" in base.rstrip("/") else base
    return base.rstrip("/") + f"/_staging/{uuid.uuid4().hex}"


def _rm_path(spark: SparkSession, path: str) -> None:
    """Recursively delete a path via the table's Hadoop FileSystem
    (works for any scheme, not just local)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def _overwrite(spark: SparkSession, table: str, new_df: DataFrame, where: str | None) -> None:
    """Stage-and-overwrite. Spark refuses INSERT OVERWRITE from a
    self-referencing plan, so materialize to a staging dir under the
    table location first. For partitioned tables with a predicate
    restricted to partition columns, only matching partitions are
    rewritten (dynamic overwrite)."""
    part_cols = _partition_columns(spark, table)
    staging = staging_dir(spark, table)
    try:
        if part_cols and where and not where_has_subquery(where):
            # Dynamic partition overwrite path: rewrite only partitions
            # that contain matching rows.
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
    finally:
        _rm_path(spark, staging)


def _as_view(df: DataFrame) -> tuple:
    spark = df.sparkSession
    view = f"_swl_dml_{uuid.uuid4().hex[:8]}"
    df.createOrReplaceTempView(view)
    return spark, view


def _update_select_list(df: DataFrame, assignments: dict[str, str]) -> str:
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for col in assignments:
        if col not in types:
            raise InvalidArgument(f"unknown column in SET: {col}")
    parts = []
    for f in df.schema.fields:
        if f.name in assignments:
            parts.append(
                f"CAST(({assignments[f.name]}) AS {types[f.name]}) AS `{f.name}`"
            )
        else:
            parts.append(f"`{f.name}`")
    return ", ".join(parts)


def _view_ref(view: str, alias: str | None) -> str:
    """FROM-clause reference for the staged view, aliased back to the
    original table name so correlated predicates (``EXISTS (... WHERE
    other.id = t.id)``) still resolve."""
    if not alias:
        return view
    bare = alias.split(".")[-1].strip('`"')
    return f"{view} AS `{bare}`"


def apply_update(
    df: DataFrame,
    assignments: dict[str, str],
    where: str | None,
    alias: str | None = None,
) -> DataFrame:
    """Pure transform implementing UPDATE semantics on a DataFrame
    (used directly for transaction staging).

    Simple predicates stay on the ``F.expr`` fast path (no shuffle);
    subqueries — in the WHERE predicate (``WHERE k IN (SELECT ...)``) or
    in a SET value (``SET col = (SELECT max(...) ...)``) — take the SQL
    path: ``(updated rows WHERE pred) UNION ALL (t EXCEPT ALL t WHERE
    pred)`` — EXCEPT ALL preserves duplicate-row multiplicity and treats
    NULL keys as equal, matching DELETE/UPDATE row-selection
    semantics."""
    if where_has_subquery(where) or any(
        where_has_subquery(v) for v in assignments.values()
    ):
        spark, view = _as_view(df)
        ref = _view_ref(view, alias)
        sel = _update_select_list(df, assignments)
        if where is None:
            return spark.sql(f"SELECT {sel} FROM {ref}")
        updated = spark.sql(f"SELECT {sel} FROM {ref} WHERE {where}")
        kept = spark.sql(
            f"SELECT * FROM {ref} EXCEPT ALL SELECT * FROM {ref} WHERE {where}"
        )
        return updated.unionAll(kept)
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


def apply_delete(
    df: DataFrame, where: str | None, alias: str | None = None
) -> DataFrame:
    """Pure transform implementing DELETE semantics on a DataFrame."""
    if where is None:
        return df.limit(0)
    if where_has_subquery(where):
        spark, view = _as_view(df)
        ref = _view_ref(view, alias)
        return spark.sql(
            f"SELECT * FROM {ref} EXCEPT ALL SELECT * FROM {ref} WHERE {where}"
        )
    cond = F.expr(where).eqNullSafe(F.lit(True))
    return df.filter(~cond)


def _count_matching(spark: SparkSession, table: str, where: str) -> int:
    if where_has_subquery(where):
        return spark.sql(f"SELECT count(*) FROM {table} WHERE {where}").collect()[0][0]
    return spark.table(table).filter(F.expr(where).eqNullSafe(F.lit(True))).count()


def update_table(
    spark: SparkSession,
    table: str,
    assignments: dict[str, str],
    where: str | None = None,
) -> int:
    """SQL UPDATE semantics; returns affected row count."""
    df = spark.table(table)
    affected = _count_matching(spark, table, where) if where else df.count()
    if affected == 0:
        return 0
    _overwrite(spark, table, apply_update(df, assignments, where, alias=table), where)
    return affected


def delete_from(spark: SparkSession, table: str, where: str | None = None) -> int:
    """SQL DELETE semantics; returns affected row count."""
    df = spark.table(table)
    if where is None:
        affected = df.count()
        _overwrite(spark, table, df.limit(0), None)
        return affected
    affected = _count_matching(spark, table, where)
    if affected == 0:
        return 0
    _overwrite(spark, table, apply_delete(df, where, alias=table), where)
    return affected
