"""PRIMARY KEY constraint enforcement.

The reference rejects duplicate-PK inserts
(``/root/reference/tests/sql/error_status.test:6-13`` — DuckDB enforces
the constraint). Spark's Parquet tables have no constraints, so the
engine enforces them (SURVEY §7.3 "hard parts": engine-level pre-insert
check):

- ``CREATE TABLE`` DDL may declare ``PRIMARY KEY`` (column- or
  table-level); the clause is stripped before Catalyst sees the DDL and
  the key is recorded in an engine-level registry.
- ``INSERT`` into a keyed table evaluates the incoming rows first and
  rejects the batch if it collides with existing keys or contains
  internal duplicates.

Scale: the existence check is a broadcast-able semi join on the key
column only (column-pruned scan of the target); the incoming batch is
typically small relative to the table.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swanlake_spark.errors import InvalidArgument

# table (lower, unquoted) -> pk column list
_PK_REGISTRY: dict[str, list[str]] = {}

_TABLE_LEVEL_PK = re.compile(
    r",?\s*PRIMARY\s+KEY\s*\(([^)]*)\)", re.IGNORECASE
)
_COLUMN_LEVEL_PK = re.compile(r"\bPRIMARY\s+KEY\b", re.IGNORECASE)
_CREATE_RE = re.compile(
    r"^(?P<prefix>\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<table>[\w.`\"]+)\s*)"
    r"\((?P<body>.*)\)(?P<tail>[^)]*)$",
    re.IGNORECASE | re.DOTALL,
)


def _norm_table(name: str) -> str:
    return name.strip('`"').lower()


def extract_and_strip_pk(create_sql: str) -> tuple[str, str | None, list[str]]:
    """Parse a CREATE TABLE statement; returns (rewritten_sql, table,
    pk_columns). If no PK is declared, sql is returned unchanged."""
    m = _CREATE_RE.match(create_sql)
    if not m:
        return create_sql, None, []
    prefix, table, body, tail = (
        m.group("prefix"),
        m.group("table"),
        m.group("body"),
        m.group("tail"),
    )
    pk_cols: list[str] = []

    tm = _TABLE_LEVEL_PK.search(body)
    if tm:
        pk_cols = [c.strip().strip('`"') for c in tm.group(1).split(",") if c.strip()]
        body = body[: tm.start()] + body[tm.end():]
    else:
        # column-level: "<name> <type> PRIMARY KEY"
        parts, depth, cur = [], 0, []
        for ch in body:
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
        new_parts = []
        for part in parts:
            if _COLUMN_LEVEL_PK.search(part):
                colname = part.strip().split()[0].strip('`"')
                pk_cols.append(colname)
                part = _COLUMN_LEVEL_PK.sub("", part)
            new_parts.append(part)
        body = ",".join(new_parts)
    if not pk_cols:
        return create_sql, None, []
    rewritten = f"{prefix}({body}){tail}"
    return rewritten, table, pk_cols


def register_pk(table: str, columns: list[str]) -> None:
    _PK_REGISTRY[_norm_table(table)] = columns


def pk_columns(table: str) -> list[str] | None:
    return _PK_REGISTRY.get(_norm_table(table))


def drop_pk(table: str) -> None:
    _PK_REGISTRY.pop(_norm_table(table), None)


_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?(?P<table>[\w.`\"]+)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?(?P<src>(?:VALUES|SELECT|WITH|TABLE|FROM)\b.*)$",
    re.IGNORECASE | re.DOTALL,
)


def check_insert_sql(spark: SparkSession, insert_sql: str) -> None:
    """If ``insert_sql`` targets a PK-registered table, evaluate its source
    rows and run :func:`check_insert_batch` before the insert executes.

    No-op for tables without a registered key, so the normal path pays
    nothing. The source is re-expressed as a plain SELECT; for VALUES the
    columns are aliased positionally to the target schema (the same
    alignment Spark itself applies)."""
    m = _INSERT_RE.match(insert_sql)
    if not m:
        return
    table = _norm_table(m.group("table"))
    cols = pk_columns(table)
    if not cols:
        return
    src = m.group("src").rstrip().rstrip(";")
    if src.upper().startswith("VALUES"):
        src_df = spark.sql(f"SELECT * FROM ({src})")
    else:
        src_df = spark.sql(src)
    if m.group("cols"):
        names = [c.strip().strip('`"') for c in m.group("cols").split(",")]
    else:
        names = [f.name for f in spark.table(table).schema.fields]
    src_df = src_df.toDF(*names[: len(src_df.columns)])
    # INSERT OVERWRITE replaces the table: only the batch-internal
    # uniqueness check applies.
    overwrite = m.group("mode").upper() == "OVERWRITE"
    check_insert_batch(spark, table, src_df, check_existing=not overwrite)


def bounded_existing_probe(
    spark: SparkSession, table: str, keys: list[str], stats
) -> DataFrame:
    """Key-column scan of ``table`` restricted to the batch's key range.

    The ``k BETWEEN min AND max`` predicates push into the Parquet scan
    (row-group/page skipping on column min/max statistics), so at 100 TB
    an appender batch probes only the row groups its key range can
    touch instead of scanning the whole table. Falls back to the
    unbounded scan if a bound is NULL (all-null key batch)."""
    existing = spark.table(table).select(*keys)
    cond = None
    for c in keys:
        lo, hi = stats[f"_min_{c}"], stats[f"_max_{c}"]
        if lo is None or hi is None:
            return existing
        rng = (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))
        cond = rng if cond is None else cond & rng
    return existing.filter(cond) if cond is not None else existing


def check_insert_batch(
    spark: SparkSession, table: str, new_rows: DataFrame, check_existing: bool = True
) -> None:
    """Raise InvalidArgument if inserting ``new_rows`` would violate the
    table's primary key (collision with existing rows or duplicates
    within the batch).

    One aggregation computes the internal-duplicate check (distinct key
    count vs row count) AND the per-column key min/max in a single
    driver action; the existing-table probe is then bounded to the
    batch's key range (see :func:`bounded_existing_probe`)."""
    cols = pk_columns(table)
    if not cols:
        return
    keys = [c for c in cols]
    batch_keys = new_rows.select(*keys)
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.count_distinct(F.struct(*[F.col(c) for c in keys])).alias("_nd"),
    ]
    for c in keys:
        aggs.append(F.min(c).alias(f"_min_{c}"))
        aggs.append(F.max(c).alias(f"_max_{c}"))
    stats = batch_keys.agg(*aggs).collect()[0]
    if stats["_nd"] < stats["_n"]:
        raise InvalidArgument(
            f"duplicate key in INSERT batch violates PRIMARY KEY ({', '.join(cols)}) "
            f"of {table}"
        )
    if not check_existing or stats["_n"] == 0:
        return
    existing = bounded_existing_probe(spark, table, keys, stats)
    clash = batch_keys.join(existing, keys, "left_semi").limit(1).collect()
    if clash:
        raise InvalidArgument(
            f"duplicate key value violates PRIMARY KEY ({', '.join(cols)}) of {table}"
        )
