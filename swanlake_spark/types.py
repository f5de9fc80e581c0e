"""Type bridge: DuckDB-dialect type names → Spark SQL types.

Re-expresses the reference's canonical mapping
(``/root/reference/swanlake-core/src/types.rs:23-130`` — DuckDB typename
→ Arrow) against ``pyspark.sql.types``, per the decision table in
SURVEY.md §1.2. Notable deliberate divergences (documented there):

- UBIGINT → Decimal(20,0)  (no unsigned 64-bit in Spark; max value
  18446744073709551615 overflows LongType)
- TIME → LongType micros-since-midnight (Spark 4.1's TimeType exists
  but parquet storage rejects it — UNSUPPORTED_TIME_TYPE — so a typed
  TIME column can't back a warehouse table)
- UUID → StringType (canonical text form)
- DECIMAL(p>38) → rejected (Spark max precision 38; reference allows 76)
- MAP/STRUCT → supported here even though the reference rejects them
  (types.rs:89-92) — Spark gives them for free.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from swanlake_spark.errors import InvalidArgument

# Scalar name → Spark type factory. Keys are upper-case, space-normalized.
_SCALAR: dict[str, T.DataType] = {}


def _reg(names: str, dtype: T.DataType) -> None:
    for n in names.split("|"):
        _SCALAR[n] = dtype


_reg("BIGINT|INT8|LONG", T.LongType())
_reg("INTEGER|INT|INT4|SIGNED", T.IntegerType())
_reg("SMALLINT|INT2|SHORT", T.ShortType())
_reg("TINYINT|INT1", T.ByteType())
_reg("UBIGINT", T.DecimalType(20, 0))
_reg("UINTEGER", T.LongType())
_reg("USMALLINT", T.IntegerType())
_reg("UTINYINT", T.ShortType())
_reg("VARCHAR|CHAR|BPCHAR|TEXT|STRING", T.StringType())
_reg("BOOLEAN|BOOL|LOGICAL", T.BooleanType())
_reg("DOUBLE|FLOAT8", T.DoubleType())
_reg("FLOAT|FLOAT4|REAL", T.FloatType())
_reg("DATE", T.DateType())
_reg("TIME", T.LongType())  # micros since midnight (SURVEY §1.2; Spark
# 4.1 TimeType can't be stored in parquet — see module docstring)
_reg("TIMESTAMP|DATETIME", T.TimestampNTZType())
_reg("TIMESTAMPTZ|TIMESTAMP WITH TIME ZONE", T.TimestampType())
_reg("BLOB|BYTEA|BINARY|VARBINARY", T.BinaryType())
_reg("UUID", T.StringType())
_reg("JSON", T.StringType())
_reg("BIT|BITSTRING", T.BinaryType())
_reg("INTERVAL", T.DayTimeIntervalType())
_reg("HUGEINT|UHUGEINT|BIGNUM", T.DecimalType(38, 0))

_DECIMAL_RE = re.compile(
    r"^(?:DECIMAL|NUMERIC)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?$"
)
_VARCHAR_LEN_RE = re.compile(r"^(?:VARCHAR|CHAR|BPCHAR)\s*\(\s*\d+\s*\)$")


def duckdb_type_to_spark(name: str) -> T.DataType:
    """Parse a DuckDB-dialect type name (incl. ``T[]``, ``DECIMAL(p,s)``,
    ``MAP(K,V)``, ``STRUCT(...)``) into a Spark :class:`DataType`.

    Reference behavior: ``duckdb_type_to_arrow``
    (``/root/reference/swanlake-core/src/types.rs:23-130``).
    """
    s = name.strip()
    # Nested arrays: T[] / T[][] (reference types.rs:26-32,95-101)
    if s.endswith("[]"):
        return T.ArrayType(duckdb_type_to_spark(s[:-2]))
    u = re.sub(r"\s+", " ", s.upper())
    if u in _SCALAR:
        return _SCALAR[u]
    m = _DECIMAL_RE.match(u)
    if m:
        p = int(m.group(1) or 18)
        sc = int(m.group(2) or 3)
        if p > 38:
            # Reference maps 38<p<=76 to Decimal256 (types.rs:83-84);
            # Spark caps at 38 → reject, per SURVEY §1.2.
            raise InvalidArgument(f"DECIMAL precision {p} exceeds Spark max 38")
        return T.DecimalType(p, sc)
    if _VARCHAR_LEN_RE.match(u):
        # Length is declared but not enforced — same as DuckDB, which
        # ignores char(25) lengths in the TPC-H DDL.
        return T.StringType()
    m = re.match(r"^MAP\s*\(\s*(.+)\s*,\s*(.+)\s*\)$", u)
    if m:
        return T.MapType(
            duckdb_type_to_spark(m.group(1)), duckdb_type_to_spark(m.group(2))
        )
    raise InvalidArgument(f"unsupported type: {name!r}")


def spark_type_to_sql(dtype: T.DataType) -> str:
    """Spark DataType → Spark SQL DDL string (for CREATE TABLE rendering)."""
    return dtype.simpleString().upper()


def translate_ddl_types(sql: str) -> str:
    """Best-effort rewrite of DuckDB-only type names inside a DDL string to
    their Spark spellings (UBIGINT→DECIMAL(20,0), BLOB→BINARY, ...).

    Only touches word tokens, so identifiers that merely contain a type
    name are safe (word-boundary match on known DuckDB-only names).
    """
    replacements = {
        "UBIGINT": "DECIMAL(20,0)",
        "UINTEGER": "BIGINT",
        "USMALLINT": "INT",
        "UTINYINT": "SMALLINT",
        "HUGEINT": "DECIMAL(38,0)",
        "UHUGEINT": "DECIMAL(38,0)",
        "BLOB": "BINARY",
        "BYTEA": "BINARY",
        "UUID": "STRING",
        "JSON": "STRING",
        "TEXT": "STRING",
        "DATETIME": "TIMESTAMP_NTZ",
        "TIMESTAMPTZ": "TIMESTAMP",
        "LOGICAL": "BOOLEAN",
    }
    def _in_type_position(text: str, start: int) -> bool:
        # A type-name TOKEN is only a type when something type-like
        # precedes it: an identifier (the column being defined, or AS
        # in a cast) or a generic/struct-field opener (< or :). After
        # '(' or ',' the token is a COLUMN NAME — "CREATE TABLE t
        # (text STRING)" must not become "(STRING STRING)"; users
        # really do name columns text/json/uuid.
        j = start - 1
        while j >= 0 and text[j].isspace():
            j -= 1
        if j < 0:
            return False
        c = text[j]
        if c in "<:":
            return True
        if c in "(,":
            return False
        return c.isalnum() or c in '_`"'

    def _guarded(repl: str):
        def f(m: "re.Match[str]") -> str:
            return repl if _in_type_position(m.string, m.start()) else m.group(0)

        return f

    out = sql
    for duck, spark in replacements.items():
        out = re.sub(
            rf"\b{duck}\b", _guarded(spark), out, flags=re.IGNORECASE
        )
    # VARCHAR/CHAR with or without a length → STRING: DuckDB ignores the
    # length (tpch-ddl char(25) unenforced, SURVEY §1.2) and Spark rejects
    # bare VARCHAR, so dropping it matches both.
    def _char_repl(m: "re.Match[str]") -> str:
        return (
            "STRING"
            if _in_type_position(m.string, m.start())
            else m.group(0)
        )

    out = re.sub(
        r"\b(?:VARCHAR|BPCHAR|CHARACTER\s+VARYING|CHAR|CHARACTER)\b(\s*\(\s*\d+\s*\))?",
        _char_repl,
        out,
        flags=re.IGNORECASE,
    )
    # DuckDB array DDL T[] (incl. nested T[][]) → ARRAY<T>
    while re.search(r"\[\s*\]", out):
        out = re.sub(
            r"((?:ARRAY<[^<>]*(?:<[^<>]*>)?[^<>]*>|\w+(?:\(\d+(?:,\s*\d+)?\))?))\s*\[\s*\]",
            r"ARRAY<\1>",
            out,
        )
    # Bare TIMESTAMP means no-timezone in DuckDB (types.rs:55-58).
    out = re.sub(r"\bTIMESTAMP\b(?!_NTZ|\s+WITH)", "TIMESTAMP_NTZ", out, flags=re.IGNORECASE)
    return out
