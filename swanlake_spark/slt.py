"""sqllogictest-style runner for the ported reference corpus.

The reference drives its ``tests/sql/*.test`` files through a Rust
runner (``/root/reference/tests/runner/src/main.rs:145-278``); this is
the Python port running against the Spark engine. Format
(``/root/reference/tests/sql/README.md``):

- ``require <feature>`` — ignored.
- ``statement ok|error`` + SQL lines (blank line ends the block).
- ``query <types|error>`` + SQL lines until ``----``, then expected rows
  (tab-separated; whitespace normalized to tabs) until a blank line.

Rendering parity with the reference runner (``main.rs:288-323``):
NULL renders as ``NULL``; booleans lowercase; binary as utf8-or-hex;
timestamps ISO-8601 with ``T``.

Dialect adaptations applied per statement (the ported files stay as
close to the originals as Spark's SQL dialect permits; divergences are
noted in file headers):

- ``__TEST_DIR__`` → per-run temp dir
- double-quoted identifiers → backticks (``""`` escape honored)
- DuckDB typenames in CREATE TABLE → Spark types (types.py bridge)
- ``TIMESTAMP WITH TIME ZONE`` → ``TIMESTAMP`` (session tz is UTC)
- ``SHOW ALL TABLES`` → ``SHOW TABLES``; SHOW TABLES results project the
  name column for single-column expectations
"""

from __future__ import annotations

import datetime
import decimal
import os
import re
import tempfile
from dataclasses import dataclass, field

from swanlake_spark.errors import EngineError
from swanlake_spark.types import translate_ddl_types


@dataclass
class Record:
    kind: str  # "statement" | "query"
    expect_error: bool
    sql: str
    expected: list[str] = field(default_factory=list)
    line: int = 0


def parse_slt(text: str) -> list[Record]:
    records: list[Record] = []
    lines = text.splitlines()
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#") or line.startswith("require "):
            i += 1
            continue
        start = i + 1
        if line.startswith("statement"):
            expect_error = line.split()[1] == "error"
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() and not lines[i].strip().startswith("#"):
                sql_lines.append(lines[i])
                i += 1
            records.append(
                Record("statement", expect_error, "\n".join(sql_lines), line=start)
            )
        elif line.startswith("query"):
            expect_error = line.split()[1:] == ["error"]
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() != "----":
                if lines[i].strip() and not lines[i].strip().startswith("#"):
                    sql_lines.append(lines[i])
                i += 1
            i += 1  # skip ----
            expected = []
            while i < n and lines[i].strip():
                # columns are tab-separated; values may contain spaces
                expected.append(lines[i].strip())
                i += 1
            records.append(
                Record("query", expect_error, "\n".join(sql_lines), expected, start)
            )
        else:
            raise ValueError(f"unparseable line {i + 1}: {line!r}")
    return records


def _dquote_to_backtick(sql: str) -> str:
    """Convert DuckDB double-quoted identifiers to Spark backticks,
    leaving single-quoted string literals untouched (reference quoting
    rules: util.rs:13-34 — ``\"\"`` is an escaped quote)."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                elif sql[j] == "'":
                    break
                else:
                    j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif ch == '"':
            j = i + 1
            ident = []
            while j < n:
                if sql[j] == '"' and j + 1 < n and sql[j + 1] == '"':
                    ident.append('"')
                    j += 2
                elif sql[j] == '"':
                    break
                else:
                    ident.append(sql[j])
                    j += 1
            out.append("`" + "".join(ident).replace("`", "``") + "`")
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def adapt_sql(sql: str, test_dir: str) -> str:
    sql = sql.replace("__TEST_DIR__", test_dir)
    sql = _dquote_to_backtick(sql)
    sql = re.sub(r"\bSHOW\s+ALL\s+TABLES\b", "SHOW TABLES", sql, flags=re.IGNORECASE)
    sql = re.sub(
        r"\bTIMESTAMP\s+WITH\s+TIME\s+ZONE\b",
        "TIMESTAMP_LTZ",
        sql,
        flags=re.IGNORECASE,
    )
    if re.match(r"\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP\w*\s+)?TABLE", sql, re.IGNORECASE):
        sql = translate_ddl_types(sql)
    return sql


def render_value(v, dtype=None) -> str:
    """Reference runner rendering (main.rs:288-323)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (bytes, bytearray)):
        try:
            return bytes(v).decode("utf-8")
        except UnicodeDecodeError:
            return bytes(v).hex()
    if isinstance(v, float):
        if dtype == "float":
            return f"{v:.7g}"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        s = str(v)
        return s
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def _render_df(df) -> list[str]:
    from pyspark.sql import types as T

    dtypes = [
        "float" if isinstance(f.dataType, T.FloatType) else None
        for f in df.schema.fields
    ]
    out = []
    for row in df.collect():
        out.append(
            "\t".join(render_value(v, dt) for v, dt in zip(row, dtypes))
        )
    return out


@dataclass
class SltFailure(AssertionError):
    path: str
    line: int
    sql: str
    message: str

    def __str__(self) -> str:  # pragma: no cover - formatting
        return (
            f"{self.path}:{self.line}: {self.message}\n  SQL: {self.sql.strip()}"
        )


def run_file(engine, path: str, test_dir: str | None = None) -> int:
    """Run one .test file against the engine; raises SltFailure on the
    first mismatch. Returns the number of records executed."""
    test_dir = test_dir or tempfile.mkdtemp(prefix="slt_")
    text = open(path).read()
    records = parse_slt(text)
    for rec in records:
        sql = adapt_sql(rec.sql, test_dir)
        try:
            # the corpus is written in the reference's (DuckDB) dialect
            res = engine.query(sql, dialect="duckdb")
        except EngineError as e:
            if rec.expect_error:
                continue
            raise SltFailure(path, rec.line, rec.sql, f"unexpected error: {e}") from e
        if rec.expect_error:
            # `query error` on a missing table raises at analysis; reaching
            # here means analysis passed unexpectedly — unless collect fails.
            if rec.kind == "query":
                try:
                    res.collect()
                except Exception:
                    continue
            raise SltFailure(path, rec.line, rec.sql, "expected an error, got success")
        if rec.kind != "query":
            continue
        df = res.df
        if df is None:
            if rec.expected:
                raise SltFailure(path, rec.line, rec.sql, "query returned no result set")
            continue
        # SHOW TABLES compatibility: reference expects bare names
        if re.search(r"\bSHOW\s+TABLES\b", sql, re.IGNORECASE) and "tableName" in df.columns:
            df = df.filter("isTemporary = false").select("tableName")
        actual = _render_df(df)
        expected = rec.expected
        ordered = re.search(r"\bORDER\s+BY\b", sql, re.IGNORECASE) is not None
        a, e = (actual, expected) if ordered else (sorted(actual), sorted(expected))
        if a != e:
            raise SltFailure(
                path,
                rec.line,
                rec.sql,
                f"rows mismatch\n  expected: {e}\n  actual:   {a}",
            )
    return len(records)


def run_dir(engine, directory: str) -> dict[str, int]:
    results = {}
    for name in sorted(os.listdir(directory)):
        if name.endswith(".test"):
            results[name] = run_file(engine, os.path.join(directory, name))
    return results
