"""Identifier quoting for Spark SQL (backticks).

Reference uses ``"``-doubling (``/root/reference/swanlake-core/src/
util.rs:13-34``); Spark's quote character is the backtick, escaped by
doubling. Handles hostile identifiers (embedded quotes, semicolons,
``--``, spaces) per the reference's SQL-injection tests
(``tests/sql/sql_injection_identifiers.test``).
"""

from __future__ import annotations


def quote_identifier(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def quote_qualified_name(*parts: str) -> str:
    """Quote a (catalog.)schema.table path part-by-part. A single argument
    containing dots is treated as a pre-split path only if unquoted-safe;
    otherwise pass parts separately."""
    if len(parts) == 1 and "." in parts[0] and "`" not in parts[0]:
        parts = tuple(parts[0].split("."))
    return ".".join(quote_identifier(p) for p in parts)
