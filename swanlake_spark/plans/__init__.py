"""SQL front door: statement splitting, classification, rewrites, quoting.

The reference does this with the ``sqlparser`` crate
(``/root/reference/swanlake-core/src/sql/parser.rs``); here it is a small
dependency-free tokenizer — Catalyst does the real parsing, this layer
only routes statements (query vs command, multi-statement scripts,
INSERT fast path) before handing SQL to ``spark.sql``.
"""

from swanlake_spark.plans.parser import (
    ParsedStatement,
    classify,
    insert_info,
    split_statements,
)
from swanlake_spark.plans.quoting import quote_identifier, quote_qualified_name
from swanlake_spark.plans.rewrite import strip_select_locks

__all__ = [
    "ParsedStatement",
    "classify",
    "insert_info",
    "split_statements",
    "quote_identifier",
    "quote_qualified_name",
    "strip_select_locks",
]
