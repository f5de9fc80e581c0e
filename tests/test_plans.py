"""Unit tests for the SQL front door (no Spark needed).

Ports the reference's parser/rewrite/quoting unit coverage
(``sql/parser.rs:406-549``, ``rewrite.rs:68-112``, ``util.rs:36-83``).
"""

import pytest

from swanlake_spark.errors import InvalidArgument
from swanlake_spark.plans import (
    classify,
    insert_info,
    quote_identifier,
    quote_qualified_name,
    split_statements,
    strip_select_locks,
)
from swanlake_spark.plans.parser import count_placeholders


class TestSplit:
    def test_single(self):
        assert split_statements("SELECT 1") == ["SELECT 1"]

    def test_multi(self):
        assert split_statements("SELECT 1; SELECT 2;") == ["SELECT 1", "SELECT 2"]

    def test_semicolon_in_string(self):
        assert split_statements("SELECT 'a;b'; SELECT 2") == ["SELECT 'a;b'", "SELECT 2"]

    def test_semicolon_in_quoted_ident(self):
        assert split_statements('SELECT "c;1" FROM t') == ['SELECT "c;1" FROM t']

    def test_comments(self):
        assert split_statements("SELECT 1 -- trailing; not a split\n; SELECT 2") == [
            "SELECT 1 -- trailing; not a split",
            "SELECT 2",
        ]
        assert split_statements("SELECT /* ; */ 1") == ["SELECT /* ; */ 1"]

    def test_null_bytes_rejected(self):
        # reference rejects NULL bytes (connection.rs:245-252)
        with pytest.raises(InvalidArgument):
            split_statements("SELECT 1\x00")


class TestClassify:
    @pytest.mark.parametrize(
        "sql,is_query",
        [
            ("SELECT 1", True),
            ("  select 1", True),
            ("WITH t AS (SELECT 1) SELECT * FROM t", True),
            ("VALUES (1)", True),
            ("SHOW TABLES", True),
            ("EXPLAIN SELECT 1", True),
            ("DESCRIBE t", True),
            ("INSERT INTO t VALUES (1)", False),
            ("CREATE TABLE t (a INT)", False),
            ("UPDATE t SET a = 1", False),
            ("DROP TABLE t", False),
        ],
    )
    def test_is_query(self, sql, is_query):
        assert classify(sql).is_query is is_query

    def test_multi_statement_not_query(self):
        p = classify("SELECT 1; SELECT 2")
        assert not p.is_query  # single-statement rule
        assert p.contains_query
        assert p.statement_count == 2

    def test_script_with_commands(self):
        p = classify("CREATE TABLE t (a INT); INSERT INTO t VALUES (1); SELECT * FROM t")
        assert p.contains_query and p.statement_count == 3


class TestInsertInfo:
    def test_basic(self):
        info = insert_info("INSERT INTO tbl VALUES (1, 'x')")
        assert info.table == "tbl"
        assert info.columns is None
        assert info.source == "VALUES"
        assert info.values_rows == 1 and info.values_cols == 2

    def test_partial_columns_multirow(self):
        info = insert_info("INSERT INTO t (id, name) VALUES (1,'a'), (2,'b'), (3,'c')")
        assert info.columns == ["id", "name"]
        assert info.values_rows == 3 and info.values_cols == 2

    def test_placeholders(self):
        info = insert_info("INSERT INTO t VALUES (?, ?, ?)")
        assert info.all_placeholders
        assert count_placeholders("INSERT INTO t VALUES (?, ?, ?)") == 3

    def test_insert_select(self):
        info = insert_info("INSERT INTO t SELECT * FROM s")
        assert info.source == "SELECT"

    def test_quoted_table(self):
        info = insert_info('INSERT INTO "weird table" VALUES (1)')
        assert info.table == '"weird table"'

    def test_not_insert(self):
        assert insert_info("SELECT 1") is None

    def test_placeholder_not_in_string(self):
        assert count_placeholders("SELECT '?' FROM t WHERE a = ?") == 1


class TestLockStrip:
    def test_for_update(self):
        r = strip_select_locks("SELECT * FROM t FOR UPDATE")
        assert r.stripped and "FOR UPDATE" not in r.sql

    def test_for_share_skip_locked(self):
        r = strip_select_locks("SELECT * FROM t FOR SHARE SKIP LOCKED")
        assert r.stripped and "FOR" not in r.sql

    def test_no_lock(self):
        r = strip_select_locks("SELECT * FROM t")
        assert not r.stripped and r.sql == "SELECT * FROM t"

    def test_lock_text_in_literal_untouched(self):
        r = strip_select_locks("SELECT 'FOR UPDATE' AS s FROM t")
        assert not r.stripped

    def test_nowait(self):
        r = strip_select_locks("SELECT * FROM t FOR NO KEY UPDATE NOWAIT")
        assert r.stripped and "NOWAIT" not in r.sql


class TestQuoting:
    def test_simple(self):
        assert quote_identifier("tbl") == "`tbl`"

    def test_backtick_doubling(self):
        assert quote_identifier("we`ird") == "`we``ird`"

    def test_hostile(self):
        # reference sql_injection_identifiers.test shapes
        assert quote_identifier('test"injection') == '`test"injection`'
        assert quote_identifier("col;drop") == "`col;drop`"
        assert quote_identifier("col -- comment") == "`col -- comment`"

    def test_qualified(self):
        assert quote_qualified_name("db", "tbl") == "`db`.`tbl`"
        assert quote_qualified_name("db.tbl") == "`db`.`tbl`"


class TestLockStripLiteralSafety:
    def test_literal_whitespace_preserved(self):
        from swanlake_spark.plans import strip_select_locks

        r = strip_select_locks("SELECT 'a  b' AS s FROM t FOR UPDATE")
        assert r.stripped
        assert "'a  b'" in r.sql
        assert r.sql == "SELECT 'a  b' AS s FROM t"

    def test_multiple_clauses_and_tail(self):
        from swanlake_spark.plans import strip_select_locks

        r = strip_select_locks("SELECT x,   y FROM t FOR SHARE NOWAIT LIMIT 3")
        assert r.stripped
        # interior whitespace untouched; clause spliced with single space
        assert r.sql == "SELECT x,   y FROM t LIMIT 3"


class TestBindParameterScannerAgreement:
    def test_placeholder_in_comment_not_bound(self):
        from swanlake_spark.session import bind_parameters

        sql = "SELECT ? AS a -- is this a param? no\n, ? AS b"
        out = bind_parameters(sql, [1, 2])
        assert "1 AS a" in out and "2 AS b" in out
        assert "param? no" in out  # comment text untouched

    def test_placeholder_in_quoted_identifier_not_bound(self):
        from swanlake_spark.session import bind_parameters

        sql = 'SELECT `what?` , ? AS v FROM t'
        out = bind_parameters(sql, [7])
        assert "`what?`" in out and "7 AS v" in out
