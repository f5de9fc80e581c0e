"""Bulk ingest tests: batch alignment (A7), positional reshape (A8),
Arrow appender (A6). Models the reference's appender scenarios
(``tests/runner/src/scenarios/appender_insert.rs:9-160``) and batch
alignment unit tests (``engine/batch.rs:261-431``)."""

import tempfile
import uuid

import pyarrow as pa
import pytest

from swanlake_spark.errors import InvalidArgument
from swanlake_spark.operators.ingest import (
    align_to_schema,
    insert_arrow,
    reshape_positional_batch,
)


def _mktable(engine, cols="id INT, name STRING, age INT"):
    name = f"i_{uuid.uuid4().hex[:8]}"
    loc = tempfile.mkdtemp(prefix="swl_test_")
    engine.execute(f"CREATE TABLE {name} ({cols}) USING parquet LOCATION '{loc}'")
    return name


class TestAlign:
    def test_reorder_by_name(self, engine, spark):
        t = _mktable(engine)
        df = spark.createDataFrame([("bob", 1)], ["name", "id"])
        aligned = align_to_schema(df, spark.table(t).schema)
        assert aligned.columns == ["id", "name", "age"]
        row = aligned.collect()[0]
        assert (row.id, row.name, row.age) == (1, "bob", None)

    def test_cast_mismatched_types(self, engine, spark):
        t = _mktable(engine)
        df = spark.createDataFrame([("1", "x", "30")], ["id", "name", "age"])
        row = align_to_schema(df, spark.table(t).schema).collect()[0]
        assert (row.id, row.age) == (1, 30)

    def test_extra_columns_ignored(self, engine, spark):
        t = _mktable(engine)
        df = spark.createDataFrame([(1, "a", 5, "junk")], ["id", "name", "age", "extra"])
        aligned = align_to_schema(df, spark.table(t).schema)
        assert aligned.columns == ["id", "name", "age"]

    def test_case_insensitive_match(self, engine, spark):
        t = _mktable(engine)
        df = spark.createDataFrame([(1, "a")], ["ID", "NAME"])
        row = align_to_schema(df, spark.table(t).schema).collect()[0]
        assert (row.id, row.name) == (1, "a")

    def test_insert_column_list_positional(self, engine, spark):
        # batch columns f0,f1 mapped positionally onto (id, name)
        t = _mktable(engine)
        df = spark.createDataFrame([(10, "x")], ["f0", "f1"])
        row = align_to_schema(df, spark.table(t).schema, ["id", "name"]).collect()[0]
        assert (row.id, row.name, row.age) == (10, "x", None)

    def test_arity_mismatch_rejected(self, engine, spark):
        t = _mktable(engine)
        df = spark.createDataFrame([(1, "a", 2)], ["a", "b", "c"])
        with pytest.raises(InvalidArgument):
            align_to_schema(df, spark.table(t).schema, ["id", "name"])


class TestReshape:
    def test_positional_transposed(self):
        # 4 values across 4 columns, 1 row each = 2-column INSERT × 2 rows
        tbl = pa.table({"1": [1], "2": ["a"], "3": [2], "4": ["b"]})
        out = reshape_positional_batch(tbl, columns_per_row=2)
        assert out.num_rows == 2
        assert out.column("1").to_pylist() == [1, 2]
        assert out.column("2").to_pylist() == ["a", "b"]

    def test_named_untouched(self):
        tbl = pa.table({"id": [1, 2], "name": ["a", "b"]})
        assert reshape_positional_batch(tbl, 2) is tbl

    def test_arity_mismatch_untouched(self):
        tbl = pa.table({"1": [1], "2": ["a"], "3": [2]})
        assert reshape_positional_batch(tbl, 2) is tbl


class TestAppender:
    def test_insert_arrow_roundtrip(self, engine, spark):
        t = _mktable(engine)
        batch = pa.table({"id": [1, 2, 3], "name": ["a", "b", "c"], "age": [10, None, 30]})
        n = insert_arrow(spark, t, batch)
        assert n == 3
        rows = engine.query(f"SELECT id, name, age FROM {t} ORDER BY id").collect()
        assert [(r.id, r.name, r.age) for r in rows] == [
            (1, "a", 10),
            (2, "b", None),
            (3, "c", 30),
        ]

    def test_insert_arrow_partial_columns(self, engine, spark):
        t = _mktable(engine)
        batch = pa.table({"id": [1], "name": ["only"]})
        insert_arrow(spark, t, batch, insert_columns=["id", "name"])
        row = engine.query(f"SELECT * FROM {t}").collect()[0]
        assert (row.id, row.name, row.age) == (1, "only", None)

    def test_insert_arrow_record_batches(self, engine, spark):
        t = _mktable(engine)
        b1 = pa.record_batch({"id": [1], "name": ["a"], "age": [1]})
        b2 = pa.record_batch({"id": [2], "name": ["b"], "age": [2]})
        n = insert_arrow(spark, t, [b1, b2])
        assert n == 2
        assert engine.query(f"SELECT count(*) AS c FROM {t}").collect()[0].c == 2

    def test_hostile_column_names(self, engine, spark):
        # Spark's catalog restricts TABLE names to [A-Za-z0-9_] (documented
        # divergence from DuckDB's quoted table names), but hostile COLUMN
        # names work via backtick quoting (reference
        # sql_injection_identifiers.test exercises both).
        name = f"h_{uuid.uuid4().hex[:8]}"
        loc = tempfile.mkdtemp(prefix="swl_test_")
        engine.execute(
            f"CREATE TABLE {name} (`col;drop` INT, `col -- comment` STRING) "
            f"USING parquet LOCATION '{loc}'"
        )
        engine.execute(f"INSERT INTO {name} VALUES (1, 'x')")
        row = engine.query(
            f"SELECT `col;drop` AS a, `col -- comment` AS b FROM {name}"
        ).collect()[0]
        assert (row.a, row.b) == (1, "x")
