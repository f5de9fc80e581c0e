"""Type-bridge unit tests (reference: types.rs:365-435 unit coverage,
mapping decisions in SURVEY.md §1.2 / FIXTURES.md type_test)."""

import pytest
from pyspark.sql import types as T

from swanlake_spark.errors import InvalidArgument
from swanlake_spark.types import duckdb_type_to_spark, translate_ddl_types


@pytest.mark.parametrize(
    "name,expected",
    [
        ("BIGINT", T.LongType()),
        ("int8", T.LongType()),
        ("LONG", T.LongType()),
        ("INTEGER", T.IntegerType()),
        ("SIGNED", T.IntegerType()),
        ("SMALLINT", T.ShortType()),
        ("TINYINT", T.ByteType()),
        ("UBIGINT", T.DecimalType(20, 0)),  # 18446744073709551615 fits
        ("UINTEGER", T.LongType()),
        ("USMALLINT", T.IntegerType()),
        ("UTINYINT", T.ShortType()),
        ("VARCHAR", T.StringType()),
        ("varchar(25)", T.StringType()),  # length ignored like DuckDB
        ("TEXT", T.StringType()),
        ("BOOLEAN", T.BooleanType()),
        ("DOUBLE", T.DoubleType()),
        ("FLOAT", T.FloatType()),
        ("REAL", T.FloatType()),
        ("DATE", T.DateType()),
        ("TIME", T.LongType()),  # micros-since-midnight decision
        ("TIMESTAMP", T.TimestampNTZType()),
        ("DATETIME", T.TimestampNTZType()),
        ("TIMESTAMPTZ", T.TimestampType()),
        ("BLOB", T.BinaryType()),
        ("UUID", T.StringType()),
        ("JSON", T.StringType()),
        ("DECIMAL(10,2)", T.DecimalType(10, 2)),
        ("NUMERIC(5)", T.DecimalType(5, 3)),
        ("DECIMAL", T.DecimalType(18, 3)),
        ("HUGEINT", T.DecimalType(38, 0)),
        ("INTERVAL", T.DayTimeIntervalType()),
        ("BIGINT[]", T.ArrayType(T.LongType())),
        ("INT[][]", T.ArrayType(T.ArrayType(T.IntegerType()))),
        ("FLOAT[]", T.ArrayType(T.FloatType())),
        ("MAP(VARCHAR, INT)", T.MapType(T.StringType(), T.IntegerType())),
    ],
)
def test_mapping(name, expected):
    assert duckdb_type_to_spark(name) == expected


def test_decimal_over_38_rejected():
    # reference allows Decimal256 up to 76 (types.rs:83-84); Spark caps at 38
    with pytest.raises(InvalidArgument):
        duckdb_type_to_spark("NUMERIC(60,5)")


def test_unknown_rejected():
    with pytest.raises(InvalidArgument):
        duckdb_type_to_spark("GEOMETRY")


def test_ddl_translation():
    ddl = "CREATE TABLE t (a UBIGINT, b BLOB, c TIMESTAMP, d UUID, e JSON)"
    out = translate_ddl_types(ddl)
    assert "DECIMAL(20,0)" in out
    assert "BINARY" in out
    assert "TIMESTAMP_NTZ" in out
    assert "UUID" not in out
    assert "JSON" not in out


class TestObjectStoreConfig:
    def test_s3a_confs_generated(self):
        from swanlake_spark.config import EngineConfig, ObjectStoreConfig

        cfg = EngineConfig(
            object_store=ObjectStoreConfig(
                endpoint="https://acc.r2.cloudflarestorage.com",
                region="auto",
                access_key="AK",
                secret_key="SK",
            )
        )
        confs = cfg.spark_confs()
        assert confs["spark.hadoop.fs.s3a.endpoint"] == "https://acc.r2.cloudflarestorage.com"
        assert confs["spark.hadoop.fs.s3a.access.key"] == "AK"
        assert confs["spark.hadoop.fs.s3a.path.style.access"] == "true"
        assert confs["spark.hadoop.fs.s3a.committer.name"] == "magic"

    def test_credential_chain_default(self):
        from swanlake_spark.config import EngineConfig, ObjectStoreConfig

        confs = EngineConfig(object_store=ObjectStoreConfig()).spark_confs()
        # no static keys → default provider chain (env vars / IAM role)
        assert "spark.hadoop.fs.s3a.access.key" not in confs
        assert confs["spark.hadoop.fs.s3a.fast.upload"] == "true"
