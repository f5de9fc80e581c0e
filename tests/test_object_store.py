"""Object-store round trip against a REAL S3 API (in-process moto
server): COPY TO 's3://...' exports a table, COPY FROM imports it
back, and the pyarrow helpers behave under the standard AWS env
contract. This closes the testable half of the carried object-store
item — executor-side s3a:// I/O still needs the hadoop-aws jars
(config.py ships the wiring) and stays documented as env-blocked."""

import os

import pytest

moto = pytest.importorskip("moto")

_PORT = 5391


@pytest.fixture(scope="module")
def s3_env():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(ip_address="127.0.0.1", port=_PORT)
    server.start()
    saved = {
        k: os.environ.get(k)
        for k in (
            "AWS_ENDPOINT_URL",
            "AWS_ACCESS_KEY_ID",
            "AWS_SECRET_ACCESS_KEY",
            "AWS_DEFAULT_REGION",
        )
    }
    os.environ["AWS_ENDPOINT_URL"] = f"http://127.0.0.1:{_PORT}"
    os.environ["AWS_ACCESS_KEY_ID"] = "testing"
    os.environ["AWS_SECRET_ACCESS_KEY"] = "testing"
    os.environ["AWS_DEFAULT_REGION"] = "us-east-1"
    import boto3

    boto3.client(
        "s3", endpoint_url=os.environ["AWS_ENDPOINT_URL"]
    ).create_bucket(Bucket="swl-test")
    yield
    server.stop()
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def test_helpers_roundtrip(spark, s3_env):
    from swanlake_spark.sources import object_store

    df = spark.range(100).selectExpr(
        "id", "CAST(id * 1.5 AS DOUBLE) AS v", "concat('s', id) AS s"
    )
    n = object_store.write_parquet(df, "s3://swl-test/helpers/t.parquet")
    assert n == 100
    back = object_store.read_parquet(
        spark, "s3://swl-test/helpers/t.parquet"
    )
    assert sorted(back.collect()) == sorted(df.collect())


def test_copy_to_from_s3(spark, engine, s3_env, tmp_path):
    engine.execute(
        f"CREATE TABLE os_src (id BIGINT, v DOUBLE, s STRING) "
        f"USING parquet LOCATION '{tmp_path}/os_src'"
    )
    engine.execute(
        "INSERT INTO os_src SELECT id, id * 2.0, concat('x', id) "
        "FROM RANGE(500) t(id)"
    )
    try:
        n = engine.execute_update(
            "COPY os_src TO 's3://swl-test/exports/os_src.parquet'"
        )
        assert n == 500
        engine.execute(
            f"CREATE TABLE os_dst (id BIGINT, v DOUBLE, s STRING) "
            f"USING parquet LOCATION '{tmp_path}/os_dst'"
        )
        n2 = engine.execute_update(
            "COPY os_dst FROM 's3://swl-test/exports/os_src.parquet'"
        )
        assert n2 == 500
        a = engine.query(
            "SELECT * FROM os_src ORDER BY id"
        ).df.collect()
        b = engine.query(
            "SELECT * FROM os_dst ORDER BY id"
        ).df.collect()
        assert a == b
    finally:
        engine.execute("DROP TABLE IF EXISTS os_src")
        engine.execute("DROP TABLE IF EXISTS os_dst")


def test_copy_query_result_to_s3(spark, engine, s3_env, tmp_path):
    engine.execute(
        f"CREATE TABLE os_q (k STRING, v BIGINT) "
        f"USING parquet LOCATION '{tmp_path}/os_q'"
    )
    engine.execute(
        "INSERT INTO os_q SELECT concat('g', id % 3), id FROM RANGE(60) t(id)"
    )
    try:
        n = engine.execute_update(
            "COPY (SELECT k, sum(v) AS total FROM os_q GROUP BY k) "
            "TO 's3://swl-test/exports/q.parquet'"
        )
        assert n == 3
        from swanlake_spark.sources import object_store

        back = {
            (r.k, r.total)
            for r in object_store.read_parquet(
                spark, "s3://swl-test/exports/q.parquet"
            ).collect()
        }
        assert back == {
            (r.k, r.total)
            for r in engine.query(
                "SELECT k, sum(v) AS total FROM os_q GROUP BY k"
            ).df.collect()
        }
    finally:
        engine.execute("DROP TABLE IF EXISTS os_q")


def test_s3_csv_rejected(engine, s3_env):
    from swanlake_spark.errors import InvalidArgument

    with pytest.raises(InvalidArgument, match="parquet only"):
        engine.execute_update(
            "COPY nothing TO 's3://swl-test/x.csv' (FORMAT csv)"
        )


def test_s3_copy_size_guard(spark, engine, s3_env, tmp_path, monkeypatch):
    """A COPY whose input-size estimate exceeds the cap must fail
    loudly BEFORE any driver collect (the guard is what stands between
    'COPY bigtable TO s3://' and a driver OOM), and the error must
    point at the s3a:// bulk path."""
    from swanlake_spark.errors import InvalidArgument

    loc = str(tmp_path / "os_big")
    engine.execute(
        f"CREATE TABLE os_big USING parquet LOCATION '{loc}' AS "
        "SELECT id, repeat('x', 100) AS pad FROM range(20000)"
    )
    try:
        monkeypatch.setenv("SWL_S3_COPY_MAX_BYTES", "4096")
        with pytest.raises(InvalidArgument, match="s3a://"):
            engine.execute_update(
                "COPY os_big TO 's3://swl-test/exports/too_big.parquet'"
            )
        # raising the cap (or the default) lets the same COPY through
        monkeypatch.setenv("SWL_S3_COPY_MAX_BYTES", str(1 << 30))
        n = engine.execute_update(
            "COPY os_big TO 's3://swl-test/exports/too_big.parquet'"
        )
        assert n == 20000
    finally:
        engine.execute("DROP TABLE IF EXISTS os_big")


def test_s3_copy_guard_disabled_by_zero_cap(spark, s3_env, monkeypatch):
    from swanlake_spark.sources import object_store

    monkeypatch.setenv("SWL_S3_COPY_MAX_BYTES", "0")
    df = spark.range(10).selectExpr("id", "repeat('y', 50) AS pad")
    # guard disabled → even a 'large-looking' estimate passes through
    object_store.check_driver_bound(df, "s3://swl-test/any.parquet")
