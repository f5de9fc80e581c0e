"""Out-of-process wire endpoint: Arrow-over-HTTP SQL server + client
(the Spark-side analogue of the reference's Flight SQL transport,
swanlake-server/src/main.rs:115-122)."""

import pytest

from swanlake_spark.errors import EngineError
from swanlake_spark.wire import WireClient, start_wire_server


@pytest.fixture(scope="module")
def wire(engine, sf_dir):
    engine.attach_warehouse(sf_dir)
    server, port = start_wire_server(engine)
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


class TestWire:
    def test_healthcheck(self, wire):
        assert WireClient(wire).healthcheck()

    def test_query_returns_arrow(self, wire):
        tbl = WireClient(wire).query("SELECT count(*) AS c FROM nation")
        assert tbl.num_rows == 1
        assert tbl.column("c")[0].as_py() == 25

    def test_parameterized_query(self, wire):
        tbl = WireClient(wire).query(
            "SELECT n_name FROM nation WHERE n_nationkey = ? ORDER BY n_name",
            params=[3],
        )
        assert tbl.num_rows == 1

    def test_session_state_persists(self, wire):
        c = WireClient(wire)
        c.query("CREATE OR REPLACE TEMP VIEW wire_v AS SELECT 41 + 1 AS v")
        tbl = c.query("SELECT v FROM wire_v")
        assert tbl.column("v")[0].as_py() == 42
        # a DIFFERENT session must not see this temp view
        other = WireClient(wire)
        with pytest.raises(EngineError):
            other.query("SELECT v FROM wire_v")

    def test_update_affected_rows(self, wire):
        import tempfile
        import uuid

        c = WireClient(wire)
        t = f"wt_{uuid.uuid4().hex[:8]}"
        loc = tempfile.mkdtemp(prefix="swl_wire_")
        c.query(f"CREATE TABLE {t} (id INT, v STRING) USING parquet LOCATION '{loc}'")
        c.query(f"INSERT INTO {t} VALUES (1, 'a'), (2, 'b')")
        assert c.update(f"UPDATE {t} SET v = 'z' WHERE id = 1") == 1
        tbl = c.query(f"SELECT v FROM {t} ORDER BY id")
        assert tbl.column("v").to_pylist() == ["z", "b"]

    def test_error_propagates_with_message(self, wire):
        with pytest.raises(EngineError, match="snarkle_table"):
            WireClient(wire).query("SELECT * FROM snarkle_table")

    def test_session_close(self, wire):
        c = WireClient(wire)
        c.query("SELECT 1 AS x")
        c.close()  # no error; registry entry dropped


class TestWireConcurrency:
    def test_parallel_wire_clients(self, wire):
        import concurrent.futures

        def worker(i):
            tbl = WireClient(wire).query(f"SELECT {i} AS x")
            return tbl.column("x")[0].as_py()

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            assert sorted(ex.map(worker, range(12))) == list(range(12))


class TestWireIngest:
    def test_bulk_arrow_ingest(self, wire, engine):
        import tempfile
        import uuid

        import pyarrow as pa

        t = f"wi_{uuid.uuid4().hex[:8]}"
        loc = tempfile.mkdtemp(prefix="swl_wi_")
        engine.execute(f"CREATE TABLE {t} (id BIGINT, v DOUBLE) USING parquet LOCATION '{loc}'")
        c = WireClient(wire)
        n = c.ingest(t, pa.table({"id": [1, 2, 3], "v": [0.5, 1.5, 2.5]}))
        assert n == 3
        tbl = c.query(f"SELECT id, v FROM {t} ORDER BY id")
        assert tbl.column("id").to_pylist() == [1, 2, 3]

    def test_ingest_partial_columns(self, wire, engine):
        import tempfile
        import uuid

        import pyarrow as pa

        t = f"wi_{uuid.uuid4().hex[:8]}"
        loc = tempfile.mkdtemp(prefix="swl_wi_")
        engine.execute(f"CREATE TABLE {t} (id BIGINT, name STRING, age INT) USING parquet LOCATION '{loc}'")
        c = WireClient(wire)
        n = c.ingest(t, pa.table({"id": [7], "name": ["x"]}), columns=["id", "name"])
        assert n == 1
        row = c.query(f"SELECT id, name, age FROM {t}").to_pylist()[0]
        assert row == {"id": 7, "name": "x", "age": None}

    def test_ingest_pk_violation_rejected(self, wire, engine):
        import tempfile
        import uuid

        import pyarrow as pa
        import pytest

        from swanlake_spark.errors import EngineError

        t = f"wi_{uuid.uuid4().hex[:8]}"
        loc = tempfile.mkdtemp(prefix="swl_wi_")
        engine.execute(f"CREATE TABLE {t} (id BIGINT PRIMARY KEY, v DOUBLE) USING parquet LOCATION '{loc}'")
        c = WireClient(wire)
        assert c.ingest(t, pa.table({"id": [1], "v": [0.1]})) == 1
        with pytest.raises(EngineError, match="PRIMARY KEY"):
            c.ingest(t, pa.table({"id": [1], "v": [0.2]}))

    def test_ingest_missing_table_param(self, wire):
        import pyarrow as pa
        import pytest

        from swanlake_spark.errors import EngineError

        with pytest.raises(EngineError, match="table"):
            WireClient(wire).ingest("", pa.table({"id": [1]}))
