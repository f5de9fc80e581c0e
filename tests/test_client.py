"""Client API + pool tests.

Models the reference's client pool integration tests
(``swanlake-client/tests/integration_client_pool.rs``) and the client
unit surface (``swanlake-client/src/client.rs:109-172``).
"""

import tempfile
import uuid

import pyarrow as pa
import pytest

from swanlake_spark.client import Client, ClientPool, PoolConfig, UpdateResult
from swanlake_spark.errors import EngineError, InvalidArgument


def _mktable(client, cols="id INT, val STRING"):
    name = f"c_{uuid.uuid4().hex[:8]}"
    loc = tempfile.mkdtemp(prefix="swl_test_")
    client.update(f"CREATE TABLE {name} ({cols}) USING parquet LOCATION '{loc}'")
    return name


class TestClient:
    def test_connect_healthcheck(self, engine):
        c = Client.connect(engine)
        assert c.query("SELECT 41 + 1 AS x").collect()[0].x == 42

    def test_update_returns_result(self, engine):
        c = Client.connect(engine)
        t = _mktable(c)
        res = c.update(f"INSERT INTO {t} VALUES (1, 'a'), (2, 'b')")
        assert isinstance(res, UpdateResult)
        assert c.query(f"SELECT count(*) AS n FROM {t}").collect()[0].n == 2

    def test_query_with_param(self, engine):
        c = Client.connect(engine)
        t = _mktable(c)
        c.update(f"INSERT INTO {t} VALUES (1, 'a'), (2, 'b')")
        rows = c.query_with_param(f"SELECT val FROM {t} WHERE id = ?", [2]).collect()
        assert [r.val for r in rows] == ["b"]
        # Arrow one-row batch binding
        batch = pa.record_batch({"1": pa.array([1])})
        rows = c.query_with_param(f"SELECT val FROM {t} WHERE id = ?", batch).collect()
        assert [r.val for r in rows] == ["a"]
        with pytest.raises(InvalidArgument):
            c.query_with_param(f"SELECT val FROM {t} WHERE id = ?", [[1], [2]])

    def test_update_with_record_batch_insert_fast_path(self, engine):
        c = Client.connect(engine)
        t = _mktable(c)
        batch = pa.table({"id": [10, 11, 12], "val": ["x", "y", "z"]})
        res = c.update_with_record_batch(f"INSERT INTO {t} VALUES (?, ?)", batch)
        assert res.rows_affected == 3
        assert c.query(f"SELECT count(*) AS n FROM {t}").collect()[0].n == 3

    def test_update_with_record_batch_param_loop(self, engine):
        c = Client.connect(engine)
        t = _mktable(c)
        c.update(f"INSERT INTO {t} VALUES (1, 'a'), (2, 'b'), (3, 'c')")
        batch = pa.table({"1": ["A", "B"], "2": [1, 2]})
        res = c.update_with_record_batch(f"UPDATE {t} SET val = ? WHERE id = ?", batch)
        assert res.rows_affected == 2
        vals = {r.id: r.val for r in c.query(f"SELECT id, val FROM {t}").collect()}
        assert vals == {1: "A", 2: "B", 3: "c"}

    def test_transactions(self, engine):
        c = Client.connect(engine)
        t = _mktable(c)
        c.update(f"INSERT INTO {t} VALUES (1, 'keep')")
        c.begin_transaction()
        c.update(f"INSERT INTO {t} VALUES (2, 'tx')")
        c.rollback()
        assert c.query(f"SELECT count(*) AS n FROM {t}").collect()[0].n == 1
        c.begin_transaction()
        c.update(f"INSERT INTO {t} VALUES (3, 'tx2')")
        c.commit()
        assert c.query(f"SELECT count(*) AS n FROM {t}").collect()[0].n == 2

    def test_session_isolation_between_clients(self, engine):
        c1 = Client.connect(engine)
        c2 = Client.connect(engine)
        c1.query("CREATE OR REPLACE TEMP VIEW iso_view AS SELECT 1 AS x")
        assert c1.query("SELECT * FROM iso_view").collect()[0].x == 1
        with pytest.raises(EngineError):
            c2.query("SELECT * FROM iso_view").collect()


class TestPool:
    def test_config_validation(self):
        with pytest.raises(InvalidArgument):
            PoolConfig(max_size=0).validate()
        with pytest.raises(InvalidArgument):
            PoolConfig(min_idle=5, max_size=2).validate()
        PoolConfig().validate()

    def test_warmup_and_reuse(self, engine):
        pool = ClientPool(engine, PoolConfig(min_idle=1, max_size=2))
        assert pool.stats == {"total": 1, "idle": 1}
        with pool.acquire() as c:
            assert c.query("SELECT 1 AS x").collect()[0].x == 1
            assert pool.stats["idle"] == 0
        assert pool.stats == {"total": 1, "idle": 1}  # returned, not dropped

    def test_acquire_timeout(self, engine):
        pool = ClientPool(
            engine, PoolConfig(min_idle=0, max_size=1, acquire_timeout_s=0.2)
        )
        holder = pool.acquire()
        with pytest.raises(EngineError, match="timed out"):
            pool.acquire()
        holder.__exit__(None, None, None)
        with pool.acquire() as c:  # freed connection is reusable
            assert c.query("SELECT 1").collect()

    def test_ttl_eviction(self, engine):
        pool = ClientPool(engine, PoolConfig(min_idle=1, max_size=2, idle_ttl_s=0.0))
        import time

        time.sleep(0.01)
        with pool.acquire() as c:  # expired idle evicted, fresh one made
            assert c.query("SELECT 1").collect()
        assert pool.stats["total"] == 1

    def test_pooled_query_convenience(self, engine):
        pool = ClientPool(engine, PoolConfig(min_idle=0, max_size=2))
        assert pool.query("SELECT 7 AS x").collect()[0].x == 7
        res = pool.update("CREATE OR REPLACE TEMP VIEW pool_v AS SELECT 1 AS x")
        assert isinstance(res, UpdateResult)


class TestPoolRetrySemantics:
    def test_execution_error_not_retried(self, engine):
        """A statement error on a healthy connection must propagate, not
        re-run (double-applying non-idempotent writes)."""
        from swanlake_spark.client import ClientPool, PoolConfig
        from swanlake_spark.errors import EngineError

        import pytest

        pool = ClientPool(engine, PoolConfig(min_idle=1, max_size=2))
        calls = []
        orig_acquire = pool.acquire

        def counting_acquire():
            calls.append(1)
            return orig_acquire()

        pool.acquire = counting_acquire
        with pytest.raises(EngineError):
            pool.query("SELECT * FROM definitely_missing_table_xyz")
        # exactly one acquire — no second attempt on a healthy connection
        assert len(calls) == 1


class TestConcurrentSessions:
    """Reference scenario concurrent_sessions.rs:9-30 — parallel
    connection creation + queries must not race in the registry/pool."""

    def test_parallel_session_creation_and_query(self, engine):
        import concurrent.futures

        from swanlake_spark.client import Client

        def worker(i):
            c = Client.connect(engine)
            assert c.query("SELECT 1 AS x").collect()[0].x == 1
            c.close()
            return i

        with concurrent.futures.ThreadPoolExecutor(10) as ex:
            assert sorted(ex.map(worker, range(10))) == list(range(10))

    def test_pool_under_contention(self, engine):
        import concurrent.futures

        from swanlake_spark.client import ClientPool, PoolConfig

        pool = ClientPool(engine, PoolConfig(min_idle=1, max_size=4))

        def worker(i):
            return pool.query(f"SELECT {i} AS x").collect()[0].x

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            assert sorted(ex.map(worker, range(16))) == list(range(16))
        assert pool.stats["total"] <= 4
