"""Client API: the embedded analogue of the reference's Rust client.

Mirrors ``swanlake-client`` (``/root/reference/swanlake-client/src/
client.rs:109-172`` — connect/query/execute/update/query_with_param/
update_with_record_batch; ``pool.rs:20-100`` — sync pool with min-idle
warmup, TTL eviction, healthcheck-on-error and acquire timeout). The
transport is in-process: a "connection" is a :class:`~swanlake_spark.
session.Session` (its own ``spark.newSession()`` fork), which is exactly
what a Flight SQL connection buys in the reference — isolated per-client
state over a shared engine.
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from dataclasses import dataclass, field

from swanlake_spark.errors import EngineError, InvalidArgument
from swanlake_spark.plans.parser import insert_info
from swanlake_spark.session import Session


@dataclass
class UpdateResult:
    """Reference ``UpdateResult`` (client.rs:100-108)."""

    rows_affected: int | None


def _param_sets_from_batch(params) -> list[list]:
    """Arrow RecordBatch/Table (or plain list of rows / single row) →
    row-oriented parameter sets (reference ``collect_parameter_sets``,
    service/convert.rs:59-80)."""
    try:
        import pyarrow as pa

        if isinstance(params, (pa.RecordBatch, pa.Table)):
            cols = [c.to_pylist() for c in params.columns]
            return [list(row) for row in zip(*cols)] if cols else []
    except ImportError:  # pragma: no cover
        pass
    if params and isinstance(params[0], (list, tuple)):
        return [list(r) for r in params]
    return [list(params)]


class Client:
    """One logical connection to the engine (reference FlightSQLClient)."""

    def __init__(self, session: Session) -> None:
        self._session = session

    @classmethod
    def connect(cls, engine, session_id: str | None = None) -> "Client":
        """Open a connection and verify it with a healthcheck query
        (reference ``connect`` runs ``SELECT 1``, client.rs:122-128)."""
        sess = Session(session_id or f"client-{uuid.uuid4().hex[:12]}", engine)
        client = cls(sess)
        client.query("SELECT 1").collect()
        return client

    @property
    def session(self) -> Session:
        """The underlying session — advanced operations (reference
        ``connection()``, client.rs:168-171)."""
        return self._session

    def query(self, sql: str):
        return self._session.query(sql)

    def execute(self, sql: str):
        """Always routed through the query path — callers unsure whether
        a statement returns rows can use this (client.rs:138-142)."""
        return self.query(sql)

    def update(self, sql: str) -> UpdateResult:
        n = self._session.execute_update(sql)
        return UpdateResult(rows_affected=None if n < 0 else n)

    def query_with_param(self, sql: str, params) -> "object":
        """Execute a parameterized query; ``params`` is one parameter
        set (list) or a one-row Arrow batch (client.rs:150-156)."""
        sets = _param_sets_from_batch(params)
        if len(sets) != 1:
            raise InvalidArgument(
                f"query_with_param expects exactly one parameter set, got {len(sets)}"
            )
        return self._session.query(sql, params=sets[0])

    def update_with_record_batch(self, sql: str, batch) -> UpdateResult:
        """Bulk path (client.rs:158-166 → prepared.rs:394-553): INSERT
        with an Arrow batch goes through the appender (align + append);
        any other statement runs once per parameter row, summing
        affected counts (``execute_statement_batches``,
        execute.rs:16-32)."""
        import pyarrow as pa

        info = insert_info(sql)
        if (
            info is not None
            and isinstance(batch, (pa.RecordBatch, pa.Table))
            and (info.source != "VALUES" or info.all_placeholders)
        ):
            from swanlake_spark.operators.ingest import insert_arrow

            n = insert_arrow(
                self._session.spark, info.table, batch, info.columns
            )
            return UpdateResult(rows_affected=n)
        total = 0
        for param_set in _param_sets_from_batch(batch):
            n = self._session.execute_update(sql, params=param_set)
            total += max(n, 0)
        return UpdateResult(rows_affected=total)

    # -- transactions (reference SessionHandle, pool.rs:281-327) ----------

    def begin_transaction(self) -> int:
        return self._session.begin_transaction()

    def commit(self) -> None:
        self._session.commit_transaction()

    def rollback(self) -> None:
        self._session.rollback_transaction()

    def close(self) -> None:
        """Drop per-connection state (prepared handles). The Spark
        session fork itself is GC'd with this object."""
        for h in list(self._session._handles):
            self._session.close_prepared_statement(h)


def _default_max_size() -> int:
    scaled = (os.cpu_count() or 1) * 2
    return max(4, min(16, scaled))


@dataclass
class PoolConfig:
    """Reference ``PoolConfig`` defaults (pool.rs:49-66): min_idle 1,
    max_size clamp(cpus*2, 4..16), acquire timeout 30 s, idle TTL 300 s,
    healthcheck ``SELECT 1``, retry-on-failure on."""

    min_idle: int = 1
    max_size: int = field(default_factory=_default_max_size)
    acquire_timeout_s: float = 30.0
    idle_ttl_s: float = 300.0
    healthcheck_sql: str = "SELECT 1"
    retry_on_failure: bool = True

    def validate(self) -> None:
        if self.max_size <= 0:
            raise InvalidArgument("PoolConfig.max_size must be greater than 0")
        if self.min_idle > self.max_size:
            raise InvalidArgument(
                f"PoolConfig.min_idle ({self.min_idle}) exceeds max_size ({self.max_size})"
            )


class PooledClient:
    """Context manager returned by :meth:`ClientPool.acquire`; returns
    the connection to the pool on exit (healthchecked if it errored)."""

    def __init__(self, pool: "ClientPool", client: Client) -> None:
        self._pool = pool
        self.client = client
        self._had_error = False
        #: after exit-with-error: did the connection still pass the
        #: healthcheck? (True → the failure was an execution error, not a
        #: connection failure)
        self.connection_ok = True

    def __enter__(self) -> Client:
        return self.client

    def __exit__(self, exc_type, *exc) -> None:
        self._had_error = exc_type is not None
        self.connection_ok = self._pool._release(self.client, self._had_error)


class ClientPool:
    """Sync connection pool (reference FlightSQLPool, pool.rs:360-420)."""

    def __init__(self, engine, config: PoolConfig | None = None) -> None:
        self.config = config or PoolConfig()
        self.config.validate()
        self._engine = engine
        self._lock = threading.Condition()
        self._idle: list[tuple[Client, float]] = []  # (client, idle-since)
        self._total = 0
        for _ in range(self.config.min_idle):  # warmup (pool.rs:23-41)
            self._total += 1
            self._idle.append((Client.connect(self._engine), time.time()))

    def _healthy(self, client: Client) -> bool:
        sql = self.config.healthcheck_sql.strip()
        if not sql:
            return True
        try:
            client.query(sql).collect()
            return True
        except Exception:
            return False

    def _evict_expired(self) -> None:
        now = time.time()
        ttl = self.config.idle_ttl_s
        kept = []
        for client, since in self._idle:
            if now - since > ttl:
                self._total -= 1
            else:
                kept.append((client, since))
        self._idle = kept

    def acquire(self) -> PooledClient:
        deadline = time.time() + self.config.acquire_timeout_s
        create = False
        with self._lock:
            while True:
                self._evict_expired()
                if self._idle:
                    client, _ = self._idle.pop()
                    return PooledClient(self, client)
                if self._total < self.config.max_size:
                    # reserve the slot, but build the connection OUTSIDE
                    # the lock — Client.connect runs a healthcheck query
                    # (~seconds) and must not block releases/acquires
                    self._total += 1
                    create = True
                    break
                remaining = deadline - time.time()
                if remaining <= 0 or not self._lock.wait(timeout=remaining):
                    raise EngineError(
                        f"pool acquire timed out after {self.config.acquire_timeout_s}s "
                        f"({self._total} connections in use)"
                    )
        if create:
            try:
                client = Client.connect(self._engine)
            except Exception:
                with self._lock:
                    self._total -= 1
                    self._lock.notify()
                raise
            return PooledClient(self, client)

    def _release(self, client: Client, had_error: bool) -> bool:
        """Return the connection to the pool; returns False if it failed
        the healthcheck and was dropped (connection-class failure)."""
        healthy = True
        if had_error:
            healthy = self._healthy(client)  # healthcheck outside the lock
        with self._lock:
            if not healthy:
                self._total -= 1  # drop broken connection (pool.rs:102-113)
            else:
                self._idle.append((client, time.time()))
            self._lock.notify()
        return healthy

    # -- pooled conveniences (pool.rs retry_on_failure) --------------------
    # Retry ONLY on connection-class failures (the connection no longer
    # answers the healthcheck). An execution error on a healthy
    # connection is the statement's fault — re-running it could double-
    # apply a non-idempotent write, so it propagates.

    def query(self, sql: str):
        pooled = self.acquire()
        try:
            with pooled as c:
                return c.query(sql)
        except EngineError:
            if not self.config.retry_on_failure or pooled.connection_ok:
                raise
            with self.acquire() as c:
                return c.query(sql)

    def update(self, sql: str) -> UpdateResult:
        pooled = self.acquire()
        try:
            with pooled as c:
                return c.update(sql)
        except EngineError:
            if not self.config.retry_on_failure or pooled.connection_ok:
                raise
            with self.acquire() as c:
                return c.update(sql)

    @property
    def stats(self) -> dict:
        with self._lock:
            return {"total": self._total, "idle": len(self._idle)}
