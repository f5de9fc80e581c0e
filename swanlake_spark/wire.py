"""Out-of-process SQL access: Arrow-over-HTTP wire endpoint + client.

The reference serves remote clients over Arrow Flight SQL
(``/root/reference/swanlake-server/src/main.rs:115-122``,
``swanlake-client/src/client.rs:109-172``). gRPC/Flight isn't available
in this environment, so the Spark-idiomatic equivalent keeps Flight's
essential property — **Arrow IPC as the data plane** — over plain HTTP
(stdlib server, zero new dependencies):

- ``POST /v1/sql``     body ``{"sql": ..., "params": [...]?,
  "session": id?, "format": "arrow"|"json"}`` → Arrow IPC stream
  (``application/vnd.apache.arrow.stream``) for queries, JSON
  ``{"affected_rows": n}`` for updates.
- ``POST /v1/session/close`` ``{"session": id}`` → drops the session.
- ``GET /healthz`` → ``ok``.

Sessions map onto the engine's :class:`SessionRegistry` (same
max-sessions cap, idle janitor, prepared-statement + transaction state),
so a remote client gets exactly what a Flight SQL connection buys in the
reference: isolated per-client state over a shared engine. The bundled
:class:`WireClient` needs only stdlib + pyarrow.

Scale note: the wire server is a control-plane veneer — result
materialization is ``df.toArrow()`` on the driver, the same
materialize-then-stream shape as the reference's ``QueryResult``
(``connection.rs:302-307``). Big extracts should go through a parquet
COPY to shared storage instead; this endpoint is for interactive and
OLTP-sized results.
"""

from __future__ import annotations

import io
import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from swanlake_spark.errors import EngineError, InvalidArgument


def _arrow_bytes(tbl) -> bytes:
    import pyarrow as pa

    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, tbl.schema) as writer:
        writer.write_table(tbl)
    return sink.getvalue()


def start_wire_server(engine, host: str = "127.0.0.1", port: int = 0):
    """Serve the SQL wire endpoints in a daemon thread. Returns
    ``(server, port)``; call ``server.shutdown()`` to stop."""

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code: int, obj) -> None:
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/healthz":
                self._reply(200, b"ok", "text/plain")
            else:
                self.send_error(404)

        def do_POST(self):  # noqa: N802 (stdlib API)
            n = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(n)
            try:
                if self.path.startswith("/v1/ingest"):
                    self._ingest(body)
                    return
                try:
                    req = json.loads(body or b"{}")
                except (ValueError, json.JSONDecodeError):
                    self._reply_json(400, {"error": "invalid JSON body"})
                    return
                if self.path == "/v1/sql":
                    self._sql(req)
                elif self.path == "/v1/session/close":
                    engine.sessions.remove(str(req.get("session", "")))
                    self._reply_json(200, {"closed": True})
                else:
                    self.send_error(404)
            except InvalidArgument as e:
                self._reply_json(400, {"error": str(e), "kind": "invalid_argument"})
            except EngineError as e:
                self._reply_json(400, {"error": str(e), "kind": "engine_error"})
            except Exception as e:  # don't kill the connection thread
                self._reply_json(500, {"error": str(e), "kind": "internal"})

        def _ingest(self, body: bytes) -> None:
            """Bulk Arrow ingest over the wire — the appender path
            (reference: update_with_record_batch → appender).
            ``POST /v1/ingest?table=<name>`` with an Arrow IPC stream
            body appends through the engine's alignment + PK checks."""
            from urllib.parse import parse_qs, urlparse

            import pyarrow as pa

            from swanlake_spark.operators.ingest import insert_arrow

            q = parse_qs(urlparse(self.path).query)
            table = (q.get("table") or [None])[0]
            if not table:
                raise InvalidArgument("ingest requires ?table=<name>")
            columns = None
            if q.get("columns"):
                columns = [c for c in q["columns"][0].split(",") if c]
            with pa.ipc.open_stream(body) as reader:
                tbl = reader.read_all()
            n = insert_arrow(engine.spark, table, tbl, columns)
            self._reply_json(200, {"rows_appended": n, "table": table})

        def _sql(self, req) -> None:
            sql = req.get("sql")
            if not sql or not isinstance(sql, str):
                raise InvalidArgument("body must include a 'sql' string")
            session_id = str(req.get("session") or f"wire-{uuid.uuid4().hex[:12]}")
            params = req.get("params")
            fmt = req.get("format", "arrow")
            sess = engine.sessions.get_or_create(session_id)
            res = sess.query(sql, params=list(params) if params else None)
            if res.df is None or not res.is_query:
                self._reply_json(
                    200,
                    {
                        "affected_rows": res.affected_rows,
                        "statements_run": res.statements_run,
                        "session": session_id,
                    },
                )
                return
            tbl = res.to_arrow()
            if fmt == "json":
                self._reply_json(
                    200,
                    {
                        "columns": tbl.column_names,
                        "rows": [
                            list(r.values()) for r in tbl.to_pylist()
                        ],
                        "session": session_id,
                    },
                )
            else:
                body = _arrow_bytes(tbl)
                self.send_response(200)
                self.send_header("Content-Type", "application/vnd.apache.arrow.stream")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("X-Swanlake-Session", session_id)
                self.send_header("X-Swanlake-Rows", str(tbl.num_rows))
                self.end_headers()
                self.wfile.write(body)

        def log_message(self, *args):  # keep test output quiet
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(
        target=server.serve_forever, daemon=True, name="wire-server"
    )
    thread.start()
    return server, server.server_address[1]


class WireClient:
    """Remote client for the wire endpoint — the out-of-process analogue
    of the reference's ``FlightSQLClient`` (connect/query/update with a
    persistent session). stdlib + pyarrow only."""

    def __init__(self, base_url: str, session_id: str | None = None) -> None:
        self.base_url = base_url.rstrip("/")
        self.session_id = session_id or f"wire-{uuid.uuid4().hex[:12]}"

    def _post(self, path: str, payload: dict):
        import urllib.request

        req = urllib.request.Request(
            self.base_url + path,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.headers.get_content_type(), resp.read()
        except urllib.error.HTTPError as e:
            detail = e.read()
            try:
                msg = json.loads(detail).get("error", detail.decode())
            except (ValueError, json.JSONDecodeError):
                msg = detail.decode(errors="replace")
            raise EngineError(msg) from None

    def query(self, sql: str, params: list | None = None):
        """Run SQL; returns a pyarrow Table for queries, or a dict
        ``{"affected_rows": n, ...}`` for updates."""
        ctype, body = self._post(
            "/v1/sql",
            {"sql": sql, "params": params, "session": self.session_id},
        )
        if ctype == "application/vnd.apache.arrow.stream":
            import pyarrow as pa

            with pa.ipc.open_stream(body) as reader:
                return reader.read_all()
        return json.loads(body)

    def update(self, sql: str, params: list | None = None) -> int:
        out = self.query(sql, params)
        if isinstance(out, dict):
            return out.get("affected_rows", -1)
        raise InvalidArgument("update() used with a row-returning statement")

    def ingest(self, table: str, data, columns: list[str] | None = None) -> int:
        """Bulk-append an Arrow Table/RecordBatch over the wire (the
        remote appender — reference client's update_with_record_batch).
        Returns the appended row count."""
        import urllib.request

        import pyarrow as pa

        if isinstance(data, pa.RecordBatch):
            data = pa.Table.from_batches([data])
        body = _arrow_bytes(data)
        qs = f"?table={table}"
        if columns:
            qs += "&columns=" + ",".join(columns)
        req = urllib.request.Request(
            self.base_url + "/v1/ingest" + qs,
            data=body,
            headers={"Content-Type": "application/vnd.apache.arrow.stream"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read())["rows_appended"]
        except urllib.error.HTTPError as e:
            detail = e.read()
            try:
                msg = json.loads(detail).get("error", detail.decode())
            except (ValueError, json.JSONDecodeError):
                msg = detail.decode(errors="replace")
            raise EngineError(msg) from None

    def healthcheck(self) -> bool:
        import urllib.request

        try:
            with urllib.request.urlopen(self.base_url + "/healthz") as resp:
                return resp.read() == b"ok"
        except OSError:
            return False

    def close(self) -> None:
        self._post("/v1/session/close", {"session": self.session_id})
