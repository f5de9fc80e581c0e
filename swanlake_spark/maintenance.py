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

from swanlake_spark.operators.dml import _WriteLock


class CompactionLock(_WriteLock):
    """O_EXCL lock file: acquire-or-skip (never blocks), like the
    reference's pg advisory lock. Shares _WriteLock's stale-holder
    breaking (PID liveness + mtime guard), so a crashed compactor's
    orphan lock can't silently disable maintenance forever — the next
    caller breaks it and the one after acquires."""


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


def _parquet_parts(spark: SparkSession, location: str) -> list[tuple[str, int]]:
    """(path, size) of the table's data files, listed via the table's
    own Hadoop FileSystem so any scheme (local/HDFS/s3a) works — not a
    driver-local os.listdir. Non-recursive: a partitioned table's
    per-partition files live in subdirectories, which this (flat-table)
    compactor deliberately leaves alone."""
    if not location:
        return []
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(location)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if (
            st.isFile()
            and name.endswith(".parquet")
            and not name.startswith(("_", "."))
        ):
            out.append((st.getPath().toString(), int(st.getLen())))
    return out


def _partition_leaf_dirs(spark: SparkSession, location: str) -> list[str]:
    """Hive-layout leaf partition directories (k=v path segments) under
    a table location, via the table's FileSystem."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(location)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    leaves, stack = [], [root]
    while stack:
        d = stack.pop()
        subdirs = []
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if st.isDirectory() and "=" in name and not name.startswith(("_", ".")):
                subdirs.append(st.getPath())
        if subdirs:
            stack.extend(subdirs)
        elif "=" in d.getName():
            leaves.append(d.toString())
    return leaves


def _partition_predicate(location: str, leaf: str):
    """(human-readable predicate string, Column) for a leaf partition
    dir like .../day=2026-01-01/hour=3."""
    from urllib.parse import unquote

    from pyspark.sql import functions as F

    # Take the trailing k=v segments (the leaf's path may carry a
    # file:/hdfs: scheme the DESCRIBE location string doesn't, so a
    # prefix-length strip is unreliable).
    segs: list[str] = []
    for seg in reversed(leaf.rstrip("/").split("/")):
        if "=" not in seg:
            break
        segs.append(seg)
    segs.reverse()
    cond, texts = None, []
    for seg in segs:
        k, _, v = seg.partition("=")
        v = unquote(v)
        if v == "__HIVE_DEFAULT_PARTITION__":
            c = F.col(k).isNull()
            texts.append(f"{k} IS NULL")
        else:
            c = F.col(k).cast("string") == F.lit(v)
            # SQL-escape the value: a partition value containing a quote
            # (name=O'Brien) must not break — or inject into — the
            # predicate text handed to F.expr.
            texts.append(f"{k} = '{v.replace(chr(39), chr(39) * 2)}'")
        cond = c if cond is None else (cond & c)
    return " AND ".join(texts), cond


def analyze_table(
    spark: SparkSession,
    table: str,
    columns: list[str] | None = None,
) -> None:
    """Refresh catalog statistics so CBO join reordering and runtime
    bloom filters (config.py) see real row counts / NDVs instead of
    size-based guesses — Spark's equivalent of the table stats DuckDB
    maintains automatically. ``columns=None`` computes table-level
    stats only (cheap: count + size); pass join/filter keys for
    column-level NDV + min/max + histogram.

    One full scan per call — at 100 TB run it where the data was just
    read anyway (compact_table/cluster_table do, post-rewrite)."""
    from swanlake_spark.plans.quoting import quote_identifier

    tq = ".".join(quote_identifier(p) for p in table.split("."))
    if columns:
        cols = ", ".join(quote_identifier(c) for c in columns)
        spark.sql(f"ANALYZE TABLE {tq} COMPUTE STATISTICS FOR COLUMNS {cols}")
    else:
        spark.sql(f"ANALYZE TABLE {tq} COMPUTE STATISTICS")


def compact_table(
    spark: SparkSession,
    table: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> dict:
    """Rewrite a table's data files into ~target-sized files if it has
    accumulated more than ``min_files`` small parts. Returns a stats
    dict (files before/after, bytes). Staging lives beside the table on
    its own FileSystem (cluster-safe, same discipline as the COW DML
    path — a driver-local temp dir would be invisible to executors).

    Partitioned tables are compacted PARTITION-GRANULAR: only leaf
    partitions whose file count exceeds the threshold are rewritten
    (dynamic partition overwrite), so at 100 TB a hot day's small files
    compact without touching the other partitions."""
    from swanlake_spark.operators.dml import _partition_columns, _rm_path, staging_dir

    loc = table_location(spark, table)
    if loc and _partition_columns(spark, table):
        return _compact_partitioned(
            spark, table, loc, target_file_bytes, min_files
        )
    parts = _parquet_parts(spark, loc) if loc else []
    total_bytes = sum(size for _, size in parts)
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
    staging = staging_dir(spark, table)
    try:
        df = spark.table(table)
        df.repartition(int(n_files)).write.parquet(staging, mode="overwrite")
        spark.read.parquet(staging).write.insertInto(table, overwrite=True)
    finally:
        _rm_path(spark, staging)
    stats["compacted"] = True
    stats["files_after"] = len(_parquet_parts(spark, loc))
    analyze_table(spark, table)
    from swanlake_spark import versions

    versions.record_version(spark, table, "compact")
    return stats


def _compact_partitioned(
    spark: SparkSession,
    table: str,
    loc: str,
    target_file_bytes: int,
    min_files: int,
) -> dict:
    """Per-partition compaction: rewrite only leaf partitions with more
    than ``min_files`` parquet files, via the COW dynamic-partition
    overwrite path (cluster-safe staging)."""
    from swanlake_spark.operators.dml import _overwrite

    leaves = _partition_leaf_dirs(spark, loc)
    files_before = files_after = 0
    total_bytes = 0
    compacted_any = False
    for leaf in leaves:
        parts = _parquet_parts(spark, leaf)
        nbytes = sum(size for _, size in parts)
        files_before += len(parts)
        total_bytes += nbytes
        n_files = max(1, -(-nbytes // target_file_bytes))  # ceil
        if len(parts) <= min_files or nbytes == 0 or n_files >= len(parts):
            files_after += len(parts)
            continue
        where_text, cond = _partition_predicate(loc, leaf)
        pdf = spark.table(table).filter(cond).repartition(int(n_files))
        _overwrite(spark, table, pdf, where_text)
        compacted_any = True
        files_after += len(_parquet_parts(spark, leaf))
    if compacted_any:
        analyze_table(spark, table)
        from swanlake_spark import versions

        versions.record_version(spark, table, "compact")
    return {
        "table": table,
        "files_before": files_before,
        "bytes": total_bytes,
        "compacted": compacted_any,
        "files_after": files_after,
    }


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


def _zorder_key(df, columns: list[str], bits: int = 12):
    """Z-order (Morton) key over ``columns``: each column is linearly
    normalized to a ``bits``-bit integer using its table-wide min/max
    (one aggregation, collected driver-side — 2×|columns| scalars),
    then the bits are interleaved. Numeric/date/timestamp columns keep
    value locality; string columns rank by their first 8 bytes
    (big-endian), which preserves lexicographic locality.

    Returns ``(key_column, minmax_stats)``."""
    from pyspark.sql import functions as F

    def orderable(c):
        col = F.col(c)
        dt = dict(df.dtypes)[c]
        if dt in ("string",):
            # big-endian first-8-bytes as an unsigned-ish rank; NULL → 0
            h = F.coalesce(
                F.conv(F.substring(F.hex(F.encode(col, "UTF-8")), 1, 15), 16, 10)
                .cast("long"),
                F.lit(0),
            )
            return h
        if dt.startswith("date"):
            return F.coalesce(F.datediff(col, F.lit("1970-01-01")), F.lit(0)).cast(
                "long"
            )
        if dt.startswith("timestamp"):
            return F.coalesce(F.unix_timestamp(col), F.lit(0)).cast("long")
        return F.coalesce(col.cast("double"), F.lit(0.0))

    aggs = []
    for c in columns:
        o = orderable(c)
        aggs += [F.min(o).alias(f"mn_{c}"), F.max(o).alias(f"mx_{c}")]
    row = df.agg(*aggs).collect()[0].asDict()

    scaled = []
    top = (1 << bits) - 1
    for c in columns:
        mn, mx = float(row[f"mn_{c}"] or 0), float(row[f"mx_{c}"] or 0)
        span = (mx - mn) or 1.0
        o = orderable(c).cast("double")
        scaled.append(
            F.least(
                F.lit(top),
                F.greatest(
                    F.lit(0), ((o - F.lit(mn)) / F.lit(span) * top).cast("long")
                ),
            )
        )
    z = F.lit(0).cast("long")
    n = len(columns)
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z, row


def cluster_table(
    spark: SparkSession,
    table: str,
    columns: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    bits: int = 12,
) -> dict:
    """Rewrite an unpartitioned table Z-ORDERED by ``columns`` (the
    Delta/Iceberg OPTIMIZE ZORDER maintenance step): rows are range-
    partitioned and sorted by the interleaved-bit key, so parquet
    row-group and file min/max stats become selective on EVERY
    clustered column at once — filters on any of them prune files and
    row groups instead of scanning the table. The multi-dimensional
    complement to partition pruning: partition on the coarse key (date),
    Z-order within by the point-lookup keys.

    Shuffle shape: one range repartition on the key (sampled bounds) +
    per-file local sort; no driver-side data. Returns stats including
    per-file range-overlap before/after so the clustering effect is
    measurable."""
    from pyspark.sql import functions as F

    from swanlake_spark.errors import InvalidArgument
    from swanlake_spark.operators.dml import (
        _partition_columns,
        _publish_by_move,
        _rm_path,
        staging_dir,
    )

    if _partition_columns(spark, table):
        raise InvalidArgument(
            "cluster_table targets unpartitioned tables; Z-order within "
            "partitions by clustering before the partitioned write"
        )
    loc = table_location(spark, table)
    if loc is None:
        raise InvalidArgument(f"no resolvable location for table {table}")
    parts = _parquet_parts(spark, loc)
    total_bytes = sum(size for _, size in parts)
    stats = {
        "table": table,
        "clustered_by": list(columns),
        "files_before": len(parts),
        "bytes": total_bytes,
        "clustered": False,
    }
    if total_bytes == 0:
        return stats
    df = spark.table(table)
    z, _minmax = _zorder_key(df, columns, bits)
    n_files = max(1, -(-total_bytes // target_file_bytes))  # ceil
    staging = staging_dir(spark, table)
    try:
        out = (
            df.withColumn("_swl_z", z)
            .repartitionByRange(int(n_files), F.col("_swl_z"))
            .sortWithinPartitions("_swl_z")
            .drop("_swl_z")
        )
        out.write.parquet(staging, mode="overwrite")
        if not _publish_by_move(spark, table, staging):
            spark.read.parquet(staging).write.insertInto(table, overwrite=True)
    finally:
        _rm_path(spark, staging)
    stats["clustered"] = True
    stats["files_after"] = len(_parquet_parts(spark, table_location(spark, table)))
    # The rewrite just scanned everything; refresh table + clustered-key
    # column stats while the cost is already paid.
    analyze_table(spark, table, columns=list(columns))
    from swanlake_spark import versions

    versions.record_version(spark, table, "cluster")
    return stats


def vacuum_table(
    spark: SparkSession,
    table: str,
    min_age_s: float = 3600.0,
) -> dict:
    """Reclaim the table's orphaned staging state: `_staging/<uuid>`
    dirs and stale `.writelock` files older than ``min_age_s``.

    Staged dirs normally delete themselves after a successful publish;
    they survive a crashed writer (deliberately — a failed publish's
    staged copy may be the only complete one, see StagingPin.cleanup)
    and must eventually be reclaimed. The age guard keeps in-flight
    publishes safe: nothing younger than ``min_age_s`` is touched.

    Also runs the snapshot retention sweep (:func:`versions.expire`):
    manifests older than ``min_age_s`` (beyond the newest) are dropped
    and retained data files nothing references anymore are reclaimed —
    the Delta-style ``VACUUM t RETAIN n SECONDS`` contract.
    Returns ``{table, staging_dirs_removed, locks_removed, bytes,
    snapshots_expired, snapshot_bytes}``."""
    import time as _time

    from swanlake_spark.operators.dml import _table_location

    loc = _table_location(spark, table)
    stats = {
        "table": table,
        "staging_dirs_removed": 0,
        "locks_removed": 0,
        "bytes": 0,
        "snapshots_expired": 0,
        "snapshot_bytes": 0,
    }
    if loc is None:
        return stats
    base = loc.rstrip("/").rsplit("/", 1)[0] if "/" in loc.rstrip("/") else loc
    staging_root = base.rstrip("/") + "/_staging"
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(staging_root)
    fs = root.getFileSystem(conf)
    if fs.exists(root):
        now_ms = _time.time() * 1000.0
        for st in fs.listStatus(root):
            age_ms = now_ms - st.getModificationTime()
            if age_ms < min_age_s * 1000.0:
                continue
            name = st.getPath().getName()
            if st.isDirectory():
                size = fs.getContentSummary(st.getPath()).getLength()
                fs.delete(st.getPath(), True)
                stats["staging_dirs_removed"] += 1
                stats["bytes"] += int(size)
            elif name.endswith(".writelock"):
                fs.delete(st.getPath(), False)
                stats["locks_removed"] += 1
    # dead-holder locks are debris regardless of age: sweep them with
    # the full liveness machinery (unthrottled — VACUUM is explicit)
    from swanlake_spark.operators.dml import _local_os_path, sweep_stale_locks

    osp = _local_os_path(staging_root)
    if osp is not None:
        stats["locks_removed"] += sweep_stale_locks(osp, throttle_s=0.0)
    from swanlake_spark import versions

    vexp = versions.expire(spark, table, keep_last=1, min_age_s=min_age_s)
    stats["snapshots_expired"] = vexp["manifests_removed"]
    stats["snapshot_bytes"] = vexp["bytes_reclaimed"]
    return stats
