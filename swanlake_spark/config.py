"""Engine configuration.

Defaults mirror the reference server's config surface
(``/root/reference/swanlake-core/src/config.rs:49-70``): session limits,
idle timeout + janitor interval, maintenance (checkpoint/compaction)
interval — re-expressed for a Spark deployment, plus the Spark-side
tuning knobs (shuffle partitions, AQE, broadcast threshold) that the
reference delegates to DuckDB's ``SET threads``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


@dataclass
class EngineConfig:
    app_name: str = "swanlake-spark"
    master: str | None = None  # default: local[cpus]
    cpus: int = field(default_factory=_default_cpus)

    # Session registry (reference: max_sessions semaphore + idle eviction,
    # session/registry.rs:116-243).
    max_sessions: int = 100
    session_idle_timeout_s: float = 3600.0
    session_janitor_interval_s: float = 300.0

    # Maintenance (reference: DuckLake CHECKPOINT default 24h,
    # maintenance/mod.rs:24).
    compaction_interval_s: float = 24 * 3600.0
    compaction_target_file_bytes: int = 128 * 1024 * 1024

    # Spark tuning. shuffle_partitions sizes the reduce side of wide ops;
    # AQE coalesces it back down at runtime, so a cluster-scale default is
    # safe on local[32] too.
    shuffle_partitions: int | None = None  # default: cpus
    # Static conf, honored only when this Engine builds the session. In
    # local mode the driver JVM hosts all executor threads; the 1g JVM
    # default starves broadcast builds and shuffle buffers long before
    # the machine does (reference analogue: DuckDB uses 80% of RAM).
    driver_memory: str = "8g"
    broadcast_threshold_bytes: int = 64 * 1024 * 1024
    max_partition_bytes: int = 128 * 1024 * 1024
    warehouse_dir: str | None = None
    session_timezone: str = "UTC"
    # ANSI mode matches DuckDB's error-on-overflow semantics
    # (SURVEY.md §7.4 risk #3).
    ansi: bool = True

    def spark_confs(self) -> dict[str, str]:
        parts = self.shuffle_partitions or self.cpus
        confs = {
            "spark.sql.shuffle.partitions": str(parts),
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            # parallelismFirst (default true) coalesces only down to
            # default parallelism (= all cores), so a 2 kB post-filter
            # dimension stage still schedules `cpus` tasks; false makes
            # AQE honor advisoryPartitionSizeInBytes and collapse tiny
            # stages to 1 task — the Spark docs' own recommendation.
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": str(self.broadcast_threshold_bytes),
            "spark.sql.files.maxPartitionBytes": str(self.max_partition_bytes),
            "spark.sql.parquet.filterPushdown": "true",
            "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
            "spark.sql.session.timeZone": self.session_timezone,
            "spark.sql.ansi.enabled": "true" if self.ansi else "false",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark has
            # no native type for; read as long nanoseconds.
            "spark.sql.legacy.parquet.nanosAsLong": "true",
        }
        if self.driver_memory:
            confs["spark.driver.memory"] = self.driver_memory
        if self.warehouse_dir:
            confs["spark.sql.warehouse.dir"] = self.warehouse_dir
        return confs
