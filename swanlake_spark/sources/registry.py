"""Warehouse table registration.

The reference's storage model is DuckLake: a catalog pointing at
immutable Parquet data files (``SURVEY.md §1.1``). Here a "warehouse"
is a directory of Parquet tables; ``register_tables`` exposes them as
Spark temp views so the SQL front door and the oracle queries can name
them directly — the Spark analogue of ``ATTACH 'ducklake:...'``.

Scale note: registration is pure metadata (lazy scans); nothing is read
until a query runs, and Catalyst pushes filters/column pruning into the
Parquet scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-generated synthetic warehouse (TESTDATA.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one warehouse table. ``events`` needs the nanosecond-timestamp
    workaround (Spark has no TIMESTAMP(NANOS) type): `ts` is read as long
    nanoseconds-since-epoch and a derived ``ts_ntz`` column (microsecond
    TIMESTAMP_NTZ) is appended for time functions; long `ts` ordering is
    identical to timestamp ordering."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts_ntz",
                F_timestamp_ntz_from_nanos("ts"),
            )
        return df
    return spark.read.parquet(path)


def F_timestamp_ntz_from_nanos(colname: str):
    # nanos-since-epoch → TIMESTAMP_NTZ via arithmetic on an NTZ base:
    # timezone-independent (no session-tz dependency).
    from pyspark.sql.functions import expr

    return expr(
        "timestampadd(MICROSECOND, CAST(" + colname + " / 1000 AS BIGINT), "
        "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str] | None = None,
) -> list[str]:
    """Register every warehouse table found in ``sf_dir`` as a temp view.
    Returns the list of registered names."""
    registered = []
    for name in tables or TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
        registered.append(name)
    return registered


def bucket_warehouse(
    spark: SparkSession,
    sf_dir: str,
    bucket_spec: dict[str, tuple[str, int]],
    suffix: str = "_bkt",
) -> list[str]:
    """Co-located join layout: write selected warehouse tables as
    BUCKETED catalog tables (``bucketBy`` + ``sortBy`` on the join key).

    Two tables bucketed on their join keys with the same bucket count
    join with NO exchange — Catalyst reads matching buckets pairwise
    (sorted buckets also skip the sort). This is the 100 TB answer to
    repeated fact⋈fact joins (lineitem⋈orders on orderkey): pay one
    bucketed write at load time, then every subsequent join on that key
    is shuffle-free, where repartition() pays the shuffle per query.

    ``bucket_spec`` maps table name → (bucket column, bucket count);
    tables are registered as ``<name><suffix>`` catalog tables. Bucket
    count is a layout constant — choose it for the TARGET scale
    (buckets ≈ data size / desired file size) since co-location
    requires equal counts on both sides."""
    created = []
    for name, (key, n) in bucket_spec.items():
        tbl = f"{name}{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            read_table(spark, sf_dir, name)
            .repartition(n, key)
            .write.mode("overwrite")
            .bucketBy(n, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
        created.append(tbl)
    return created


def materialize_warehouse(
    spark: SparkSession,
    sf_dir: str,
    dest_dir: str,
    tables: list[str] | None = None,
    target_split_bytes: int = 2 * 1024 * 1024,
) -> list[str]:
    """Ingest the source Parquet into the engine's own storage layout:
    each table rewritten as multiple part-files sized so scans
    parallelize, then registered as the warehouse views.

    This is the analogue of the reference's benchmark *load phase* —
    BenchBase loads TPC-H INTO DuckLake tables before measuring
    (``tests/benchbase/tpch-ddl-ducklake.sql``); queries then run against
    the engine's own files. It matters because the driver's synthetic
    tables are single-file/single-row-group Parquet, which no engine can
    scan in parallel; a real warehouse writes one file per partition.
    Part count = ceil(bytes / target_split_bytes) capped at the cluster
    parallelism — at 100 TB the cap never binds and files land at the
    deployment's block size instead.
    """
    import math

    max_parts = spark.sparkContext.defaultParallelism
    registered = []
    for name in tables or TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        parts = max(1, min(max_parts, math.ceil(os.path.getsize(path) / target_split_bytes)))
        dest = os.path.join(dest_dir, name)
        read_table(spark, sf_dir, name).repartition(parts).write.mode(
            "overwrite"
        ).parquet(dest)
        spark.read.parquet(dest).createOrReplaceTempView(name)
        registered.append(name)
    return registered
