"""Materialized views: persisted query results with durable definitions
and COW refresh.

Beyond-reference extension (DuckDB has no materialized views): a 100 TB
training pipeline keeps rollups — per-domain token counts, per-day
dedup stats, quality histograms — that are queried constantly and
recomputed on a cadence. This module persists them as ordinary parquet
tables plus a JSON *definition sidecar* stored beside the data (same
durable-metadata discipline as ``versions.py`` manifests), so the
defining SQL survives engine restarts and lives with the data it
defines.

SQL surface (engine.py routes these):

- ``CREATE MATERIALIZED VIEW mv AS <query>`` — materialize + register.
- ``REFRESH MATERIALIZED VIEW mv`` — recompute; the publish rides the
  COW overwrite path (staging + rename), so readers never see a
  half-refreshed view and the pre-refresh contents stay time-travelable
  (versions.py records a snapshot per refresh).
- ``REFRESH MATERIALIZED VIEW mv WHERE <pred>`` — partial refresh:
  recompute only the rows matching ``pred`` (pushed into the defining
  query) and overwrite just those rows; with a partitioned view this is
  the dynamic-partition overwrite, i.e. a day's rollup refresh touches
  one partition. The predicate must reference output columns of the
  view.
- ``DROP MATERIALIZED VIEW mv`` — drop table + sidecar.

Scale notes: refresh cost equals the defining query (Catalyst optimizes
it like any other); partial refresh bounds the rewrite to the matched
partitions. The sidecar is one tiny JSON — never a data copy.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from swanlake_spark.errors import InvalidArgument, NotFound


def _sidecar_path(spark: SparkSession, table: str) -> str | None:
    from swanlake_spark.operators.dml import _table_location

    loc = _table_location(spark, table)
    if loc is None:
        return None
    return loc.rstrip("/") + "/_swl_matview.json"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def definition(spark: SparkSession, name: str) -> str | None:
    """The defining SQL, or None if ``name`` is not a materialized
    view."""
    path = _sidecar_path(spark, name)
    if path is None:
        return None
    jvm, fs, p = _fs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))["query"]


def _write_sidecar(spark: SparkSession, name: str, query: str) -> None:
    path = _sidecar_path(spark, name)
    jvm, fs, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps({"query": query}).encode("utf-8")))
    finally:
        out.close()


def create(
    spark: SparkSession,
    name: str,
    query: str,
    location: str | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """CREATE MATERIALIZED VIEW: run the query, persist as a parquet
    table (optionally partitioned — the prerequisite for
    partition-scoped partial refresh), write the definition sidecar."""
    if spark.catalog.tableExists(name):
        raise InvalidArgument(f"table or view {name} already exists")
    df = spark.sql(query)  # analysis errors surface before any DDL
    writer = df.write.format("parquet").mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if location:
        writer = writer.option("path", location)
    writer.saveAsTable(name)
    _write_sidecar(spark, name, query)
    from swanlake_spark import versions

    versions.record_version(spark, name, "matview_create")
    return spark.table(name).count()


def _pred_columns(spark: SparkSession, name: str, where: str) -> set | None:
    """Lower-cased column names the predicate references, resolved
    against the view's schema via Catalyst (exact — identifiers inside
    strings or function names never count). None when analysis fails;
    callers treat that conservatively."""
    from pyspark.sql import functions as F

    try:
        jplan = (
            spark.table(name)
            .filter(F.expr(where))
            ._jdf.queryExecution()
            .analyzed()
        )
        it = jplan.references().iterator()
        cols = set()
        while it.hasNext():
            cols.add(it.next().name().lower())
        return cols
    except Exception:
        return None


def _aligned(spark: SparkSession, name: str, df: DataFrame) -> DataFrame:
    """Reorder ``df`` to the table's column order before publishing.
    ``saveAsTable(partitionBy=...)`` moves partition columns to the end
    of the saved schema, so a defining query that does not list them
    last would otherwise positionally misalign through insertInto."""
    return df.select(*[f.name for f in spark.table(name).schema.fields])


def refresh(
    spark: SparkSession, name: str, where: str | None = None
) -> int:
    """REFRESH MATERIALIZED VIEW: recompute the defining query and
    publish through the COW overwrite path. With ``where``, only the
    matching output rows recompute and overwrite (partition-scoped when
    the view is partitioned AND the predicate references partition
    columns exclusively). Returns the number of rows in the refreshed
    region."""
    q = definition(spark, name)
    if q is None:
        raise NotFound(f"{name} is not a materialized view")
    from pyspark.sql import functions as F

    from swanlake_spark import versions
    from swanlake_spark.operators import dml

    if where is None:
        new_df = _aligned(spark, name, spark.sql(q))
        n = new_df.count()
        with dml.table_write_lock(spark, name):
            dml._overwrite(spark, name, new_df, None)
            # A static INSERT OVERWRITE of a partitioned view clears the
            # table root (sidecar included); re-write it so the
            # definition stays durable across every publish shape.
            _write_sidecar(spark, name, q)
            versions.record_version(spark, name, "matview_refresh")
        return n
    # Partial refresh = refresh-UPSERT on the predicate's region: the
    # predicate applies to the VIEW's output columns; the matching rows
    # recompute from source and replace the view's current matching
    # region. The dynamic-partition overwrite (a day's rollup refresh
    # rewrites one partition) applies ONLY when the predicate references
    # partition columns exclusively — a narrower predicate (e.g.
    # ``day='d2' AND domain='x'`` on a day-partitioned view) would
    # replace all of d2 with just the domain='x' rows, silently dropping
    # the rest of the partition. Any other predicate rebuilds as
    # keep(NOT pred) ∪ recomputed, published through staging.
    new_df = _aligned(
        spark, name, spark.sql(f"SELECT * FROM ({q}) __mv WHERE {where}")
    )
    n = new_df.count()
    part_cols = dml._partition_columns(spark, name)
    pred_cols = _pred_columns(spark, name, where)
    partition_scoped = (
        bool(part_cols)
        and pred_cols is not None
        and pred_cols <= {c.lower() for c in part_cols}
    )
    with dml.table_write_lock(spark, name):
        if partition_scoped:
            affected = new_df.select(*part_cols).distinct()
            dml._retain_partition_files(spark, name, part_cols, affected)
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            try:
                new_df.write.insertInto(name, overwrite=True)
            finally:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
        else:
            keep = spark.table(name).filter(
                ~F.coalesce(F.expr(where), F.lit(False))
            )
            dml._overwrite(spark, name, keep.unionByName(new_df), None)
            _write_sidecar(spark, name, q)  # see full-refresh note
        versions.record_version(spark, name, "matview_refresh_partial")
    return n


def drop(spark: SparkSession, name: str) -> None:
    """DROP MATERIALIZED VIEW: remove sidecar + table + files."""
    if definition(spark, name) is None:
        raise NotFound(f"{name} is not a materialized view")
    from swanlake_spark.operators.dml import _rm_path, _table_location

    loc = _table_location(spark, name)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    if loc:
        _rm_path(spark, loc)
