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
import re

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


def _read_sidecar(spark: SparkSession, name: str) -> dict | None:
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
    return json.loads(data.decode("utf-8"))


def definition(spark: SparkSession, name: str) -> str | None:
    """The defining SQL, or None if ``name`` is not a materialized
    view."""
    meta = _read_sidecar(spark, name)
    return meta["query"] if meta else None


def _write_sidecar(
    spark: SparkSession, name: str, query: str, **extra
) -> None:
    path = _sidecar_path(spark, name)
    jvm, fs, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(
            bytearray(
                json.dumps({"query": query, **extra}).encode("utf-8")
            )
        )
    finally:
        out.close()


# -- incremental maintenance --------------------------------------------------
#
# For single-table GROUP BY views over decomposable aggregates, an
# append to the base table can be folded into the view WITHOUT
# recomputing it: aggregate just the appended rows (the files added
# since the view's recorded base snapshot — the version manifests say
# exactly which those are) and merge per-group into the current view
# state. At 100 TB this is the difference between a rollup refresh
# that scans a day's new partition and one that rescans the warehouse.
# Only sound while the base history is append-only; any rewrite
# (UPDATE/DELETE/compaction) removes manifest entries, which the delta
# diff detects, and the refresh demands a full recompute instead of
# silently double-counting.

_MERGEABLE_AGGS = ("count", "sum", "min", "max")

_INC_VIEW_RE = re.compile(
    r"^\s*SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<table>[\w.`\"]+)\s*"
    r"(?:WHERE\s+(?P<pred>.+?)\s*)?GROUP\s+BY\s+(?P<groups>[\w.`\",\s]+?)"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_AGG_ITEM_RE = re.compile(
    r"^\s*(?P<fn>count|sum|min|max)\s*\((?P<arg>.+)\)\s+AS\s+"
    r"(?P<alias>[\w`\"]+)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_IDENT_RE = re.compile(r"^\s*[\w`\".]+\s*$")


def _split_depth0(body: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def parse_incremental(query: str) -> dict | None:
    """Decompose a defining query into the shape incremental refresh
    can maintain: single-table ``SELECT <group cols + mergeable aggs>
    FROM t [WHERE p] GROUP BY <cols>``, aggs in count/sum/min/max,
    every agg aliased, group items bare identifiers. Returns
    ``{base, pred, groups, aggs: [(fn, arg, alias)]}`` or None when the
    query is outside the supported shape (caller falls back loudly to
    full refresh)."""
    m = _INC_VIEW_RE.match(query)
    if not m:
        return None
    groups = [g.strip().strip('`"') for g in m.group("groups").split(",")]
    if not all(_IDENT_RE.match(g) and "(" not in g for g in groups):
        return None
    aggs: list[tuple[str, str, str]] = []
    plain: list[str] = []
    for item in _split_depth0(m.group("items")):
        am = _AGG_ITEM_RE.match(item)
        if am:
            aggs.append(
                (
                    am.group("fn").lower(),
                    am.group("arg").strip(),
                    am.group("alias").strip('`"'),
                )
            )
            continue
        if _IDENT_RE.match(item):
            plain.append(item.strip().strip('`"'))
            continue
        return None  # expression we can't merge (avg, distinct, ...)
    if not aggs:
        return None
    if {p.lower() for p in plain} - {g.lower() for g in groups}:
        return None  # non-grouped bare column (invalid SQL anyway)
    for _, arg, _ in aggs:
        if re.search(r"\bdistinct\b", arg, re.IGNORECASE):
            return None  # count(DISTINCT ...) is not mergeable
    return {
        "base": m.group("table").strip('`"'),
        "pred": (m.group("pred") or "").strip() or None,
        "groups": groups,
        "aggs": aggs,
    }


def _base_stamp(spark: SparkSession, query: str) -> dict:
    """Sidecar fields recording the base snapshot the view's contents
    reflect — only for incrementally-maintainable definitions over a
    version-tracked base."""
    from swanlake_spark import versions

    shape = parse_incremental(query)
    if shape is None:
        return {}
    v = versions.current_version(spark, shape["base"])
    if v == 0:
        return {}  # base not snapshot-tracked: no delta identity
    return {"base_table": shape["base"], "base_version": v}


def refresh_incremental(spark: SparkSession, name: str) -> int:
    """REFRESH MATERIALIZED VIEW ... INCREMENTAL: fold base-table
    APPENDS into the view by aggregating only the files added since
    the recorded base snapshot and merging per group (see module
    section comment). Returns the number of appended base files folded
    in (0 = nothing to do). Raises InvalidArgument — demanding a full
    REFRESH — when the definition isn't mergeable, the base isn't
    snapshot-tracked, or the base history isn't append-only since the
    stamp."""
    from pyspark.sql import functions as F

    from swanlake_spark import versions
    from swanlake_spark.operators import dml

    meta = _read_sidecar(spark, name)
    if meta is None:
        raise NotFound(f"{name} is not a materialized view")
    q = meta["query"]
    shape = parse_incremental(q)
    if shape is None:
        raise InvalidArgument(
            f"{name} is not incrementally maintainable (supported: "
            f"single-table GROUP BY with count/sum/min/max aggregates); "
            f"run REFRESH MATERIALIZED VIEW {name}"
        )
    base, base_v = meta.get("base_table"), meta.get("base_version")
    if base is None or base_v is None:
        raise InvalidArgument(
            f"{name} has no recorded base snapshot (base table was not "
            f"snapshot-tracked at the last refresh); run a full REFRESH"
        )
    cur_v = versions.current_version(spark, base)
    old_names = set(versions.snapshot_file_names(spark, base, base_v))
    cur_names = set(versions.snapshot_file_names(spark, base, cur_v))
    if old_names - cur_names:
        raise InvalidArgument(
            f"base table {base} was rewritten (UPDATE/DELETE/compaction) "
            f"since the last refresh of {name}; incremental maintenance "
            f"is append-only — run a full REFRESH"
        )
    delta_names = sorted(cur_names - old_names)
    if not delta_names:
        return 0
    base_loc = dml._table_location(spark, base).rstrip("/")
    delta = spark.read.option("basePath", base_loc).schema(
        spark.table(base).schema
    ).parquet(*[f"{base_loc}/{n}" for n in delta_names])
    if shape["pred"]:
        delta = delta.filter(F.expr(shape["pred"]))
    agg_exprs = []
    for fn, arg, alias in shape["aggs"]:
        agg_exprs.append(F.expr(f"{fn}({arg})").alias(alias))
    d = delta.groupBy(*shape["groups"]).agg(*agg_exprs)
    o = spark.table(name)
    gl = [g for g in shape["groups"]]
    cond = None
    for g in gl:
        c = o[g].eqNullSafe(d[g])  # NULL group keys are one group
        cond = c if cond is None else cond & c
    merged_cols = [
        F.coalesce(o[g], d[g]).alias(g) for g in gl
    ]
    for fn, _arg, alias in shape["aggs"]:
        oc, dc = o[alias], d[alias]
        if fn == "count":
            e = F.coalesce(oc, F.lit(0)) + F.coalesce(dc, F.lit(0))
        elif fn == "sum":
            e = (
                F.when(oc.isNull(), dc)
                .when(dc.isNull(), oc)
                .otherwise(oc + dc)
            )
        elif fn == "min":
            e = (
                F.when(oc.isNull(), dc)
                .when(dc.isNull(), oc)
                .otherwise(F.least(oc, dc))
            )
        else:  # max
            e = (
                F.when(oc.isNull(), dc)
                .when(dc.isNull(), oc)
                .otherwise(F.greatest(oc, dc))
            )
        merged_cols.append(e.alias(alias))
    merged = _aligned(
        spark, name, o.join(d, cond, "full_outer").select(*merged_cols)
    )
    n = len(delta_names)
    with dml.table_write_lock(spark, name):
        dml._overwrite(spark, name, merged, None)
        _write_sidecar(
            spark, name, q, base_table=base, base_version=cur_v
        )
        versions.record_version(
            spark, name, "matview_refresh_incremental"
        )
    return n


def create(
    spark: SparkSession,
    name: str,
    query: str,
    location: str | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """CREATE MATERIALIZED VIEW: run the query, persist as a parquet
    table (optionally partitioned — the prerequisite for
    partition-scoped partial refresh), write the definition sidecar
    (with the base snapshot stamp when the definition is incrementally
    maintainable)."""
    if spark.catalog.tableExists(name):
        raise InvalidArgument(f"table or view {name} already exists")
    stamp = _base_stamp(spark, query)  # BEFORE the read (no lost appends)
    df = spark.sql(query)  # analysis errors surface before any DDL
    writer = df.write.format("parquet").mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if location:
        writer = writer.option("path", location)
    writer.saveAsTable(name)
    _write_sidecar(spark, name, query, **stamp)
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
        stamp = _base_stamp(spark, q)  # BEFORE the read (no lost appends)
        new_df = _aligned(spark, name, spark.sql(q))
        n = new_df.count()
        with dml.table_write_lock(spark, name):
            dml._overwrite(spark, name, new_df, None)
            # A static INSERT OVERWRITE of a partitioned view clears the
            # table root (sidecar included); re-write it so the
            # definition stays durable across every publish shape.
            _write_sidecar(spark, name, q, **stamp)
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
        # Partial refresh leaves the view reflecting TWO base
        # snapshots (the refreshed region sees newer base data than
        # the rest), so the incremental base stamp is no longer a
        # single consistent point — clear it; a later full REFRESH
        # re-establishes it. Keeping the old stamp would double-count
        # appends inside the refreshed region on the next INCREMENTAL.
        _write_sidecar(spark, name, q)
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
