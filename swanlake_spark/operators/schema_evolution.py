"""ALTER TABLE DROP COLUMN / RENAME COLUMN for parquet tables.

DuckDB — the reference's engine — supports both (its SQL surface
reaches the engine verbatim, swanlake-core/src/engine/connection.rs);
Spark's v1 parquet catalog tables support neither, so the engine
supplies them as a copy-on-write SCHEMA rewrite on the same publish
machinery as DML:

1. dependency checks first (DuckDB semantics): a column referenced by
   the table's own PRIMARY KEY / CHECK / FOREIGN KEY, referenced by a
   child table's FK, or used as a partition column blocks the ALTER;
2. the new contents stage to the ``_staging`` sibling (cluster-visible);
3. under the table write lock: current data files retire into the
   snapshot store (the pre-ALTER contents stay time-travelable — an old
   ``AT (VERSION => n)`` reads the retained files with their old
   schema), the table re-creates with the new column list at the SAME
   location, the staged files rename in, and a manifest records the new
   state (op ``alter_drop_column`` / ``alter_rename_column``);
4. constraint registrations survive: RENAME rewrites the PK/FK column
   lists and re-persists the sidecar (CHECK expressions referencing the
   column are rejected rather than text-rewritten — expression surgery
   on SQL text is how silent corruption happens).

Scale: one full-table rewrite — the same cost DuckLake pays for a
column rewrite on immutable parquet; at 100 TB you schedule it like a
compaction. The publish window has the same manifest-primary
atomicity as every other COW publish.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from swanlake_spark.errors import InvalidArgument


def _guard_dependencies(
    table: str, column: str, renaming: bool
) -> None:
    from swanlake_spark import constraints

    col = column.lower()
    pk = constraints.pk_columns(table) or []
    if not renaming and col in [c.lower() for c in pk]:
        raise InvalidArgument(
            f"cannot drop {column}: part of the PRIMARY KEY of {table}"
        )
    for name, expr in constraints.check_exprs(table):
        # word-boundary containment: good enough to be safe (false
        # positives block, never corrupt)
        import re

        if re.search(rf"\b{re.escape(column)}\b", expr, re.IGNORECASE):
            raise InvalidArgument(
                f"cannot alter {column}: referenced by CHECK {name} "
                f"({expr}) — drop the constraint first"
            )
    for child_cols, parent, parent_cols in constraints.fk_list(table):
        if not renaming and col in [c.lower() for c in child_cols]:
            raise InvalidArgument(
                f"cannot drop {column}: part of a FOREIGN KEY of {table}"
            )
    for child, child_cols, parent_cols in constraints.referencing_children(
        table
    ):
        if col in [c.lower() for c in parent_cols]:
            raise InvalidArgument(
                f"cannot alter {column}: referenced by FOREIGN KEY rows "
                f"in {child}"
            )


def _rename_registrations(table: str, old: str, new: str) -> None:
    """Carry PK/FK registrations across a column rename and re-persist
    the sidecar."""
    from swanlake_spark import constraints as C

    t = C._norm_table(table)
    C._ensure_loaded(t)
    pk = C._PK_REGISTRY.get(t)
    if pk:
        C._PK_REGISTRY[t] = [
            new if c.lower() == old.lower() else c for c in pk
        ]
    fks = C._FK_REGISTRY.get(t)
    if fks:
        C._FK_REGISTRY[t] = [
            (
                [new if c.lower() == old.lower() else c for c in cc],
                p,
                pc,
            )
            for cc, p, pc in fks
        ]
    C._persist(t)


def _rewrite_schema(
    spark: SparkSession, table: str, new_df, op: str
) -> None:
    """The COW schema-rewrite publish (see module docstring)."""
    from swanlake_spark import constraints, versions
    from swanlake_spark.operators import dml

    loc = dml._table_location(spark, table)
    if loc is None:
        raise InvalidArgument(
            f"{table} has no resolvable location; cannot rewrite schema"
        )
    part_cols = dml._partition_columns(spark, table)
    staging = dml.staging_dir(spark, table, loc)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    with dml.table_write_lock(spark, table, loc=loc):
        if part_cols:
            # keep partition columns last, the saveAsTable layout
            order = [
                f.name
                for f in new_df.schema.fields
                if f.name not in part_cols
            ] + [c for c in part_cols]
            new_df = new_df.select(*order)
            new_df.write.partitionBy(*part_cols).parquet(
                staging, mode="overwrite"
            )
        else:
            new_df.write.parquet(staging, mode="overwrite")
        schema = new_df.schema
        cols_ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        # retire the pre-ALTER files (time travel), then swap catalogs
        olds = [
            f"{loc.rstrip('/')}/{rel}"
            for rel, _ in versions._list_data_files(spark, loc)
        ]
        versions.retire_files(spark, table, olds, loc=loc)
        for old in olds:
            p = jvm.org.apache.hadoop.fs.Path(old)
            p.getFileSystem(conf).delete(p, False)
        spark.sql(f"DROP TABLE {table}")  # direct: keep _versions root
        part_sql = (
            " PARTITIONED BY (" + ", ".join(f"`{c}`" for c in part_cols) + ")"
            if part_cols
            else ""
        )
        spark.sql(
            f"CREATE TABLE {table} ({cols_ddl}) USING parquet"
            f"{part_sql} LOCATION '{loc}'"
        )
        # rename staged content into the table location
        src = jvm.org.apache.hadoop.fs.Path(staging)
        dst = jvm.org.apache.hadoop.fs.Path(loc)
        fs = dst.getFileSystem(conf)
        news = []
        for st in fs.listStatus(src):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if not fs.rename(
                st.getPath(), jvm.org.apache.hadoop.fs.Path(dst, name)
            ):
                raise IOError(
                    f"schema-rewrite publish failed for {st.getPath()}"
                )
            if not st.isDirectory():
                news.append((name, int(st.getLen())))
        fs.delete(src, True)
        if part_cols:
            spark.sql(f"ALTER TABLE {table} RECOVER PARTITIONS")
        spark.catalog.refreshTable(table)
        if not part_cols:
            versions.note_published_files(table, sorted(news))
        versions.record_version(spark, table, op, loc=loc)
        # the sidecar lived inside the table dir; re-persist whatever
        # the registries still hold (rename paths already updated them)
        constraints._persist(table)


def drop_column(spark: SparkSession, table: str, column: str) -> None:
    from swanlake_spark.operators import dml

    df = spark.table(table)
    names = {f.name.lower(): f.name for f in df.schema.fields}
    if column.lower() not in names:
        raise InvalidArgument(f"no column {column} in {table}")
    if len(df.columns) == 1:
        raise InvalidArgument(f"cannot drop the only column of {table}")
    if column.lower() in [
        c.lower() for c in dml._partition_columns(spark, table)
    ]:
        raise InvalidArgument(
            f"cannot drop partition column {column} of {table}"
        )
    _guard_dependencies(table, column, renaming=False)
    _rewrite_schema(
        spark, table, df.drop(names[column.lower()]), "alter_drop_column"
    )


def alter_column_type(
    spark: SparkSession, table: str, column: str, new_type: str
) -> None:
    """``ALTER TABLE t ALTER COLUMN c TYPE <t>`` (DuckDB's spelling) —
    the same COW rewrite with an ANSI cast. The engine runs ANSI mode,
    so a narrowing cast that would truncate raises instead of silently
    corrupting (DuckDB errors on lossy casts too)."""
    from pyspark.sql import functions as F

    from swanlake_spark.operators import dml

    df = spark.table(table)
    names = {f.name.lower(): f.name for f in df.schema.fields}
    if column.lower() not in names:
        raise InvalidArgument(f"no column {column} in {table}")
    if column.lower() in [
        c.lower() for c in dml._partition_columns(spark, table)
    ]:
        raise InvalidArgument(
            f"cannot retype partition column {column} of {table}"
        )
    _guard_dependencies(table, column, renaming=True)
    real = names[column.lower()]
    try:
        new_df = df.withColumn(real, F.col(real).cast(new_type))
    except Exception as e:
        raise InvalidArgument(
            f"cannot cast {column} to {new_type}: {e}"
        ) from e
    _rewrite_schema(spark, table, new_df, "alter_column_type")


def rename_column(
    spark: SparkSession, table: str, old: str, new: str
) -> None:
    from swanlake_spark.operators import dml

    df = spark.table(table)
    names = {f.name.lower(): f.name for f in df.schema.fields}
    if old.lower() not in names:
        raise InvalidArgument(f"no column {old} in {table}")
    if new.lower() in names:
        raise InvalidArgument(f"column {new} already exists in {table}")
    if old.lower() in [
        c.lower() for c in dml._partition_columns(spark, table)
    ]:
        raise InvalidArgument(
            f"cannot rename partition column {old} of {table}"
        )
    _guard_dependencies(table, old, renaming=True)
    _rewrite_schema(
        spark,
        table,
        df.withColumnRenamed(names[old.lower()], new),
        "alter_rename_column",
    )
    _rename_registrations(table, old, new)
