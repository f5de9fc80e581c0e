"""Materialized views (matview.py): durable definitions, COW full
refresh, partition-scoped partial refresh, snapshot integration."""

import tempfile

import pytest

from swanlake_spark.errors import NotFound


@pytest.fixture()
def eng(spark):
    from swanlake_spark.engine import Engine

    return Engine(spark=spark)


@pytest.fixture()
def src(spark, eng):
    loc = tempfile.mkdtemp(prefix="swl_mvsrc_")
    spark.sql(
        f"CREATE TABLE mv_src (id INT, amt DOUBLE, day STRING) "
        f"USING parquet LOCATION '{loc}'"
    )
    eng.execute(
        "INSERT INTO mv_src VALUES (1, 10.0, 'd1'), (2, 20.0, 'd1'), "
        "(3, 5.0, 'd2')"
    )
    yield "mv_src"
    spark.sql("DROP TABLE IF EXISTS mv_src")


class TestMatview:
    def test_create_query_refresh_drop(self, spark, eng, src):
        eng.execute(
            "CREATE MATERIALIZED VIEW mv1 AS "
            "SELECT day, sum(amt) AS total FROM mv_src GROUP BY day"
        )
        try:
            rows = {
                (r.day, r.total)
                for r in eng.query("SELECT * FROM mv1").df.collect()
            }
            assert rows == {("d1", 30.0), ("d2", 5.0)}
            # source changes are invisible until refresh
            eng.execute("INSERT INTO mv_src VALUES (4, 1.0, 'd2')")
            assert eng.query(
                "SELECT total FROM mv1 WHERE day = 'd2'"
            ).df.collect()[0].total == 5.0
            eng.execute("REFRESH MATERIALIZED VIEW mv1")
            assert eng.query(
                "SELECT total FROM mv1 WHERE day = 'd2'"
            ).df.collect()[0].total == 6.0
            # a second refresh works too (sidecar survived the COW publish)
            eng.execute("REFRESH MATERIALIZED VIEW mv1")
            assert eng.query("SELECT count(*) AS n FROM mv1").df.collect()[
                0
            ].n == 2
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv1")
        assert not spark.catalog.tableExists("mv1")

    def test_partitioned_partial_refresh(self, spark, eng, src):
        eng.execute(
            "CREATE MATERIALIZED VIEW mv2 PARTITIONED BY (day) AS "
            "SELECT sum(amt) AS total, count(*) AS n, day "
            "FROM mv_src GROUP BY day"
        )
        try:
            eng.execute("INSERT INTO mv_src VALUES (5, 100.0, 'd2')")
            # refresh ONLY day d2: d1 untouched, d2 recomputed
            eng.execute(
                "REFRESH MATERIALIZED VIEW mv2 WHERE day = 'd2'"
            )
            rows = {
                (r.day, r.total, r.n)
                for r in eng.query("SELECT day, total, n FROM mv2").df.collect()
            }
            assert rows == {("d1", 30.0, 2), ("d2", 105.0, 2)}
            # partial refresh reads pruned: only d2's partition rewrote,
            # and the view stays partition-pruned on reads
            plan = (
                spark.table("mv2").filter("day = 'd1'")
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert "PartitionFilters" in plan
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv2")

    def test_unpartitioned_partial_refresh_keeps_rest(self, spark, eng, src):
        eng.execute(
            "CREATE MATERIALIZED VIEW mv3 AS "
            "SELECT day, sum(amt) AS total FROM mv_src GROUP BY day"
        )
        try:
            eng.execute("INSERT INTO mv_src VALUES (6, 7.0, 'd1')")
            eng.execute("REFRESH MATERIALIZED VIEW mv3 WHERE day = 'd1'")
            rows = {
                (r.day, r.total)
                for r in eng.query("SELECT * FROM mv3").df.collect()
            }
            assert rows == {("d1", 37.0), ("d2", 5.0)}
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv3")

    def test_partial_refresh_narrower_than_partition_keeps_rows(
        self, spark, eng, src
    ):
        """A predicate NARROWER than the partition key must not replace
        the whole partition with just the matching rows (the r3
        silent-data-loss edge): non-matching rows of the partition
        survive via the keep ∪ recompute path."""
        eng.execute("INSERT INTO mv_src VALUES (7, 9.0, 'd2')")
        eng.execute(
            "CREATE MATERIALIZED VIEW mv5 PARTITIONED BY (day) AS "
            "SELECT cast(id AS STRING) AS dom, sum(amt) AS total, day "
            "FROM mv_src GROUP BY day, id"
        )
        try:
            eng.execute("INSERT INTO mv_src VALUES (3, 2.0, 'd2')")
            eng.execute(
                "REFRESH MATERIALIZED VIEW mv5 "
                "WHERE day = 'd2' AND dom = '3'"
            )
            rows = {
                (r.day, r.dom, r.total)
                for r in eng.query(
                    "SELECT day, dom, total FROM mv5"
                ).df.collect()
            }
            assert rows == {
                ("d1", "1", 10.0),
                ("d1", "2", 20.0),
                ("d2", "3", 7.0),   # recomputed
                ("d2", "7", 9.0),   # same partition, untouched by pred
            }
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv5")

    def test_refresh_aligns_partition_col_not_last(self, spark, eng, src):
        """saveAsTable(partitionBy) moves partition columns to the end
        of the saved schema; a defining query listing them first must
        still refresh with correct column alignment (full AND
        partition-scoped partial)."""
        eng.execute(
            "CREATE MATERIALIZED VIEW mv6 PARTITIONED BY (day) AS "
            "SELECT day, sum(amt) AS total FROM mv_src GROUP BY day"
        )
        try:
            assert [f.name for f in spark.table("mv6").schema.fields] == [
                "total", "day",
            ]
            eng.execute("INSERT INTO mv_src VALUES (8, 4.0, 'd2')")
            eng.execute("REFRESH MATERIALIZED VIEW mv6")
            rows = {
                (r.day, r.total)
                for r in eng.query("SELECT day, total FROM mv6").df.collect()
            }
            assert rows == {("d1", 30.0), ("d2", 9.0)}
            eng.execute("INSERT INTO mv_src VALUES (9, 1.0, 'd1')")
            eng.execute("REFRESH MATERIALIZED VIEW mv6 WHERE day = 'd1'")
            rows = {
                (r.day, r.total)
                for r in eng.query("SELECT day, total FROM mv6").df.collect()
            }
            assert rows == {("d1", 31.0), ("d2", 9.0)}
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv6")

    def test_refresh_non_matview_errors(self, eng, src):
        with pytest.raises(NotFound):
            eng.execute("REFRESH MATERIALIZED VIEW mv_src")

    def test_definition_survives_engine_restart(self, spark, eng, src):
        """The sidecar lives with the data — a NEW Engine over the same
        metastore can refresh without in-memory state."""
        from swanlake_spark import matview
        from swanlake_spark.engine import Engine

        eng.execute(
            "CREATE MATERIALIZED VIEW mv4 AS "
            "SELECT count(*) AS n FROM mv_src"
        )
        try:
            eng2 = Engine(spark=spark)  # fresh engine object, no state
            assert "count" in (matview.definition(spark, "mv4") or "")
            eng.execute("INSERT INTO mv_src VALUES (9, 1.0, 'd3')")
            eng2.execute("REFRESH MATERIALIZED VIEW mv4")
            assert eng2.query("SELECT n FROM mv4").df.collect()[0].n == 4
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv4")
