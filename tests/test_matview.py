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


class TestIncrementalRefresh:
    """REFRESH MATERIALIZED VIEW ... INCREMENTAL: append-delta
    maintenance for single-table GROUP BY views (matview.py r5). Every
    result is compared against what a full recompute would produce."""

    def _full(self, spark, q):
        return {tuple(r) for r in spark.sql(q).collect()}

    def test_appends_fold_in_and_match_full_recompute(self, spark, eng, src):
        q = ("SELECT day, count(*) AS n, sum(amt) AS total, "
             "min(amt) AS lo, max(amt) AS hi FROM mv_src GROUP BY day")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_inc AS {q}")
        try:
            eng.execute(
                "INSERT INTO mv_src VALUES (4, 40.0, 'd1'), (5, 1.0, 'd3')"
            )
            n = eng.query(
                "REFRESH MATERIALIZED VIEW mv_inc INCREMENTAL"
            ).affected_rows
            assert n >= 1  # delta files folded
            got = {tuple(r) for r in spark.table("mv_inc").collect()}
            assert got == self._full(spark, q)
            # second round: two more appends, fold again
            eng.execute("INSERT INTO mv_src VALUES (6, 2.0, 'd3')")
            eng.execute("INSERT INTO mv_src VALUES (7, 0.5, 'd2')")
            eng.execute("REFRESH MATERIALIZED VIEW mv_inc INCREMENTAL")
            got = {tuple(r) for r in spark.table("mv_inc").collect()}
            assert got == self._full(spark, q)
            # no new appends: no-op
            assert eng.query(
                "REFRESH MATERIALIZED VIEW mv_inc INCREMENTAL"
            ).affected_rows == 0
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_inc")

    def test_where_in_definition_applies_to_delta(self, spark, eng, src):
        q = ("SELECT day, sum(amt) AS total FROM mv_src "
             "WHERE amt > 4.0 GROUP BY day")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_incw AS {q}")
        try:
            eng.execute(
                "INSERT INTO mv_src VALUES (8, 3.0, 'd1'), (9, 50.0, 'd1')"
            )
            eng.execute("REFRESH MATERIALIZED VIEW mv_incw INCREMENTAL")
            got = {tuple(r) for r in spark.table("mv_incw").collect()}
            assert got == self._full(spark, q)  # 3.0 filtered out of delta
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_incw")

    def test_base_rewrite_maintained_differentially(self, spark, eng, src):
        eng.execute(
            "CREATE MATERIALIZED VIEW mv_incr AS "
            "SELECT day, count(*) AS n, sum(amt) AS total "
            "FROM mv_src GROUP BY day"
        )
        try:
            # UPDATE rewrites a file; the signed delta fold nets the
            # unchanged rows away and applies only the real change
            eng.execute("UPDATE mv_src SET amt = amt + 1 WHERE id = 1")
            assert eng.query(
                "REFRESH MATERIALIZED VIEW mv_incr INCREMENTAL"
            ).affected_rows > 0
            q = ("SELECT day, count(*) AS n, sum(amt) AS total "
                 "FROM mv_src GROUP BY day")
            got = {tuple(r) for r in spark.table("mv_incr").collect()}
            assert got == self._full(spark, q)
            # ... and appends still merge on top of the rewritten state
            eng.execute("INSERT INTO mv_src VALUES (10, 9.0, 'd4')")
            eng.execute("REFRESH MATERIALIZED VIEW mv_incr INCREMENTAL")
            got = {tuple(r) for r in spark.table("mv_incr").collect()}
            assert got == self._full(spark, q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_incr")

    def test_rewrite_without_full_state_demands_full_refresh(
        self, spark, eng, src
    ):
        import shutil

        from swanlake_spark import matview
        from swanlake_spark.errors import InvalidArgument

        eng.execute(
            "CREATE MATERIALIZED VIEW mv_incl AS "
            "SELECT day, count(*) AS n FROM mv_src GROUP BY day"
        )
        try:
            # simulate a view whose state predates differential
            # support: drop the state sidecar dir entirely
            state_root = matview._state_path(spark, "mv_incl", 0).rsplit(
                "/", 1
            )[0]
            if state_root.startswith("file:"):
                state_root = state_root[len("file:"):]
            shutil.rmtree(state_root, ignore_errors=True)
            eng.execute("UPDATE mv_src SET amt = amt + 1 WHERE id = 1")
            with pytest.raises(InvalidArgument, match="full REFRESH"):
                eng.execute("REFRESH MATERIALIZED VIEW mv_incl INCREMENTAL")
            # full refresh re-establishes the state; differential works
            eng.execute("REFRESH MATERIALIZED VIEW mv_incl")
            eng.execute("DELETE FROM mv_src WHERE id = 2")
            eng.execute("REFRESH MATERIALIZED VIEW mv_incl INCREMENTAL")
            got = {tuple(r) for r in spark.table("mv_incl").collect()}
            assert got == self._full(
                spark, "SELECT day, count(*) AS n FROM mv_src GROUP BY day"
            )
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_incl")

    def test_unmergeable_definition_rejected(self, spark, eng, src):
        from swanlake_spark.errors import InvalidArgument

        eng.execute(
            "CREATE MATERIALIZED VIEW mv_incdd AS "
            "SELECT day, count(DISTINCT amt) AS a FROM mv_src GROUP BY day"
        )
        try:
            eng.execute("INSERT INTO mv_src VALUES (11, 1.0, 'd1')")
            with pytest.raises(InvalidArgument, match="maintainable"):
                eng.execute(
                    "REFRESH MATERIALIZED VIEW mv_incdd INCREMENTAL"
                )
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_incdd")

    def test_impure_definition_falls_back_to_full(self, spark, eng, src):
        """A predicate with a subquery or a non-deterministic function
        would be re-evaluated at refresh time against only the delta —
        silent divergence from a full recompute — so such definitions
        must NOT be incrementally maintainable (ADVICE r5)."""
        from swanlake_spark.errors import InvalidArgument
        from swanlake_spark.matview import parse_incremental

        assert (
            parse_incremental(
                "SELECT day, sum(amt) AS s FROM mv_src "
                "WHERE id IN (SELECT id FROM allow) GROUP BY day"
            )
            is None
        )
        assert (
            parse_incremental(
                "SELECT day, sum(amt) AS s FROM mv_src "
                "WHERE created >= current_date() - 7 GROUP BY day"
            )
            is None
        )
        assert (
            parse_incremental(
                "SELECT day, sum(amt * rand()) AS s FROM mv_src GROUP BY day"
            )
            is None
        )
        eng.execute(
            "CREATE MATERIALIZED VIEW mv_incnd AS "
            "SELECT day, sum(amt + 0 * unix_timestamp()) AS s "
            "FROM mv_src GROUP BY day"
        )
        try:
            eng.execute("INSERT INTO mv_src VALUES (13, 1.0, 'd1')")
            with pytest.raises(InvalidArgument, match="maintainable"):
                eng.execute(
                    "REFRESH MATERIALIZED VIEW mv_incnd INCREMENTAL"
                )
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_incnd")

    def test_avg_folds_incrementally(self, spark, eng, src):
        """avg decomposes into sum+count merge state: appends fold in
        and the result matches a full recompute exactly (decimal/int
        args: order-independent components, identical rounding)."""
        eng.execute(
            "CREATE MATERIALIZED VIEW mv_incavg AS "
            "SELECT day, avg(amt) AS a, count(*) AS n, sum(amt) AS s "
            "FROM mv_src GROUP BY day"
        )
        try:
            eng.execute(
                "INSERT INTO mv_src VALUES (21, 7.5, 'd1'), "
                "(22, 2.25, 'd4'), (23, 0.5, 'd4')"
            )
            eng.execute("REFRESH MATERIALIZED VIEW mv_incavg INCREMENTAL")
            got = {tuple(r) for r in spark.table("mv_incavg").collect()}
            want = self._full(
                spark,
                "SELECT day, avg(amt) AS a, count(*) AS n, sum(amt) AS s "
                "FROM mv_src GROUP BY day",
            )
            assert got == want
            # second round: state carried forward under the new stamp
            eng.execute("INSERT INTO mv_src VALUES (24, 100.0, 'd1')")
            eng.execute("REFRESH MATERIALIZED VIEW mv_incavg INCREMENTAL")
            got = {tuple(r) for r in spark.table("mv_incavg").collect()}
            want = self._full(
                spark,
                "SELECT day, avg(amt) AS a, count(*) AS n, sum(amt) AS s "
                "FROM mv_src GROUP BY day",
            )
            assert got == want
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_incavg")

    def test_avg_nulls_and_new_groups_fold(self, spark, eng):
        """avg state merges correctly across NULL-arg rows (count(col)
        skips them), groups new in the delta, and groups absent from
        the delta."""
        import tempfile as _tf

        loc = _tf.mkdtemp(prefix="swl_mvavg_")
        eng.execute(
            f"CREATE TABLE mv_avgsrc (k STRING, v INT) "
            f"USING parquet LOCATION '{loc}'"
        )
        try:
            eng.execute(
                "INSERT INTO mv_avgsrc VALUES ('a', 2), ('a', NULL), ('b', 10)"
            )
            q = (
                "SELECT k, avg(v) AS a, count(v) AS c "
                "FROM mv_avgsrc GROUP BY k"
            )
            eng.execute(f"CREATE MATERIALIZED VIEW mv_avgv AS {q}")
            eng.execute(
                "INSERT INTO mv_avgsrc VALUES "
                "('a', 4), ('c', NULL), ('d', 7)"  # b absent; c all-null
            )
            eng.execute("REFRESH MATERIALIZED VIEW mv_avgv INCREMENTAL")
            got = {tuple(r) for r in spark.table("mv_avgv").collect()}
            want = {tuple(r) for r in spark.sql(q).collect()}
            assert got == want
            # the all-null group's avg is NULL, not a divide error
            assert ("c", None, 0) in got
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_avgv")
            eng.execute("DROP TABLE mv_avgsrc")

    def test_partial_refresh_clears_stamp(self, spark, eng, src):
        from swanlake_spark.errors import InvalidArgument

        eng.execute(
            "CREATE MATERIALIZED VIEW mv_incp AS "
            "SELECT day, sum(amt) AS total FROM mv_src GROUP BY day"
        )
        try:
            eng.execute("INSERT INTO mv_src VALUES (12, 4.0, 'd1')")
            eng.execute(
                "REFRESH MATERIALIZED VIEW mv_incp WHERE day = 'd1'"
            )
            # the partial refresh consumed newer base data for d1 only:
            # a stamp would double-count — it must be gone
            with pytest.raises(InvalidArgument, match="full REFRESH"):
                eng.execute("REFRESH MATERIALIZED VIEW mv_incp INCREMENTAL")
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_incp")

    def test_decimal_sum_merge_keeps_view_type(self, spark, eng):
        """Regression: decimal addition widens (decimal(20,2) + same →
        decimal(21,2)) and the COW publish renames staged files in
        verbatim — without the merged-column cast the view's next scan
        failed with a parquet type mismatch on the sum column."""
        import tempfile as _tf

        loc = _tf.mkdtemp(prefix="swl_mvdec_")
        eng.execute(
            f"CREATE TABLE mv_decsrc (k STRING, amt DECIMAL(10,2)) "
            f"USING parquet LOCATION '{loc}'"
        )
        try:
            eng.execute(
                "INSERT INTO mv_decsrc VALUES ('a', 10.00), ('b', 5.25)"
            )
            q = (
                "SELECT k, sum(amt) AS s, avg(amt) AS a, count(*) AS n "
                "FROM mv_decsrc GROUP BY k"
            )
            eng.execute(f"CREATE MATERIALIZED VIEW mv_decv AS {q}")
            eng.execute("INSERT INTO mv_decsrc VALUES ('a', 1.50), ('c', 7.77)")
            eng.execute("REFRESH MATERIALIZED VIEW mv_decv INCREMENTAL")
            got = {tuple(r) for r in spark.table("mv_decv").collect()}
            assert got == {tuple(r) for r in spark.sql(q).collect()}
            # and again (state + view types stay pinned round over round)
            eng.execute("INSERT INTO mv_decsrc VALUES ('b', 0.75)")
            eng.execute("REFRESH MATERIALIZED VIEW mv_decv INCREMENTAL")
            got = {tuple(r) for r in spark.table("mv_decv").collect()}
            assert got == {tuple(r) for r in spark.sql(q).collect()}
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_decv")
            eng.execute("DROP TABLE mv_decsrc")

    def test_materialize_pinned_to_stamp_excludes_racing_append(
        self, spark, eng, src
    ):
        """ADVICE r5: the base stamp is taken from the manifests BEFORE
        the materializing read — if that read were live, an append
        published in between would land in the view while the stamp
        predates it, and the next INCREMENTAL would fold the same files
        again (double-count). The read is pinned to the stamped
        snapshot, so the racing append is in NEITHER (folded exactly
        once, later)."""
        from swanlake_spark import matview

        q = "SELECT day, sum(amt) AS total FROM mv_src GROUP BY day"
        stamp = matview._base_stamp(spark, q)
        assert stamp  # version-tracked base
        # the "racing" append: published after the stamp, before the read
        eng.execute("INSERT INTO mv_src VALUES (30, 1000.0, 'd1')")
        df, state, pinned, _comb = matview._materialize(spark, q, stamp)
        assert pinned
        got = {tuple(r) for r in df.collect()}
        # pinned read reflects the stamped snapshot — no 1000.0
        assert got == {("d1", 30.0), ("d2", 5.0)}

    def test_null_group_keys_merge_as_one_group(self, spark, eng):
        import tempfile as _tf

        loc = _tf.mkdtemp(prefix="swl_mvng_")
        eng.execute(
            f"CREATE TABLE mv_ng (k STRING, v INT) "
            f"USING parquet LOCATION '{loc}'"
        )
        try:
            eng.execute("INSERT INTO mv_ng VALUES (NULL, 1), ('a', 2)")
            q = "SELECT k, sum(v) AS s FROM mv_ng GROUP BY k"
            eng.execute(f"CREATE MATERIALIZED VIEW mv_ngv AS {q}")
            eng.execute("INSERT INTO mv_ng VALUES (NULL, 10), ('a', 20)")
            eng.execute("REFRESH MATERIALIZED VIEW mv_ngv INCREMENTAL")
            got = {tuple(r) for r in spark.table("mv_ngv").collect()}
            assert got == self._full(spark, q) == {(None, 11), ("a", 22)}
        finally:
            eng.execute("DROP MATERIALIZED VIEW IF EXISTS mv_ngv")
            eng.execute("DROP TABLE IF EXISTS mv_ng")


class TestDifferentialRefresh:
    """Delete/rewrite-capable incremental maintenance (matview.py r6):
    the signed delta fold for additive aggregates, affected-group
    recompute for min/max, group retirement, NULL restoration. Every
    result compares against a full recompute of the defining query."""

    def _full(self, spark, q):
        return {tuple(r) for r in spark.sql(q).collect()}

    @pytest.fixture()
    def dsrc(self, spark, eng):
        loc = tempfile.mkdtemp(prefix="swl_mvd_")
        spark.sql(
            f"CREATE TABLE mv_d (id INT, amt DOUBLE, qty INT, day STRING) "
            f"USING parquet LOCATION '{loc}'"
        )
        eng.execute(
            "INSERT INTO mv_d VALUES "
            "(1, 10.0, 1, 'd1'), (2, 20.0, 2, 'd1'), (3, NULL, 3, 'd1'), "
            "(4, 5.0, 4, 'd2'), (5, 7.0, NULL, 'd2'), "
            "(6, 100.0, 6, 'd3')"
        )
        yield "mv_d"
        spark.sql("DROP TABLE IF EXISTS mv_d")

    def _check(self, spark, eng, name, q):
        eng.execute(f"REFRESH MATERIALIZED VIEW {name} INCREMENTAL")
        assert {
            tuple(r) for r in spark.table(name).collect()
        } == self._full(spark, q)

    def test_deletes_fold_additively(self, spark, eng, dsrc):
        q = ("SELECT day, count(*) AS n, count(qty) AS nq, "
             "sum(amt) AS total, avg(amt) AS mean "
             "FROM mv_d GROUP BY day")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_dv AS {q}")
        try:
            eng.execute("DELETE FROM mv_d WHERE id = 2")
            self._check(spark, eng, "mv_dv", q)
            # delete + insert in one delta window
            eng.execute("DELETE FROM mv_d WHERE id = 4")
            eng.execute("INSERT INTO mv_d VALUES (7, 3.0, 7, 'd2')")
            self._check(spark, eng, "mv_dv", q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_dv")

    def test_group_retires_when_last_row_leaves(self, spark, eng, dsrc):
        q = "SELECT day, count(*) AS n, sum(amt) AS t FROM mv_d GROUP BY day"
        eng.execute(f"CREATE MATERIALIZED VIEW mv_dg AS {q}")
        try:
            eng.execute("DELETE FROM mv_d WHERE day = 'd3'")
            self._check(spark, eng, "mv_dg", q)
            assert "d3" not in {
                r.day for r in spark.table("mv_dg").collect()
            }
            # the group returns when rows come back
            eng.execute("INSERT INTO mv_d VALUES (8, 1.5, 8, 'd3')")
            self._check(spark, eng, "mv_dg", q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_dg")

    def test_sum_and_avg_restore_null_when_args_leave(self, spark, eng, dsrc):
        q = ("SELECT day, count(*) AS n, sum(amt) AS t, avg(amt) AS m "
             "FROM mv_d GROUP BY day")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_dn AS {q}")
        try:
            # d1 keeps its NULL-amt row only: sum/avg must become NULL,
            # not 0 — exactly what the count(arg) state restores
            eng.execute("DELETE FROM mv_d WHERE id IN (1, 2)")
            self._check(spark, eng, "mv_dn", q)
            row = {
                r.day: (r.n, r.t, r.m)
                for r in spark.table("mv_dn").collect()
            }["d1"]
            assert row == (1, None, None)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_dn")

    def test_minmax_hybrid_recomputes_affected_groups(self, spark, eng, dsrc):
        q = ("SELECT day, count(*) AS n, min(amt) AS lo, max(amt) AS hi "
             "FROM mv_d GROUP BY day")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_dm AS {q}")
        try:
            # delete d1's max row — only a recompute can find the new max
            eng.execute("DELETE FROM mv_d WHERE id = 2")
            self._check(spark, eng, "mv_dm", q)
            # unaffected groups merged incrementally in the same round
            eng.execute("DELETE FROM mv_d WHERE id = 4")
            eng.execute("INSERT INTO mv_d VALUES (9, 200.0, 9, 'd3')")
            self._check(spark, eng, "mv_dm", q)
            # retire a whole group through the hybrid path too
            eng.execute("DELETE FROM mv_d WHERE day = 'd3'")
            self._check(spark, eng, "mv_dm", q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_dm")

    def test_update_nets_to_its_real_change(self, spark, eng, dsrc):
        q = ("SELECT day, sum(amt) AS t, avg(qty) AS mq "
             "FROM mv_d GROUP BY day")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_du AS {q}")
        try:
            # rewrites the whole d1/d2-bearing file; unchanged rows must
            # cancel in the signed fold
            eng.execute("UPDATE mv_d SET amt = amt * 2 WHERE id = 1")
            self._check(spark, eng, "mv_du", q)
            eng.execute("UPDATE mv_d SET qty = NULL WHERE id = 4")
            self._check(spark, eng, "mv_du", q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_du")

    def test_decimal_sums_stay_exact_under_deletes(self, spark, eng):
        loc = tempfile.mkdtemp(prefix="swl_mvdec_")
        eng.execute(
            f"CREATE TABLE mv_dec (id INT, amt DECIMAL(20,2), g STRING) "
            f"USING parquet LOCATION '{loc}'"
        )
        try:
            eng.execute(
                "INSERT INTO mv_dec VALUES (1, 0.10, 'a'), (2, 0.20, 'a'), "
                "(3, 123456789012345.67, 'b'), (4, 0.01, 'b')"
            )
            q = ("SELECT g, sum(amt) AS t, avg(amt) AS m "
                 "FROM mv_dec GROUP BY g")
            eng.execute(f"CREATE MATERIALIZED VIEW mv_decv AS {q}")
            eng.execute("DELETE FROM mv_dec WHERE id = 1")
            eng.execute("DELETE FROM mv_dec WHERE id = 4")
            self._check(spark, eng, "mv_decv", q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW IF EXISTS mv_decv")
            eng.execute("DROP TABLE IF EXISTS mv_dec")

    def test_null_group_key_deletes(self, spark, eng):
        loc = tempfile.mkdtemp(prefix="swl_mvng2_")
        eng.execute(
            f"CREATE TABLE mv_ng2 (k STRING, v INT) "
            f"USING parquet LOCATION '{loc}'"
        )
        try:
            eng.execute(
                "INSERT INTO mv_ng2 VALUES (NULL, 1), (NULL, 2), ('a', 3)"
            )
            q = "SELECT k, count(*) AS n, sum(v) AS s FROM mv_ng2 GROUP BY k"
            eng.execute(f"CREATE MATERIALIZED VIEW mv_ngv2 AS {q}")
            eng.execute("DELETE FROM mv_ng2 WHERE v = 1")
            self._check(spark, eng, "mv_ngv2", q)
            assert {
                tuple(r) for r in spark.table("mv_ngv2").collect()
            } == {(None, 1, 2), ("a", 1, 3)}
        finally:
            eng.execute("DROP MATERIALIZED VIEW IF EXISTS mv_ngv2")
            eng.execute("DROP TABLE IF EXISTS mv_ng2")


class TestIncrementalAfterExpire:
    def test_expired_base_snapshot_demands_full_refresh(self, spark, eng, src):
        import time

        from swanlake_spark import matview, versions
        from swanlake_spark.errors import InvalidArgument

        import tempfile

        matview.create(
            spark,
            "mv_exp",
            "SELECT day, count(*) AS n, sum(amt) AS total "
            "FROM mv_src GROUP BY day",
            location=tempfile.mkdtemp(prefix="swl_mv_exp_"),
        )
        try:
            eng.execute("INSERT INTO mv_src VALUES (7, 2.0, 'd3')")
            eng.execute("INSERT INTO mv_src VALUES (8, 3.0, 'd3')")
            # retention drops everything but the newest base manifest,
            # including the view's stamped baseline
            versions.expire(spark, "mv_src", keep_last=1, min_age_s=0.0)
            with pytest.raises(InvalidArgument, match="expired|re-baseline"):
                matview.refresh_incremental(spark, "mv_exp")
            # the advertised recovery works and lands on the truth
            eng.execute("REFRESH MATERIALIZED VIEW mv_exp")
            got = {
                (r.day, r.n, r.total)
                for r in spark.table("mv_exp").collect()
            }
            assert got == {("d1", 2, 30.0), ("d2", 1, 5.0), ("d3", 2, 5.0)}
        finally:
            matview.drop(spark, "mv_exp")


class TestMatviewJoinIncremental:
    """r7: incremental maintenance for two-table equi-join views via
    the bilinear delta A2⋈B2 − A1⋈B1 = ΔA⋈B2 + A1⋈ΔB (matview.py
    _INC_JOIN_RE section). Every result is compared against a full
    recompute of the defining query."""

    def _full(self, spark, q):
        return {tuple(r) for r in spark.sql(q).collect()}

    def _check(self, spark, eng, name, q):
        eng.execute(f"REFRESH MATERIALIZED VIEW {name} INCREMENTAL")
        assert {
            tuple(r) for r in spark.table(name).collect()
        } == self._full(spark, q)

    @pytest.fixture()
    def jsrc(self, spark, eng):
        floc = tempfile.mkdtemp(prefix="swl_mvjf_")
        dloc = tempfile.mkdtemp(prefix="swl_mvjd_")
        spark.sql(
            f"CREATE TABLE mv_jf (fid INT, amt DOUBLE, fdk INT) "
            f"USING parquet LOCATION '{floc}'"
        )
        spark.sql(
            f"CREATE TABLE mv_jd (dk INT, dname STRING) "
            f"USING parquet LOCATION '{dloc}'"
        )
        eng.execute(
            "INSERT INTO mv_jf VALUES (1, 10.0, 1), (2, 20.0, 1), "
            "(3, 5.0, 2), (4, 7.0, 3)"  # fdk=3 dangling until dim grows
        )
        eng.execute("INSERT INTO mv_jd VALUES (1, 'alpha'), (2, 'beta')")
        yield
        spark.sql("DROP TABLE IF EXISTS mv_jf")
        spark.sql("DROP TABLE IF EXISTS mv_jd")

    Q = ("SELECT dname, count(*) AS n, sum(amt) AS total, "
         "avg(amt) AS mean FROM mv_jf JOIN mv_jd ON fdk = dk "
         "GROUP BY dname")

    def test_fact_appends_fold(self, spark, eng, jsrc):
        eng.execute(f"CREATE MATERIALIZED VIEW mv_j1 AS {self.Q}")
        try:
            eng.execute(
                "INSERT INTO mv_jf VALUES (5, 40.0, 2), (6, 1.0, 1)"
            )
            n = eng.query(
                "REFRESH MATERIALIZED VIEW mv_j1 INCREMENTAL"
            ).affected_rows
            assert n >= 1
            assert {
                tuple(r) for r in spark.table("mv_j1").collect()
            } == self._full(spark, self.Q)
            # second append round, then a no-op round
            eng.execute("INSERT INTO mv_jf VALUES (7, 2.5, 1)")
            self._check(spark, eng, "mv_j1", self.Q)
            assert eng.query(
                "REFRESH MATERIALIZED VIEW mv_j1 INCREMENTAL"
            ).affected_rows == 0
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_j1")

    def test_dim_append_matches_dangling_facts(self, spark, eng, jsrc):
        # fdk=3 rows join nothing until the dim gains dk=3 — the
        # A1⋈ΔB term must surface them
        eng.execute(f"CREATE MATERIALIZED VIEW mv_j2 AS {self.Q}")
        try:
            eng.execute("INSERT INTO mv_jd VALUES (3, 'gamma')")
            self._check(spark, eng, "mv_j2", self.Q)
            assert ("gamma", 1, 7.0, 7.0) in {
                tuple(r) for r in spark.table("mv_j2").collect()
            }
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_j2")

    def test_both_sides_change_in_one_refresh(self, spark, eng, jsrc):
        eng.execute(f"CREATE MATERIALIZED VIEW mv_j3 AS {self.Q}")
        try:
            eng.execute("INSERT INTO mv_jf VALUES (8, 9.0, 3)")
            eng.execute("INSERT INTO mv_jd VALUES (3, 'gamma')")
            # ΔA⋈B2 counts the new fact against the new dim row (the
            # cross term), A1⋈ΔB picks up the old dangling fdk=3 fact
            self._check(spark, eng, "mv_j3", self.Q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_j3")

    def test_fact_update_delete_differential(self, spark, eng, jsrc):
        eng.execute(f"CREATE MATERIALIZED VIEW mv_j4 AS {self.Q}")
        try:
            eng.execute_update("UPDATE mv_jf SET amt = 11.0 WHERE fid = 1")
            self._check(spark, eng, "mv_j4", self.Q)
            eng.execute_update("DELETE FROM mv_jf WHERE fid = 3")
            # beta's last member leaves: the group must retire
            self._check(spark, eng, "mv_j4", self.Q)
            assert "beta" not in {
                r["dname"] for r in spark.table("mv_j4").collect()
            }
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_j4")

    def test_dim_rewrite_moves_groups(self, spark, eng, jsrc):
        eng.execute(f"CREATE MATERIALIZED VIEW mv_j5 AS {self.Q}")
        try:
            # rename a dim value: every alpha row must migrate to the
            # renamed group via delete(old pair) + insert(new pair)
            eng.execute_update(
                "UPDATE mv_jd SET dname = 'alpha2' WHERE dk = 1"
            )
            self._check(spark, eng, "mv_j5", self.Q)
            names = {r["dname"] for r in spark.table("mv_j5").collect()}
            assert "alpha2" in names and "alpha" not in names
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_j5")

    def test_dim_delta_prunes_fact_anchor_scan(self, spark, eng, jsrc):
        """A dim-side delta's term must push the delta's link keys into
        the FACT anchor scan as a literal In filter (PushedFilters), so
        a small dim correction never scans the whole fact — and the
        refreshed view still matches the full recompute."""
        from swanlake_spark import matview

        eng.execute(f"CREATE MATERIALIZED VIEW mv_jp AS {self.Q}")
        try:
            eng.execute("INSERT INTO mv_jd VALUES (3, 'gamma')")
            matview._JOIN_TERM_PLAN_SINK = []
            try:
                self._check(spark, eng, "mv_jp", self.Q)
                plans = list(matview._JOIN_TERM_PLAN_SINK)
            finally:
                matview._JOIN_TERM_PLAN_SINK = None
            # exactly one term (the dim insert), whose fact-anchor scan
            # carries the pushed key filter fdk IN (3)
            assert len(plans) == 1
            assert "PushedFilters" in plans[0]
            import re as _re

            # the first PushedFilters block is the fact scan's;
            # Catalyst folds a single-key In to EqualTo
            m = _re.search(r"PushedFilters: \[([^\]]*)\]", plans[0])
            assert m is not None, plans[0][:2000]
            assert "In(fdk" in m.group(1) or "EqualTo(fdk,3)" in m.group(1), (
                m.group(1)
            )
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_jp")

    def test_dim_update_prune_nets_exactly(self, spark, eng, jsrc):
        """Prune must be value-exact under a dim UPDATE (delete+insert
        deltas, both pruned): facts outside the touched keys keep their
        groups, facts on the touched key migrate."""
        eng.execute(f"CREATE MATERIALIZED VIEW mv_jq AS {self.Q}")
        try:
            eng.execute_update(
                "UPDATE mv_jd SET dname = 'beta2' WHERE dk = 2"
            )
            self._check(spark, eng, "mv_jq", self.Q)
            names = {r["dname"] for r in spark.table("mv_jq").collect()}
            assert "beta2" in names and "beta" not in names
            assert "alpha" in names  # untouched key survived the prune
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_jq")

    def test_minmax_join_hybrid(self, spark, eng, jsrc):
        q = ("SELECT dname, count(*) AS n, min(amt) AS lo, "
             "max(amt) AS hi FROM mv_jf JOIN mv_jd ON fdk = dk "
             "GROUP BY dname")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_j6 AS {q}")
        try:
            eng.execute("INSERT INTO mv_jf VALUES (9, 50.0, 1)")
            self._check(spark, eng, "mv_j6", q)
            # delete the max of alpha: only a recompute can lower hi
            eng.execute_update("DELETE FROM mv_jf WHERE fid = 9")
            self._check(spark, eng, "mv_j6", q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_j6")

    def test_where_pred_applies_to_join_delta(self, spark, eng, jsrc):
        q = ("SELECT dname, sum(amt) AS total FROM mv_jf "
             "JOIN mv_jd ON fdk = dk WHERE amt > 4.0 GROUP BY dname")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_j7 AS {q}")
        try:
            eng.execute(
                "INSERT INTO mv_jf VALUES (10, 3.0, 1), (11, 30.0, 1)"
            )
            self._check(spark, eng, "mv_j7", q)  # 3.0 filtered from delta
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_j7")

    def test_ambiguous_columns_fall_back_to_full(self, spark, eng):
        floc = tempfile.mkdtemp(prefix="swl_mvja_")
        dloc = tempfile.mkdtemp(prefix="swl_mvjb_")
        spark.sql(
            f"CREATE TABLE mv_amb_a (k INT, v DOUBLE) "
            f"USING parquet LOCATION '{floc}'"
        )
        spark.sql(
            f"CREATE TABLE mv_amb_b (k2 INT, v STRING) "  # shared 'v'
            f"USING parquet LOCATION '{dloc}'"
        )
        eng.execute("INSERT INTO mv_amb_a VALUES (1, 2.0)")
        eng.execute("INSERT INTO mv_amb_b VALUES (1, 'x')")
        eng.execute(
            "CREATE MATERIALIZED VIEW mv_j8 AS "
            "SELECT k, count(*) AS n FROM mv_amb_a "
            "JOIN mv_amb_b ON k = k2 GROUP BY k"
        )
        try:
            from swanlake_spark.errors import InvalidArgument

            with pytest.raises(InvalidArgument, match="full REFRESH"):
                eng.execute("REFRESH MATERIALIZED VIEW mv_j8 INCREMENTAL")
            # the full path still works
            eng.execute("REFRESH MATERIALIZED VIEW mv_j8")
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_j8")
            spark.sql("DROP TABLE IF EXISTS mv_amb_a")
            spark.sql("DROP TABLE IF EXISTS mv_amb_b")


class TestMatviewStarIncremental:
    """r7: n-ary join views via the multilinear telescoping delta
    (matview.py _INC_JOIN_RE section) — each table-i term anchors
    earlier tables at their OLD snapshots and later tables at NEW, so
    cross terms between deltas count exactly once. Star schema: fact
    mv_sf joins dims mv_sd1 and mv_sd2; every result is compared
    against a full recompute of the defining query."""

    def _full(self, spark, q):
        return {tuple(r) for r in spark.sql(q).collect()}

    def _check(self, spark, eng, name, q):
        eng.execute(f"REFRESH MATERIALIZED VIEW {name} INCREMENTAL")
        assert {
            tuple(r) for r in spark.table(name).collect()
        } == self._full(spark, q)

    @pytest.fixture()
    def ssrc(self, spark, eng):
        locs = [tempfile.mkdtemp(prefix="swl_mvst_") for _ in range(3)]
        spark.sql(
            f"CREATE TABLE mv_sf (fid INT, amt DOUBLE, fdk1 INT, "
            f"fdk2 INT) USING parquet LOCATION '{locs[0]}'"
        )
        spark.sql(
            f"CREATE TABLE mv_sd1 (d1k INT, region STRING) "
            f"USING parquet LOCATION '{locs[1]}'"
        )
        spark.sql(
            f"CREATE TABLE mv_sd2 (d2k INT, product STRING) "
            f"USING parquet LOCATION '{locs[2]}'"
        )
        eng.execute(
            "INSERT INTO mv_sf VALUES (1, 10.0, 1, 1), (2, 20.0, 1, 2), "
            "(3, 5.0, 2, 1), (4, 7.0, 3, 9)"  # fdk1=3 / fdk2=9 dangling
        )
        eng.execute("INSERT INTO mv_sd1 VALUES (1, 'east'), (2, 'west')")
        eng.execute("INSERT INTO mv_sd2 VALUES (1, 'ore'), (2, 'gas')")
        yield
        spark.sql("DROP TABLE IF EXISTS mv_sf")
        spark.sql("DROP TABLE IF EXISTS mv_sd1")
        spark.sql("DROP TABLE IF EXISTS mv_sd2")

    Q = (
        "SELECT region, product, count(*) AS n, sum(amt) AS total, "
        "avg(amt) AS mean FROM mv_sf JOIN mv_sd1 ON fdk1 = d1k "
        "JOIN mv_sd2 ON fdk2 = d2k GROUP BY region, product"
    )
    QMM = (
        "SELECT region, product, count(*) AS n, min(amt) AS lo, "
        "max(amt) AS hi FROM mv_sf JOIN mv_sd1 ON fdk1 = d1k "
        "JOIN mv_sd2 ON fdk2 = d2k GROUP BY region, product"
    )

    def test_fact_appends_fold(self, spark, eng, ssrc):
        eng.execute(f"CREATE MATERIALIZED VIEW mv_s1 AS {self.Q}")
        try:
            eng.execute(
                "INSERT INTO mv_sf VALUES (5, 40.0, 2, 2), (6, 1.0, 1, 1)"
            )
            n = eng.query(
                "REFRESH MATERIALIZED VIEW mv_s1 INCREMENTAL"
            ).affected_rows
            assert n >= 1
            assert {
                tuple(r) for r in spark.table("mv_s1").collect()
            } == self._full(spark, self.Q)
            assert eng.query(
                "REFRESH MATERIALIZED VIEW mv_s1 INCREMENTAL"
            ).affected_rows == 0
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_s1")

    def test_each_dim_append_surfaces_dangling_facts(
        self, spark, eng, ssrc
    ):
        eng.execute(f"CREATE MATERIALIZED VIEW mv_s2 AS {self.Q}")
        try:
            # dim1 gains dk=3: fact (4, 7.0, 3, 9) still dangles on d2
            eng.execute("INSERT INTO mv_sd1 VALUES (3, 'north')")
            self._check(spark, eng, "mv_s2", self.Q)
            # dim2 gains dk=9: the fdk2=9 fact finally joins through
            eng.execute("INSERT INTO mv_sd2 VALUES (9, 'ice')")
            self._check(spark, eng, "mv_s2", self.Q)
            assert ("north", "ice", 1, 7.0, 7.0) in {
                tuple(r) for r in spark.table("mv_s2").collect()
            }
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_s2")

    def test_all_three_tables_change_in_one_refresh(self, spark, eng, ssrc):
        # exercises the old-prefix/new-suffix anchoring: the fact delta
        # must see BOTH new dim rows, the dim1 delta the OLD fact and
        # NEW dim2, the dim2 delta the OLD fact and OLD dim1 — any
        # other anchoring double- or under-counts the cross terms
        eng.execute(f"CREATE MATERIALIZED VIEW mv_s3 AS {self.Q}")
        try:
            eng.execute("INSERT INTO mv_sf VALUES (7, 9.0, 3, 9)")
            eng.execute("INSERT INTO mv_sd1 VALUES (3, 'north')")
            eng.execute("INSERT INTO mv_sd2 VALUES (9, 'ice')")
            self._check(spark, eng, "mv_s3", self.Q)
            # ('north','ice') counts the OLD dangling fact AND the new
            # one exactly once each
            assert ("north", "ice", 2, 16.0, 8.0) in {
                tuple(r) for r in spark.table("mv_s3").collect()
            }
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_s3")

    def test_fact_differential_and_dim_rewrite(self, spark, eng, ssrc):
        eng.execute(f"CREATE MATERIALIZED VIEW mv_s4 AS {self.Q}")
        try:
            eng.execute("DELETE FROM mv_sf WHERE fid = 2")
            self._check(spark, eng, "mv_s4", self.Q)
            # dim rewrite migrates every east row to a renamed group
            eng.execute(
                "UPDATE mv_sd1 SET region = 'euro' WHERE d1k = 1"
            )
            self._check(spark, eng, "mv_s4", self.Q)
            groups = {
                r["region"] for r in spark.table("mv_s4").collect()
            }
            assert "euro" in groups and "east" not in groups
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_s4")

    def test_minmax_hybrid_on_star(self, spark, eng, ssrc):
        eng.execute(f"CREATE MATERIALIZED VIEW mv_s5 AS {self.QMM}")
        try:
            eng.execute("INSERT INTO mv_sf VALUES (8, 99.0, 1, 1)")
            self._check(spark, eng, "mv_s5", self.QMM)
            # delete the max: its group must recompute from the base
            eng.execute("DELETE FROM mv_sf WHERE fid = 8")
            self._check(spark, eng, "mv_s5", self.QMM)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_s5")

    def test_snowflake_chain_link(self, spark, eng, ssrc):
        # dim2 links to dim1 (not the fact): chain validation accepts
        # any earlier table as the ON's left side
        loc = tempfile.mkdtemp(prefix="swl_mvsn_")
        spark.sql(
            f"CREATE TABLE mv_sd1x (d1xk INT, zone STRING) "
            f"USING parquet LOCATION '{loc}'"
        )
        eng.execute("INSERT INTO mv_sd1x VALUES (1, 'z-a'), (2, 'z-b')")
        q = (
            "SELECT zone, count(*) AS n, sum(amt) AS total FROM mv_sf "
            "JOIN mv_sd1 ON fdk1 = d1k JOIN mv_sd1x ON d1k = d1xk "
            "GROUP BY zone"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv_s6 AS {q}")
        try:
            eng.execute("INSERT INTO mv_sf VALUES (9, 3.0, 2, 1)")
            eng.execute("INSERT INTO mv_sd1x VALUES (3, 'z-c')")
            self._check(spark, eng, "mv_s6", q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_s6")
            spark.sql("DROP TABLE IF EXISTS mv_sd1x")

    def test_having_defs_fall_back_loudly(self, spark, eng, ssrc):
        # HAVING views maintain correctly through FULL refresh only:
        # incremental would need all-group aggregate state (a group
        # below the threshold is absent from the view but must still
        # accumulate), which the state sidecar doesn't carry — so the
        # shape is excluded from parse_incremental and INCREMENTAL
        # demands a full REFRESH instead of silently mis-merging
        q = (
            "SELECT region, count(*) AS n FROM mv_sf "
            "JOIN mv_sd1 ON fdk1 = d1k GROUP BY region "
            "HAVING count(*) > 1"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv_s8 AS {q}")
        try:
            from swanlake_spark.errors import InvalidArgument

            eng.execute("INSERT INTO mv_sf VALUES (20, 2.0, 2, 1)")
            with pytest.raises(InvalidArgument, match="full REFRESH|REFRESH"):
                eng.execute("REFRESH MATERIALIZED VIEW mv_s8 INCREMENTAL")
            eng.execute("REFRESH MATERIALIZED VIEW mv_s8")
            assert {
                tuple(r) for r in spark.table("mv_s8").collect()
            } == self._full(spark, q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_s8")

    def test_shared_column_any_pair_falls_back(self, spark, eng, ssrc):
        loc = tempfile.mkdtemp(prefix="swl_mvsh_")
        spark.sql(
            f"CREATE TABLE mv_sd2x (d2xk INT, product STRING) "  # clash
            f"USING parquet LOCATION '{loc}'"
        )
        eng.execute("INSERT INTO mv_sd2x VALUES (1, 'dup')")
        q = (
            "SELECT region, count(*) AS n FROM mv_sf "
            "JOIN mv_sd1 ON fdk1 = d1k JOIN mv_sd2 ON fdk2 = d2k "
            "JOIN mv_sd2x ON fdk2 = d2xk GROUP BY region"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv_s7 AS {q}")
        try:
            from swanlake_spark.errors import InvalidArgument

            with pytest.raises(InvalidArgument, match="full REFRESH"):
                eng.execute("REFRESH MATERIALIZED VIEW mv_s7 INCREMENTAL")
            eng.execute("REFRESH MATERIALIZED VIEW mv_s7")
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_s7")
            spark.sql("DROP TABLE IF EXISTS mv_sd2x")


class TestMatviewApproxCountDistinct:
    """r7: approx_count_distinct maintained through a mergeable
    DataSketches HLL state column (matview._acd_specs). HLL registers
    are per-item maxima, so union is exactly partition/order
    independent — incremental and full refresh produce bit-identical
    estimates. At the small cardinalities here the sketch is exact, so
    parity against a plain recompute also holds; the large-cardinality
    test pins incremental == translated-full instead."""

    def _full(self, spark, q):
        return {tuple(r) for r in spark.sql(q).collect()}

    def _check(self, spark, eng, name, q):
        eng.execute(f"REFRESH MATERIALIZED VIEW {name} INCREMENTAL")
        assert {
            tuple(r) for r in spark.table(name).collect()
        } == self._full(spark, q)

    def test_acd_appends_fold(self, spark, eng, src):
        q = ("SELECT day, approx_count_distinct(id) AS u, "
             "count(*) AS n FROM mv_src GROUP BY day")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_acd AS {q}")
        try:
            eng.execute(
                "INSERT INTO mv_src VALUES (4, 40.0, 'd1'), "
                "(4, 41.0, 'd1'), (5, 1.0, 'd3')"  # dup id in d1
            )
            self._check(spark, eng, "mv_acd", q)
            eng.execute("INSERT INTO mv_src VALUES (6, 2.0, 'd3')")
            self._check(spark, eng, "mv_acd", q)
            assert eng.query(
                "REFRESH MATERIALIZED VIEW mv_acd INCREMENTAL"
            ).affected_rows == 0
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_acd")

    def test_acd_deletes_route_through_recompute(self, spark, eng, src):
        q = ("SELECT day, approx_count_distinct(id) AS u "
             "FROM mv_src GROUP BY day")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_acdd AS {q}")
        try:
            eng.execute("INSERT INTO mv_src VALUES (9, 9.0, 'd1')")
            eng.execute("REFRESH MATERIALIZED VIEW mv_acdd INCREMENTAL")
            # removing a distinct member must LOWER the estimate — only
            # the recompute path can do that for a sketch
            eng.execute_update("DELETE FROM mv_src WHERE id = 9")
            self._check(spark, eng, "mv_acdd", q)
            # retire a whole group
            eng.execute_update("DELETE FROM mv_src WHERE day = 'd2'")
            self._check(spark, eng, "mv_acdd", q)
            assert "d2" not in {
                r["day"] for r in spark.table("mv_acdd").collect()
            }
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_acdd")

    def test_acd_composes_with_avg_and_minmax(self, spark, eng, src):
        q = ("SELECT day, approx_count_distinct(id) AS u, "
             "avg(amt) AS mean, max(amt) AS hi FROM mv_src GROUP BY day")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_acdc AS {q}")
        try:
            eng.execute(
                "INSERT INTO mv_src VALUES (7, 70.0, 'd2'), (8, 0.5, 'd2')"
            )
            self._check(spark, eng, "mv_acdc", q)
            eng.execute_update("UPDATE mv_src SET amt = 7.5 WHERE id = 7")
            self._check(spark, eng, "mv_acdc", q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_acdc")

    def test_acd_on_join_view(self, spark, eng):
        import tempfile as _tf

        floc = _tf.mkdtemp(prefix="swl_mvaf_")
        dloc = _tf.mkdtemp(prefix="swl_mvad_")
        spark.sql(
            f"CREATE TABLE mv_acd_f (uid INT, dk INT) "
            f"USING parquet LOCATION '{floc}'"
        )
        spark.sql(
            f"CREATE TABLE mv_acd_d (dkey INT, grp STRING) "
            f"USING parquet LOCATION '{dloc}'"
        )
        eng.execute(
            "INSERT INTO mv_acd_f VALUES (1, 1), (2, 1), (2, 2), (3, 2)"
        )
        eng.execute("INSERT INTO mv_acd_d VALUES (1, 'g1'), (2, 'g2')")
        q = ("SELECT grp, approx_count_distinct(uid) AS u "
             "FROM mv_acd_f JOIN mv_acd_d ON dk = dkey GROUP BY grp")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_acdj AS {q}")
        try:
            eng.execute("INSERT INTO mv_acd_f VALUES (4, 1), (2, 1)")
            self._check(spark, eng, "mv_acdj", q)
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_acdj")
            spark.sql("DROP TABLE IF EXISTS mv_acd_f")
            spark.sql("DROP TABLE IF EXISTS mv_acd_d")

    def test_acd_large_cardinality_incremental_equals_full(
        self, spark, eng
    ):
        # beyond sketch exactness (~100k distinct): the incremental
        # fold must equal the TRANSLATED full recompute bit-for-bit
        # (union of register maxima == registers of the full scan)
        import tempfile as _tf

        loc = _tf.mkdtemp(prefix="swl_mval_")
        spark.sql(
            f"CREATE TABLE mv_acd_big (k STRING, v BIGINT) "
            f"USING parquet LOCATION '{loc}'"
        )
        eng.execute(
            "INSERT INTO mv_acd_big "
            "SELECT concat('k', id % 3), id FROM RANGE(100000) t(id)"
        )
        q = ("SELECT k, approx_count_distinct(v) AS u "
             "FROM mv_acd_big GROUP BY k")
        eng.execute(f"CREATE MATERIALIZED VIEW mv_acdl AS {q}")
        try:
            eng.execute(
                "INSERT INTO mv_acd_big "
                "SELECT concat('k', id % 3), id "
                "FROM RANGE(50000, 130000) t(id)"
            )
            eng.execute("REFRESH MATERIALIZED VIEW mv_acdl INCREMENTAL")
            translated = {
                tuple(r)
                for r in spark.sql(
                    "SELECT k, coalesce(hll_sketch_estimate("
                    "hll_sketch_agg(v)), 0) AS u "
                    "FROM mv_acd_big GROUP BY k"
                ).collect()
            }
            got = {tuple(r) for r in spark.table("mv_acdl").collect()}
            assert got == translated
        finally:
            eng.execute("DROP MATERIALIZED VIEW mv_acdl")
            spark.sql("DROP TABLE IF EXISTS mv_acd_big")
