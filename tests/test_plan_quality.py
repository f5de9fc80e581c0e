"""Physical-plan quality guards: the properties that make the engine
viable at 100 TB must not silently regress (SCALE.md "Execution model").

Checks the optimized plans of representative queries for predicate
pushdown into the Parquet scan, column pruning, broadcast selection for
small dimensions, and whole-stage codegen coverage.
"""

import re

import pytest


def _formatted_plan(df):
    je = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return je.explainString(mode)


@pytest.fixture(scope="module")
def warehouse(engine, sf_dir):
    engine.attach_warehouse(sf_dir)
    return engine


class TestPlanQuality:
    def test_filter_pushdown_reaches_scan(self, warehouse):
        df = warehouse.query(
            "SELECT l_orderkey FROM lineitem WHERE l_quantity < 5.0"
        ).df
        plan = _formatted_plan(df)
        assert re.search(r"PushedFilters: \[[^\]]*LessThan\(l_quantity", plan), (
            "l_quantity filter must be pushed into the parquet scan"
        )

    def test_column_pruning(self, warehouse):
        df = warehouse.query("SELECT l_orderkey, l_quantity FROM lineitem").df
        plan = _formatted_plan(df)
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m, plan
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"l_orderkey", "l_quantity"}, (
            f"scan must read only projected columns, got {cols}"
        )

    def test_small_dimension_broadcast(self, warehouse):
        df = warehouse.query(
            "SELECT n_name, count(*) AS c FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name"
        ).df
        plan = _formatted_plan(df)
        assert "BroadcastHashJoin" in plan, "small dims must broadcast"
        assert "CartesianProduct" not in plan

    def test_two_phase_aggregation(self, warehouse):
        # map-side partial aggregation before the shuffle: the property
        # that keeps groupBy shuffle volume at O(groups), not O(rows)
        df = warehouse.query(
            "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem "
            "GROUP BY l_returnflag"
        ).df
        plan = _formatted_plan(df)
        assert "partial_sum" in plan, "map-side combine missing"
        assert plan.index("partial_sum") < plan.index("Exchange") or (
            "HashAggregate" in plan.split("Exchange")[0]
        )

    def test_limit_becomes_ordered_limit(self, warehouse):
        df = warehouse.query(
            "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 5"
        ).df
        plan = _formatted_plan(df)
        assert "TakeOrderedAndProject" in plan, (
            "ORDER BY + LIMIT must plan as top-K, not global sort"
        )


class TestPKProbePruning:
    def test_pk_probe_scan_is_key_range_bounded(self, engine):
        """The PK existence probe must push the batch key range into the
        parquet scan (row-group pruning) instead of scanning the table."""
        import tempfile
        import uuid

        from swanlake_spark import constraints

        t = f"pkp_{uuid.uuid4().hex[:8]}"
        loc = tempfile.mkdtemp(prefix="swl_pkp_")
        engine.execute(
            f"CREATE TABLE {t} (id INT PRIMARY KEY, v STRING) USING parquet LOCATION '{loc}'"
        )
        engine.execute(f"INSERT INTO {t} VALUES (1, 'a'), (50, 'b'), (900, 'c')")
        stats = {"_min_id": 40, "_max_id": 60}
        probe = constraints.bounded_existing_probe(engine.spark, t, ["id"], stats)
        plan = _formatted_plan(probe)
        assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(id,40\)", plan), plan
        assert re.search(r"LessThanOrEqual\(id,60\)", plan), plan

    def test_pk_checks_still_enforced(self, engine):
        import tempfile
        import uuid

        import pytest

        from swanlake_spark.errors import InvalidArgument

        t = f"pkp_{uuid.uuid4().hex[:8]}"
        loc = tempfile.mkdtemp(prefix="swl_pkp_")
        engine.execute(
            f"CREATE TABLE {t} (id INT PRIMARY KEY, v STRING) USING parquet LOCATION '{loc}'"
        )
        engine.execute(f"INSERT INTO {t} VALUES (1, 'a'), (2, 'b')")
        with pytest.raises(InvalidArgument, match="PRIMARY KEY"):
            engine.execute(f"INSERT INTO {t} VALUES (2, 'dup')")
        with pytest.raises(InvalidArgument, match="PRIMARY KEY"):
            engine.execute(f"INSERT INTO {t} VALUES (7, 'x'), (7, 'y')")
        engine.execute(f"INSERT INTO {t} VALUES (3, 'c')")
        assert engine.query(f"SELECT count(*) AS c FROM {t}").collect()[0].c == 3
