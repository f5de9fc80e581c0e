"""YCSB-shaped access patterns — the reference's second benchmark
workload (``/root/reference/tests/benchbase/ycsb-flight-sql.xml:24`` —
50% point read / 15% scan plus write ops). The write ops (UPDATE /
DELETE / INSERT) are covered by the oracle corpus (Q37–Q39) and the DML
tests; here are the deterministic read patterns, oracle-checked and
benchmarked.

The ``orders`` table stands in for YCSB's usertable (``o_orderkey`` as
the key column). Keys are anchored to ``min(o_orderkey)`` so the queries
are deterministic at every scale factor.

Scale notes: the point read's key predicate is pushed into the Parquet
scan (row-group/page skipping on the o_orderkey min/max stats); the scan
pattern is a pushed range + TakeOrderedAndProject — neither shuffles
more than the top-N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from swanlake_spark.queries.oracle import QuerySpec, ensure_tables

YCSB_QUERIES: dict[str, QuerySpec] = {}


def _add(name: str, build, oracle: str | None) -> None:
    YCSB_QUERIES[name] = QuerySpec(name, build, oracle)


def _point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)
        """
    )


_add(
    "ycsb_point_read",
    _point_read,
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)
    """,
)


def _scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderkey >= (SELECT min(o_orderkey) FROM orders)
        ORDER BY o_orderkey
        LIMIT 100
        """
    )


_add(
    "ycsb_scan",
    _scan,
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey >= (SELECT min(o_orderkey) FROM orders)
    ORDER BY o_orderkey
    LIMIT 100
    """,
)
