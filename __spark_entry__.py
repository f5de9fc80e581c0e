"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query inventory lives in ``swanlake_spark/queries/`` (SURVEY.md §2.5
oracle corpus + TPC-H-shaped suite + large-scale data-pipeline
operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from swanlake_spark.queries.oracle import ORACLE_QUERIES

    return ORACLE_QUERIES["q01_agg_tpch1"].build(spark, "/root/testdata/sf0.001")


def _all_specs():
    from swanlake_spark.queries.oracle import ORACLE_QUERIES
    from swanlake_spark.queries.pipeline import PIPELINE_QUERIES
    from swanlake_spark.queries.tpch import TPCH_QUERIES
    from swanlake_spark.queries.ycsb import YCSB_QUERIES

    return {**ORACLE_QUERIES, **TPCH_QUERIES, **PIPELINE_QUERIES, **YCSB_QUERIES}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in _all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _all_specs().items()
        if spec.oracle is not None
    }
