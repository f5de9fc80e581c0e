"""Shared test fixtures: one local SparkSession per test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SWL_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from swanlake_spark.config import EngineConfig
    from swanlake_spark.engine import Engine

    import tempfile

    cfg = EngineConfig(
        app_name="swanlake-spark-tests",
        cpus=8,
        shuffle_partitions=8,
        # per-run warehouse: managed-table names never collide with
        # leftover directories from earlier runs
        warehouse_dir=tempfile.mkdtemp(prefix="swl_wh_"),
    )
    eng = Engine(config=cfg)
    eng.spark.sparkContext.setLogLevel("ERROR")
    yield eng.spark
    eng.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from swanlake_spark.engine import Engine

    return Engine(spark=spark)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
