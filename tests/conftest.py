"""Shared fixtures: one SparkSession + one DuckDB connection per run.

The DuckDB connection pre-registers every synthetic table as a view,
mirroring the driver's oracle harness.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from innercircle_etl_spark.plans.registry import TABLES
from innercircle_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
