"""Every warehouse table conforms to its declared schema contract
after load (including the nanos→timestamp conversion on events)."""

from __future__ import annotations

import pytest

from innercircle_etl_spark.plans.registry import TABLES, load
from innercircle_etl_spark.schemas import EXPECTED_SCHEMAS, schema_drift


@pytest.mark.parametrize("table", TABLES)
def test_table_matches_contract(spark, sf_dir, table):
    assert table in EXPECTED_SCHEMAS
    drift = schema_drift(load(spark, sf_dir, table), table)
    assert not drift, drift
