"""Property-based check of merge_into against an executable Python
model of SQL MERGE semantics: for random unique-keyed target/source
tables, the operator must equal the spec —

  matched & delete_cond      -> row deleted
  matched & not delete_cond  -> row updated from source
  unmatched target           -> kept unchanged
  unmatched source           -> inserted

Hypothesis drives the table contents (including the all-deleted,
all-inserted, and empty edges); each example is a real Spark plan.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from innercircle_etl_spark.operators.merge import merge_into

_table = st.dictionaries(
    st.integers(0, 15), st.integers(-5, 5), min_size=0, max_size=8
)


def _model(target: dict, source: dict) -> set:
    out = {}
    for k, v in target.items():
        if k in source:
            if source[k] < 0:  # delete_cond: negative source value
                continue
            out[k] = source[k]
        else:
            out[k] = v
    for k, v in source.items():
        if k not in target:
            out[k] = v
    return {(k, v) for k, v in out.items()}


@given(target=_table, source=_table)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_into_matches_model(spark, target, source):
    schema = "k int, v int"
    tdf = spark.createDataFrame(list(target.items()) or [], schema)
    sdf = spark.createDataFrame(list(source.items()) or [], schema)
    got = {
        (r["k"], r["v"])
        for r in merge_into(
            tdf,
            sdf,
            ["k"],
            update_cols=["v"],
            delete_cond=F.col("v") < 0,
        ).collect()
    }
    assert got == _model(target, source)
