"""In-flight data-quality counters via the Observation API: metrics
computed DURING a query run (no second pass over the data) — how the
quality checks attach to production jobs at 100TB, where re-scanning
for a count is as expensive as the job itself.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from innercircle_etl_spark.plans.registry import load


def test_observed_quality_counters_single_pass(spark, sf_dir):
    obs = Observation("quality")
    li = load(spark, sf_dir, "lineitem")
    out = (
        li.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("l_quantity") <= 0, 1).otherwise(0)
            ).alias("n_nonpositive_qty"),
            F.sum(
                F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)
            ).alias("n_null_dates"),
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    groups = out.collect()  # ONE action: result + metrics together
    m = obs.get
    assert m["n_rows"] == sum(r["n"] for r in groups)
    assert m["n_nonpositive_qty"] == 0
    assert m["n_null_dates"] == 0
