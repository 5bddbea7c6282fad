"""Accuracy bound for the approximate-distinct operator: HLL++ at
rsd=2% must land within 5% of the exact answer on every group (no
cross-engine hash oracle exists for sketches, so the bound IS the
correctness contract)."""

from __future__ import annotations

from innercircle_etl_spark.plans import QUERIES


def test_approx_distinct_within_bound(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r
        for r in QUERIES["a1b_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in QUERIES["a1_count_distinct"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, e in exact.items():
        a = approx[flag]
        assert a["n_rows"] == e["n_rows"]  # plain count stays exact
        for ak, ek in (
            ("n_parts_approx", "n_parts"),
            ("n_supps_approx", "n_supps"),
        ):
            rel = abs(a[ak] - e[ek]) / max(e[ek], 1)
            assert rel < 0.05, (flag, ak, a[ak], e[ek])


def test_approx_percentile_within_bound(spark, sf_dir):
    """approx_percentile at accuracy 10000 must land within 2% of
    the exact discrete 20th percentile for every group."""
    from pyspark.sql import functions as F

    from innercircle_etl_spark.operators.percentiles import percentile_disc
    from innercircle_etl_spark.plans.registry import load

    li = load(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["p20"]
        for r in percentile_disc(
            li, ["l_returnflag"], "l_extendedprice", 0.2, out_col="p20"
        ).collect()
    }
    approx = {
        r["l_returnflag"]: r["p20_approx"]
        for r in QUERIES["a8b_approx_percentile"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, e in exact.items():
        rel = abs(approx[flag] - e) / abs(e)
        assert rel < 0.02, (flag, approx[flag], e)
