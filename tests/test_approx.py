"""Accuracy contracts for the approximate operators. Since round 4
each of these queries computes its own approx-vs-exact bound check
IN-QUERY (so the driver's oracle sees it too); these tests pin the
same invariants locally and cross-check the exact side against the
independent exact queries."""

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
        assert a["n_rows"] == e["n_rows"]
        # the exact side embedded in a1b must agree with a1 exactly
        assert a["n_parts_exact"] == e["n_parts"]
        assert a["n_supps_exact"] == e["n_supps"]
        # the in-query HLL bound (rsd=2% within 5%) must hold
        assert a["parts_within_bound"] is True, flag
        assert a["supps_within_bound"] is True, flag


def test_approx_percentile_within_bound(spark, sf_dir):
    """approx_percentile at accuracy 10000 must land within 2% of
    the exact discrete 20th percentile for every group (computed
    in-query); the embedded exact side must match a8 exactly."""
    a8 = {
        r["l_returnflag"]: r["floor_price"]
        for r in QUERIES["a8_percentile_disc"](spark, sf_dir).collect()
    }
    rows = QUERIES["a8b_approx_percentile"](spark, sf_dir).collect()
    assert {r["l_returnflag"] for r in rows} == set(a8)
    for r in rows:
        assert r["p20_exact"] == a8[r["l_returnflag"]]
        assert r["approx_within_bound"] is True, r


def test_lloyd_quality_contracts(spark, sf_dir):
    """The Lloyd-IVF bound-check queries must report their contracts
    satisfied: full top-3 retrieved and top-1 cosine within margin of
    brute force for every query; mean recall@3 above floor for both
    codebooks."""
    for r in QUERIES["ann_ivf_lloyd"](spark, sf_dir).collect():
        assert r["n_retrieved"] == 3, r
        assert r["top1_within_margin"] is True, r
    rows = QUERIES["ann_recall_lloyd"](spark, sf_dir).collect()
    assert len(rows) == 1
    assert rows[0]["n_queries"] == 10
    assert rows[0]["sampled_recall_ok"] is True
    assert rows[0]["lloyd_recall_ok"] is True
