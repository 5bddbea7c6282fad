"""Operator-vs-model checks: salted aggregation must equal the plain
groupBy on random inputs, and the as-of join must equal a brute-force
first-match model — both driven by hypothesis over small tables.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from innercircle_etl_spark.operators.asof import asof_join
from innercircle_etl_spark.operators.skew import salted_agg

_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-100, 100)),
    min_size=1,
    max_size=25,
)


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_salted_agg_equals_plain_groupby(spark, rows):
    df = spark.createDataFrame(rows, "k int, v int")
    got = {
        (r["k"], r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": ("sum", F.count(F.lit(1))),
                "s": ("sum", F.sum("v")),
                "mn": ("min", F.min("v")),
                "mx": ("max", F.max("v")),
            },
            salt_src=F.col("v"),
            n_salts=4,
        ).collect()
    }
    want = set()
    for k in {k for k, _ in rows}:
        vs = [v for kk, v in rows if kk == k]
        want.add((k, len(vs), sum(vs), min(vs), max(vs)))
    assert got == want


_left = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 30)),
    min_size=1,
    max_size=10,
    unique=True,
)
_right = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(0, 9)),
    min_size=0,
    max_size=12,
    unique=True,
)


@given(left=_left, right=_right)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_first_match_model(spark, left, right):
    """forward as-of: each left row pairs with the right row at
    min(t) among {t_r >= t_l} for its key, ties broken by the pinned
    tiebreaker column, keeping unmatched left rows."""
    ldf = spark.createDataFrame(left, "k int, t int")
    rdf = spark.createDataFrame(right, "k int, t int, x int")
    got = {
        (r["k"], r["t"], r["r_t"], r["r_x"])
        for r in asof_join(
            ldf,
            rdf,
            ["k"],
            left_on="t",
            right_on="t",
            direction="forward",
            right_tiebreakers=["x"],
        ).collect()
    }
    want = set()
    for lk, lt in left:
        cands = sorted(
            [(rt, rx) for rk, rt, rx in right if rk == lk and rt >= lt]
        )
        if cands:
            want.add((lk, lt, cands[0][0], cands[0][1]))
        else:
            want.add((lk, lt, None, None))
    assert got == want
