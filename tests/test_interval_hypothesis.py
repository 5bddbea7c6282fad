"""Property-based check of interval_bucket_join against the
quadratic model: for random interval sets and event times —
including zero-length windows, bucket-boundary-exact endpoints, and
events landing precisely on window edges — the bucketed equi-join
must produce EXACTLY the pairs {(i, e) : start_i <= t_e < end_i}.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from innercircle_etl_spark.operators.interval_join import (
    interval_bucket_join,
)

_BASE = datetime.datetime(2024, 3, 1, 0, 0, 0)

# times in MINUTES over a 2-day range; hour buckets → windows cross
# 0-to-many bucket boundaries, endpoints can sit exactly on them
_minutes = st.integers(0, 2 * 24 * 60)
_intervals = st.lists(
    st.tuples(_minutes, st.integers(0, 12 * 60)),  # (start, length)
    min_size=0,
    max_size=8,
)
_events = st.lists(_minutes, min_size=0, max_size=12)


def _t(m: int) -> datetime.datetime:
    return _BASE + datetime.timedelta(minutes=m)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(iv=_intervals, ev=_events)
def test_bucketed_equals_quadratic_model(spark, iv, ev):
    intervals = spark.createDataFrame(
        [(i, _t(s), _t(s + length)) for i, (s, length) in enumerate(iv)],
        "iid long, s timestamp_ntz, e timestamp_ntz",
    )
    events = spark.createDataFrame(
        [(j, _t(m)) for j, m in enumerate(ev)],
        "eid long, t timestamp_ntz",
    )
    got = sorted(
        (r["iid"], r["eid"])
        for r in interval_bucket_join(
            intervals, events, "s", "e", "t", bucket_unit="hour"
        ).collect()
    )
    model = sorted(
        (i, j)
        for i, (s, length) in enumerate(iv)
        for j, m in enumerate(ev)
        if s <= m < s + length
    )
    assert got == model
