"""Property-based check of the version-guarded CDC merge
(operators/cdc.py) against an executable model: for a random
changelog randomly PARTITIONED INTO BATCHES (any order — the
delivery interleavings a real stream produces), applying the
batches through versioned_cdc_merge must converge to the model's
global last-writer-wins state, independent of the batch split.

Model: sort all ops by (ts, event_id); the final per-key state is
the last op — bal for U, tombstone for D; keys never touched keep
their snapshot value.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from innercircle_etl_spark.operators.cdc import versioned_cdc_merge

_KEYS = st.integers(0, 5)
_ops = st.lists(
    st.tuples(
        _KEYS,  # key
        st.integers(0, 20),  # ts
        st.booleans(),  # is_delete
        st.integers(-3, 3),  # new_bal
    ),
    min_size=0,
    max_size=12,
)
_snapshot_keys = st.sets(_KEYS, max_size=4)
# batch split points: how many ops go in each successive batch
_splits = st.lists(st.integers(1, 4), min_size=1, max_size=4)


def _model(snap_keys, ops):
    # state[k] = (bal, deleted, version); snapshot rows start at
    # version (-1, -1). The globally newest op per key wins; a
    # delete's retained bal is irrelevant (filtered from output).
    state = {k: (float(k), False, (-1, -1)) for k in snap_keys}
    for eid, (k, ts, is_del, bal) in enumerate(ops):
        cur = state.get(k)
        if cur is None or (ts, eid) > cur[2]:
            kept_bal = 0.0 if is_del else float(bal)
            state[k] = (kept_bal, is_del, (ts, eid))
    return {
        k: round(v[0], 6) for k, v in state.items() if not v[1]
    }


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snap_keys=_snapshot_keys, ops=_ops, splits=_splits)
def test_cdc_converges_for_any_batch_split(spark, snap_keys, ops, splits):
    snap = spark.createDataFrame(
        [(k, float(k), False, -1, -1) for k in snap_keys] or [],
        "k long, bal double, deleted boolean, v_ts long, v_eid long",
    )
    # assign globally unique, time-correlated event ids so the model
    # and the merge share one total order
    rows = [
        (k, ts, eid, "D" if is_del else "U", float(bal))
        for eid, (k, ts, is_del, bal) in enumerate(ops)
    ]
    state = snap
    i = 0
    for size in splits:
        chunk = rows[i : i + size]
        i += size
        if not chunk:
            break
        batch = spark.createDataFrame(
            chunk,
            "k long, ts_us long, event_id long, op string,"
            " new_bal double",
        )
        state = versioned_cdc_merge(state, batch).localCheckpoint(
            eager=True
        )
    # any unconsumed tail becomes one final batch
    if i < len(rows):
        batch = spark.createDataFrame(
            rows[i:],
            "k long, ts_us long, event_id long, op string,"
            " new_bal double",
        )
        state = versioned_cdc_merge(state, batch)
    got = {
        r["k"]: round(r["bal"], 6)
        for r in state.collect()
        if not r["deleted"]
    }
    assert got == _model(snap_keys, ops)
