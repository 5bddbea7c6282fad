"""Bounded-state guarantee for the applyInPandasWithState snapshot
(i3b): per-key state is fixed-width, so total state rows are bounded
by the number of distinct keys — never by the number of events.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from innercircle_etl_spark.plans.registry import load
from innercircle_etl_spark.plans.streaming_queries import (
    i3b_stateful_snapshot,
)


def test_i3b_state_bounded_by_key_cardinality(spark, sf_dir):
    out = i3b_stateful_snapshot(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()

    # snapshot = exactly one row per user
    assert out.count() == n_users

    # state store never holds more rows than there are keys (and far
    # fewer than events)
    progress = i3b_stateful_snapshot.last_progress
    assert progress, "no state-operator progress captured"
    state_rows = max(
        op["numRowsTotal"] for p in progress for op in p["stateOperators"]
    )
    assert 0 < state_rows <= n_users < n_events


def test_i3b_matches_batch_latest_per_key(spark, sf_dir):
    """The stateful stream's snapshot equals the batch window
    answer (the i3 oracle shape)."""
    out = {
        (r["user_id"], r["last_event_id"], r["last_event_type"])
        for r in i3b_stateful_snapshot(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    want = {
        (r["user_id"], r["event_id"], r["event_type"])
        for r in ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .collect()
    }
    assert out == want
