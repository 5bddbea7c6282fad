"""Version-guarded CDC merge (I13's core, reusable).

Streaming CDC apply cannot assume in-order delivery: a key's newest
change can arrive in an earlier micro-batch than an older one. The
snapshot therefore carries each key's applied version — (v_ts,
v_eid) — plus a ``deleted`` tombstone flag, and an incoming op wins
only if STRICTLY newer. Tombstones make deletes durable against
out-of-order older updates (the resurrect bug); a genuinely newer
update re-inserts over a tombstone. This is the merge-on-read
discipline lakehouse table formats implement, in plain DataFrames.

Snapshot schema: k, bal, deleted boolean, v_ts long, v_eid long.
Changelog batch schema: k, ts_us, event_id, op ('U'|'D'), new_bal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from innercircle_etl_spark.operators.atomic_swap import (
    recover_table,
    write_replace,
)
from innercircle_etl_spark.operators.window_dedup import latest_per_key_agg


def versioned_cdc_merge(
    snapshot: DataFrame, batch: DataFrame
) -> DataFrame:
    """Pure-DataFrame merge of one changelog batch into a versioned
    snapshot; returns the new snapshot frame (same schema)."""
    # max_by aggregate form of the rank-1 window (guide §2.3): the
    # (ts_us, event_id) chain is row-unique (event ids are unique),
    # so the greatest order-struct IS the window form's rank-1 row,
    # and the changelog collapses per key on the MAP side instead of
    # shuffling and sorting every change row (round 17; w1/w2/j9's
    # round-16 pattern).
    latest = latest_per_key_agg(
        batch, ["k"], "ts_us", tiebreakers=["event_id"]
    ).select(
        "k",
        F.col("ts_us").alias("c_ts"),
        F.col("event_id").alias("c_eid"),
        "op",
        "new_bal",
    )
    m = snapshot.join(latest, "k", "full_outer")
    newer = F.col("c_ts").isNotNull() & (
        F.col("v_ts").isNull()
        | (F.col("c_ts") > F.col("v_ts"))
        | (
            (F.col("c_ts") == F.col("v_ts"))
            & (F.col("c_eid") > F.col("v_eid"))
        )
    )
    return m.select(
        "k",
        F.when(newer & (F.col("op") == "U"), F.col("new_bal"))
        .otherwise(F.col("bal"))
        .alias("bal"),
        F.when(newer, F.col("op") == "D")
        .otherwise(F.coalesce(F.col("deleted"), F.lit(False)))
        .alias("deleted"),
        F.when(newer, F.col("c_ts"))
        .otherwise(F.coalesce(F.col("v_ts"), F.lit(-1)))
        .alias("v_ts"),
        F.when(newer, F.col("c_eid"))
        .otherwise(F.coalesce(F.col("v_eid"), F.lit(-1)))
        .alias("v_eid"),
    )


def recover_snapshot(snap_path: str) -> None:
    """Crash recovery for the CDC snapshot — the shared rename
    protocol (operators/atomic_swap.py): restore from ``_old`` if a
    swap died between its renames, sweep orphaned ``_tmp_*`` dirs."""
    recover_table(snap_path)


def apply_cdc_batch(
    snap_path: str, batch: DataFrame, batch_id: int
) -> None:
    """foreachBatch body: merge ``batch`` into the parquet snapshot
    at ``snap_path`` and swap it into place crash-safely. Idempotent
    — re-applying a batch finds no strictly-newer versions.

    The swap is the shared four-step rename protocol
    (operators/atomic_swap.write_replace): at every crash point at
    least one complete snapshot survives, and ``recover_snapshot``
    (run here and by readers) restores it."""
    sp = batch.sparkSession
    recover_table(snap_path)
    cur = sp.read.parquet(snap_path)
    merged = versioned_cdc_merge(cur, batch)
    write_replace(merged, snap_path, batch_id)
