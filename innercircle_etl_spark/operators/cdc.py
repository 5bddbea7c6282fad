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

import glob
import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def versioned_cdc_merge(
    snapshot: DataFrame, batch: DataFrame
) -> DataFrame:
    """Pure-DataFrame merge of one changelog batch into a versioned
    snapshot; returns the new snapshot frame (same schema)."""
    w = Window.partitionBy("k").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    latest = (
        batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "k",
            F.col("ts_us").alias("c_ts"),
            F.col("event_id").alias("c_eid"),
            "op",
            "new_bal",
        )
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
    """Crash recovery: if a previous swap died between moving the
    live snapshot aside and moving the new one into place, the table
    exists only at ``<snap_path>_old`` — restore it. Never touches a
    live snapshot (the ``_old`` copy is strictly older). Also sweeps
    orphaned ``_tmp_{batch_id}`` dirs: a crash between the tmp write
    and the final rename leaves a stale tmp snapshot that a retry
    under a DIFFERENT batch_id (or a reader-only recovery) would
    otherwise leak forever."""
    old = f"{snap_path}_old"
    if not os.path.exists(snap_path) and os.path.exists(old):
        os.rename(old, snap_path)
    for stale in glob.glob(f"{snap_path}_tmp_*"):
        shutil.rmtree(stale, ignore_errors=True)


def apply_cdc_batch(
    snap_path: str, batch: DataFrame, batch_id: int
) -> None:
    """foreachBatch body: merge ``batch`` into the parquet snapshot
    at ``snap_path`` and swap it into place crash-safely. Idempotent
    — re-applying a batch finds no strictly-newer versions.

    Swap discipline (no single-syscall atomic dir replace on POSIX):
    write to ``_tmp``, rename live → ``_old``, rename ``_tmp`` →
    live, drop ``_old``. At every crash point at least one complete
    snapshot directory survives: before the first rename it is the
    live dir; between the renames it is ``_old`` (restored by
    ``recover_snapshot`` on the next batch / reader); after it is
    the new live dir. A failed write cleans up its ``_tmp`` dir."""
    sp = batch.sparkSession
    old = f"{snap_path}_old"
    recover_snapshot(snap_path)
    cur = sp.read.parquet(snap_path)
    merged = versioned_cdc_merge(cur, batch)
    tmp = f"{snap_path}_tmp_{batch_id}"
    try:
        merged.write.mode("overwrite").parquet(tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)  # stale copy from a
    # crash after the new snapshot landed — safe to drop
    os.rename(snap_path, old)
    os.rename(tmp, snap_path)
    shutil.rmtree(old, ignore_errors=True)
