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


def apply_cdc_batch(
    snap_path: str, batch: DataFrame, batch_id: int
) -> None:
    """foreachBatch body: merge ``batch`` into the parquet snapshot
    at ``snap_path`` and atomically swap it into place. Idempotent —
    re-applying a batch finds no strictly-newer versions."""
    sp = batch.sparkSession
    cur = sp.read.parquet(snap_path)
    merged = versioned_cdc_merge(cur, batch)
    tmp = f"{snap_path}_tmp_{batch_id}"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(snap_path, ignore_errors=True)
    os.rename(tmp, snap_path)
