"""Structured Streaming mirrors of the reference's batch-incremental
patterns (SURVEY §2.11 I1-I5).

The reference has no true streaming — its incremental semantics are
high-watermark extracts (I1), day-grain idempotent reloads (I2), a
mutable snapshot table (I3), a polling file daemon with a persisted
offset (I4, load_metadata_json_daemon.py:13-37) and an SCD flag flip
(I5). Here those become: checkpointed file-source streams with
Trigger.AvailableNow (each file processed exactly once, resumable),
foreachBatch merge maintenance of snapshot tables, and window-dedup
SCD recomputation — the idiomatic Spark equivalents.
"""

from innercircle_etl_spark.streaming.incremental import (  # noqa: F401
    run_available_now,
    stream_ndjson_dir,
)
