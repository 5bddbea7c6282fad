"""File-source streaming helpers (reference I4: the JSON-polling
daemon with a persisted high-watermark, load_metadata_json_daemon.py:
13-37; S7 incremental file-watch source).

The daemon's contract — every file processed exactly once, progress
survives restarts, new files picked up on the next run — is exactly
Structured Streaming's file source + checkpoint + Trigger.AvailableNow.
No custom watermark bookkeeping: the checkpoint's file log replaces
last_uploaded_timestamp.json.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_ndjson_dir(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Streaming NDJSON source with an explicit schema (inference is
    both disallowed for streams and a reference fragility we drop,
    SURVEY §1.3). maxFilesPerTrigger keeps micro-batches bounded —
    the daemon's 1000-file batching knob."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1000)
        .json(path)
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint: str,
    sink_path: Optional[str] = None,
    foreach_batch: Optional[Callable[[DataFrame, int], None]] = None,
) -> None:
    """Drain everything currently available, then stop (the daemon's
    single poll cycle). Progress persists in `checkpoint`; calling
    again later processes only files that arrived in between.

    Either appends to a parquet `sink_path` or hands each micro-batch
    to `foreach_batch` (snapshot-merge maintenance, I3).
    """
    writer = stream_df.writeStream.option(
        "checkpointLocation", checkpoint
    ).trigger(availableNow=True)
    if foreach_batch is not None:
        query = writer.foreachBatch(foreach_batch).start()
    else:
        query = writer.format("parquet").option("path", sink_path).start()
    query.awaitTermination()
