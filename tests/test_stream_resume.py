"""Checkpoint resume semantics: a drained stream picks up ONLY files
that arrived after the last drain — no reprocessing (the daemon
contract the reference implements with last_uploaded_timestamp.json).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import types as T

from innercircle_etl_spark.streaming import (
    run_available_now,
    stream_ndjson_dir,
)

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.scratch")

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("wave", T.LongType()),
    ]
)


def test_three_wave_resume_no_reprocessing(spark):
    base = f"{SCRATCH}/resume_test"
    shutil.rmtree(base, ignore_errors=True)
    src, sink, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"

    def drain():
        run_available_now(
            stream_ndjson_dir(spark, src, _SCHEMA), ckpt, sink_path=sink
        )

    def sink_rows():
        try:
            return spark.read.schema(_SCHEMA).parquet(sink).collect()
        except Exception:
            return []

    # wave 1
    spark.range(100).selectExpr("id", "0 AS wave").write.mode(
        "append"
    ).json(src)
    drain()
    assert len(sink_rows()) == 100

    # wave 2: only the new file is processed
    spark.range(100, 150).selectExpr("id", "1 AS wave").write.mode(
        "append"
    ).json(src)
    drain()
    rows = sink_rows()
    assert len(rows) == 150
    assert len({r["id"] for r in rows}) == 150  # no duplicates

    # wave 3: nothing new arrived -> nothing reprocessed
    drain()
    assert len(sink_rows()) == 150
