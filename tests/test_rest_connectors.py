"""S8/S9 REST connector machinery (sources/rest.py): retry loop,
rate limiter pacing, flaky-transport determinism, distributed fetch
row-exactness, and sink batching/at-least-once capture."""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pytest
from pyspark.sql import types as T

from innercircle_etl_spark.plans.registry import load
from innercircle_etl_spark.sources.rest import (
    TransientHTTPError,
    _RateLimiter,
    _retry_loop,
    flaky_transport,
    ndjson_capture_post,
    parquet_page_transport,
    rest_sink,
    rest_source,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SCRATCH = "/root/repo/.scratch/rest_tests"


def test_retry_loop_recovers_then_gives_up():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise TransientHTTPError("429")
        return "ok"

    assert _retry_loop(flaky, max_retries=3, backoff_s=0.001) == "ok"
    assert calls["n"] == 3

    def always():
        raise TransientHTTPError("500")

    with pytest.raises(TransientHTTPError):
        _retry_loop(always, max_retries=2, backoff_s=0.001)


def test_rate_limiter_paces_calls():
    lim = _RateLimiter(per_sec=50.0)  # 20ms gap
    t0 = time.monotonic()
    for _ in range(5):
        lim.wait()
    # 4 enforced gaps of >=20ms (first call free)
    assert time.monotonic() - t0 >= 0.08 - 0.005
    # zero/disabled limiter never sleeps
    t0 = time.monotonic()
    lim0 = _RateLimiter(0.0)
    for _ in range(1000):
        lim0.wait()
    assert time.monotonic() - t0 < 0.05


def test_flaky_transport_fails_once_per_matching_page():
    inner = lambda p: [{"page": p}]  # noqa: E731
    t = flaky_transport(inner, fail_every=2)
    with pytest.raises(TransientHTTPError):
        t(0)
    assert t(0) == [{"page": 0}]  # second attempt succeeds
    assert t(1) == [{"page": 1}]  # non-matching page never fails


def test_rest_source_fetches_every_row_exactly_once(spark):
    path = f"{SF_DIR}/customer.parquet"
    cols = ["c_custkey", "c_acctbal"]
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(path).num_rows
    n_pages = (n_rows + 50 - 1) // 50
    got = rest_source(
        spark,
        flaky_transport(
            parquet_page_transport(path, 50, cols), fail_every=3
        ),
        n_pages,
        schema,
        max_retries=2,
        backoff_s=0.001,
    )
    expect = load(spark, SF_DIR, "customer").select(*cols)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_rest_source_exhausted_retries_surface(spark):
    def dead(page: int):
        raise TransientHTTPError("permanent 429")

    schema = T.StructType([T.StructField("x", T.LongType())])
    df = rest_source(spark, dead, 1, schema, max_retries=1, backoff_s=0.001)
    with pytest.raises(Exception, match="permanent 429"):
        df.count()


def test_rest_sink_batches_and_round_trips(spark):
    out = f"{SCRATCH}/sink_batches"
    shutil.rmtree(out, ignore_errors=True)
    sup = load(spark, SF_DIR, "supplier").select("s_suppkey", "s_name")
    n = sup.count()
    rest_sink(sup, ndjson_capture_post(out), batch_size=3)
    files = glob.glob(f"{out}/batch-*.jsonl")
    rows = []
    for f in files:
        with open(f) as fh:
            batch = [json.loads(line) for line in fh]
        assert 1 <= len(batch) <= 3  # batch_size honored
        rows.extend(batch)
    assert len(rows) == n
    assert sorted(r["s_suppkey"] for r in rows) == sorted(
        r["s_suppkey"] for r in sup.collect()
    )
