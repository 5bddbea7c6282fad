"""S8/S9: REST API source and sink (SURVEY §2.1).

The reference pulls third-party metadata with driver-side
``requests`` loops (etl_utls.py:372-428 — per-contract GETs with
429/404 handling) and pushes address lists with a single PUT
(adhoc queries/parsiq_push_address.py:10-14). Neither shape
survives scale: one driver fetching 10M pages serially is days of
wall clock, and one process POSTing a 100TB-derived result is a
non-starter.

The Spark-first forms here:

- ``rest_source``: the PAGE SPACE becomes a DataFrame
  (``spark.range(n_pages)``), and each executor task fetches its
  pages through an injected ``transport(page) -> list[dict]`` with
  per-task token-bucket rate limiting and exponential-backoff
  retries (the reference's 429 path, done properly). Records land
  against an EXPLICIT schema — schema-on-read, never inference.
  At cluster scale this is a thousand-way parallel crawl whose
  aggregate request rate is ``rate_limit * n_tasks`` — size the
  per-task limit as global_budget / parallelism.

- ``rest_sink``: ``df.foreachPartition`` drains each partition in
  ``batch_size`` chunks through an injected ``post(payload) ->
  None`` with the same rate limit + retry envelope. Executors post
  in parallel; the driver never materializes the result.

Transports are INJECTED because the engine contract is the
distributed orchestration, not the socket: production uses
``http_json_transport`` (stdlib urllib — no extra deps), tests and
the registered correctness queries use ``parquet_page_transport`` /
``ndjson_capture_post`` which page a local parquet file and capture
posted payloads to local NDJSON — deterministic, network-free, and
end-to-end checkable against the DuckDB oracle.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

Transport = Callable[[int], "list[dict]"]
Post = Callable[[str], None]


class TransientHTTPError(Exception):
    """Retryable transport failure (the 429/5xx class)."""


def _retry_loop(fn, max_retries: int, backoff_s: float):
    """Call ``fn`` with up to ``max_retries`` retries on
    TransientHTTPError, sleeping backoff_s * 2^attempt between
    tries — the standard jitterless exponential backoff (add jitter
    at the transport layer if a real service needs it)."""
    for attempt in range(max_retries + 1):
        try:
            return fn()
        except TransientHTTPError:
            if attempt == max_retries:
                raise
            time.sleep(backoff_s * (2**attempt))


class _RateLimiter:
    """Per-task token pacing: at most ``per_sec`` calls per second
    within one task. Cluster-wide rate = per_sec * concurrent tasks;
    divide the service budget by expected parallelism when
    configuring."""

    def __init__(self, per_sec: float):
        self.min_gap = 1.0 / per_sec if per_sec > 0 else 0.0
        self.last = 0.0

    def wait(self) -> None:
        if self.min_gap <= 0:
            return
        now = time.monotonic()
        gap = self.min_gap - (now - self.last)
        if gap > 0:
            time.sleep(gap)
        self.last = time.monotonic()


def rest_source(
    spark: SparkSession,
    transport: Transport,
    n_pages: int,
    schema: T.StructType,
    rate_limit_per_sec: float = 0.0,
    max_retries: int = 3,
    backoff_s: float = 0.05,
    tasks: int | None = None,
) -> DataFrame:
    """Distributed paginated REST read: fetch pages 0..n_pages-1
    across executors, yield rows under an explicit schema.

    The page frame is repartitioned to ``tasks`` (default: the
    session's default parallelism, capped at n_pages) so each task
    owns a contiguous page budget and its own rate limiter."""
    n_tasks = tasks or min(
        n_pages, spark.sparkContext.defaultParallelism
    ) or 1
    pages = spark.range(n_pages).repartition(n_tasks)
    names = [f.name for f in schema.fields]

    def fetch(batches) -> Iterator:
        import pandas as pd

        limiter = _RateLimiter(rate_limit_per_sec)
        for pdf in batches:
            rows: list[dict] = []
            for page in pdf["id"]:
                limiter.wait()
                recs = _retry_loop(
                    lambda p=int(page): transport(p),
                    max_retries,
                    backoff_s,
                )
                rows.extend(recs)
            yield pd.DataFrame(
                {n: [r.get(n) for r in rows] for n in names}
            )

    return pages.mapInPandas(fetch, schema)


def rest_sink(
    df: DataFrame,
    post: Post,
    batch_size: int = 500,
    rate_limit_per_sec: float = 0.0,
    max_retries: int = 3,
    backoff_s: float = 0.05,
) -> None:
    """Batched REST write: every partition drains in ``batch_size``
    JSON-array payloads through ``post`` (the reference's single
    driver PUT, distributed). Executors post concurrently; payloads
    are JSON text so the transport is engine-agnostic.

    Delivery contract is at-least-once (a task retry re-posts its
    partition): real services want an idempotency key per record,
    which the payload rows carry implicitly (their natural key)."""
    columns = df.columns

    def drain(rows) -> None:
        limiter = _RateLimiter(rate_limit_per_sec)
        buf: list[dict] = []

        def flush() -> None:
            if not buf:
                return
            payload = json.dumps(buf)
            limiter.wait()
            _retry_loop(lambda: post(payload), max_retries, backoff_s)
            buf.clear()

        for row in rows:
            buf.append({c: row[c] for c in columns})
            if len(buf) >= batch_size:
                flush()
        flush()

    df.foreachPartition(drain)


# ------------------------------------------------------- transports


def http_json_transport(
    url_template: str, headers: dict[str, str] | None = None,
    timeout_s: float = 30.0,
):
    """Production GET transport: ``url_template.format(page=p)`` →
    parsed JSON list. stdlib urllib so no extra dependency; raises
    TransientHTTPError on 429/5xx so the retry loop engages."""

    def fetch(page: int) -> list[dict]:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url_template.format(page=page), headers=headers or {}
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:  # pragma: no cover - network
            if e.code == 429 or e.code >= 500:
                raise TransientHTTPError(str(e)) from e
            raise

    return fetch


def parquet_page_transport(
    path: str, page_size: int, columns: list[str]
):
    """Deterministic network-free transport: page ``p`` serves rows
    [p*page_size, (p+1)*page_size) of a local parquet file — what a
    paginated REST endpoint over that dataset would return. Each
    fetch opens the file metadata and decodes ONLY the row groups
    overlapping its page, so total read work is O(rows + pages *
    row_group_overlap), not O(pages * rows)."""

    def fetch(page: int) -> list[dict]:
        import pyarrow.parquet as pq

        lo, hi = page * page_size, (page + 1) * page_size
        pf = pq.ParquetFile(path)
        groups, start = [], 0
        for g in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(g).num_rows
            if start < hi and start + n > lo:
                groups.append((g, start))
            start += n
        if not groups:
            return []
        tbl = pf.read_row_groups(
            [g for g, _ in groups], columns=columns
        )
        first_start = groups[0][1]
        return tbl.slice(lo - first_start, page_size).to_pylist()

    return fetch


def flaky_transport(inner: Transport, fail_every: int):
    """Test wrapper: raises TransientHTTPError on the FIRST attempt
    of every ``fail_every``-th page (per-process memo), so retries
    are exercised deterministically."""
    seen: set[int] = set()

    def fetch(page: int) -> list[dict]:
        if page % fail_every == 0 and page not in seen:
            seen.add(page)
            raise TransientHTTPError(f"injected 429 for page {page}")
        return inner(page)

    return fetch


def ndjson_capture_post(out_dir: str):
    """Capture sink transport: each posted JSON-array payload lands
    as one NDJSON file (uuid name — concurrent executor posts never
    collide). Reading the directory back with an explicit schema
    closes the delivery loop for the oracle check."""

    def post(payload: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        rows = json.loads(payload)
        tmp = os.path.join(out_dir, f".{uuid.uuid4().hex}.tmp")
        final = os.path.join(out_dir, f"batch-{uuid.uuid4().hex}.jsonl")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, final)  # atomic publish

    return post
