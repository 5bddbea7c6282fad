"""Reader-ATOMIC table versioning: the manifest-pointer discipline.

``atomic_swap.swap_into_place`` is crash-safe but not reader-atomic:
between rename(live -> old) and rename(tmp -> live) there is a
window where no directory exists at the table path, so a CONCURRENT
session listing it mid-swap hits FileNotFound and must
recover+retry (the documented contract). That contract is fine for
single-session pipelines, but the persisted-index story is exactly
the multi-session case: one session maintains the index while later
(or overlapping) sessions load it.

This module removes the window with the pointer scheme every table
format (Delta/Iceberg/Hudi) builds on, reduced to its POSIX core:

    <table>/v_<tag>/...        immutable, fully-written version dirs
    <table>/CURRENT            one line: the live version's dir name

A writer stages the new version to ``v_<tag>`` (crash -> orphan dir,
live pointer untouched), then flips CURRENT via ``os.replace`` of a
same-directory temp file — rename(2) onto an existing path is ATOMIC
on POSIX: every reader that opens CURRENT sees either the old line
or the new line, never a half-written one and never a missing table.
Readers resolve CURRENT -> dir and read an immutable, complete
directory; the previous version is RETAINED one publish (an
in-flight reader that resolved the old pointer keeps a valid dir
under its feet — snapshot isolation at depth 1), and only versions
older than that are swept.

Crash matrix (every step, proven in tests/test_crash_recovery.py):
  - during stage write: CURRENT untouched, readers unaffected; the
    orphan ``v_<tag>`` is swept on the next publish.
  - after stage, before flip: same — publish is all-or-nothing at
    the pointer.
  - during flip: os.replace is atomic; no intermediate state exists.
  - after flip, before sweep: extra old versions linger, readers
    correct; swept next publish. A RETRY of the same tag after this
    crash point finds CURRENT already at its version and returns as
    an idempotent success — it must NOT restage (the prior attempt's
    flip made the dir live; rewriting it would reopen the very
    window this module removes).

Concurrency contract: readers are unlimited and never coordinate;
WRITERS are single-at-a-time per table (the daily-maintenance shape
every registered user of this module has). The pointer gives
reader-atomicity, not writer serialization — two concurrent
publishers race last-writer-wins at the flip and the loser's sweep
can reap the winner's staged dir, exactly the multi-writer problem
the real table formats solve with optimistic CAS on the manifest.
Serialize writers externally (one scheduler slot per table).

At 100 TB this is the manifest discipline the atomic_swap module
docstring points at for object stores: on S3/GCS the "rename" is a
small CURRENT object PUT (last-writer-wins, read-after-write
consistent), and version dirs are immutable prefixes — the same
crash-point analysis carries over verbatim.

Reference parity: the reference leans on Postgres transactional DDL
for this atomicity (etl_utls.py:303-313); this is the
filesystem/object-store equivalent with explicit reader semantics.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "CURRENT"


def current_version(table: str) -> str | None:
    """The live version's dir name, or None for an empty table."""
    try:
        with open(os.path.join(table, _POINTER)) as f:
            name = f.read().strip()
        return name or None
    except FileNotFoundError:
        return None


def current_path(table: str) -> str | None:
    v = current_version(table)
    return os.path.join(table, v) if v else None


def read_current(spark: SparkSession, table: str) -> DataFrame:
    """Load the live version. Never racy: the pointer read and the
    dir it names are both atomic-complete by construction."""
    path = current_path(table)
    if path is None:
        raise FileNotFoundError(f"versioned table {table} has no CURRENT")
    return spark.read.parquet(path)


def publish_version(
    df: DataFrame,
    table: str,
    tag: object,
    partition_by: str | None = None,
) -> str:
    """Write ``df`` as version ``v_<tag>`` and atomically flip the
    pointer to it. Returns the new version dir name. Retains the
    immediately-previous version for in-flight readers; sweeps
    everything older, plus any orphaned version dirs a crashed
    publish left un-pointered (identified as: not current, not
    previous — safe under the single-writer contract because a
    version only becomes visible at the pointer flip, so an
    un-pointered dir has no readers).

    Idempotent retry: if CURRENT already names ``v_<tag>``, a prior
    attempt crashed AFTER its flip — the publish succeeded; return
    without touching the LIVE dir (restaging it would delete the
    directory readers are on, the exact window this module removes).
    Tags therefore name versions: publishing different data under a
    live tag is a caller bug, not an update."""
    os.makedirs(table, exist_ok=True)
    prev = current_version(table)
    vname = f"v_{tag}"
    vdir = os.path.join(table, vname)
    if vname == prev:
        return vname  # retried publish; flip already happened
    if os.path.exists(vdir):  # orphan from a crashed publish re-using
        shutil.rmtree(vdir)  # the tag — never pointered, no readers
    try:
        w = df.write.mode("overwrite")
        if partition_by is not None:
            w = w.partitionBy(partition_by)
        w.parquet(vdir)
    except BaseException:
        shutil.rmtree(vdir, ignore_errors=True)
        raise
    # the flip: stage the pointer beside CURRENT (same filesystem),
    # then os.replace — atomic rename-onto-existing on POSIX
    tmp_ptr = os.path.join(table, f".{_POINTER}.tmp")
    with open(tmp_ptr, "w") as f:
        f.write(vname + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_ptr, os.path.join(table, _POINTER))
    # retention: keep new + previous; sweep older/orphaned versions
    keep = {vname, prev} - {None}
    for entry in os.listdir(table):
        if entry.startswith("v_") and entry not in keep:
            shutil.rmtree(os.path.join(table, entry), ignore_errors=True)
    return vname
