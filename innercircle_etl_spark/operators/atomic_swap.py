"""Crash-safe directory-swap discipline for parquet table rewrites.

POSIX has no single-syscall atomic directory replace, so every
"rewrite the table" site (CDC snapshot, streaming snapshot merge,
truncate+rebuild, day-partition repair) follows the same four-step
protocol, factored here so each site inherits the SAME proof:

    write new data to a TMP dir  (crash → live table untouched)
    rename live  -> OLD          (crash → OLD holds the table;
                                  recover() restores it)
    rename TMP   -> live         (crash → live holds the NEW table,
                                  stale OLD swept on next recover)
    drop OLD

At every crash point at least one complete copy of the table exists
on disk, and ``recover_table`` / ``recover_partitions`` returns the
path to a readable state (the newest complete copy). Partition-grain
swaps keep their TMP/OLD dirs HIDDEN (leading dot) inside the table
directory so a reader that races a crash never parses a half-swapped
partition as data — Spark and DuckDB both skip dot-prefixed dirs.

At 100TB this is the HDFS/POSIX discipline (renames are O(1)
metadata ops). On S3-style object stores rename is copy — there the
same protocol runs against a manifest (table formats exist for that
reason); the crash-point analysis is identical.

Reference parity: the reference's update loop leans on Postgres
transactional DDL (etl_utls.py:303-313 delete+reload inside a txn);
this module is the filesystem equivalent of that atomicity.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
from urllib.parse import unquote

from pyspark.sql import DataFrame


def recover_table(path: str) -> None:
    """Restore ``path`` from ``<path>_old`` if a crash stranded the
    table there, and sweep any orphaned ``<path>_tmp_*`` staging dirs
    (a crash between the tmp write and the final rename leaks them
    under a different tag otherwise). Never touches a live table —
    the ``_old`` copy is strictly older."""
    old = f"{path}_old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    for stale in glob.glob(f"{path}_tmp_*"):
        shutil.rmtree(stale, ignore_errors=True)


def swap_into_place(path: str, tmp: str) -> None:
    """Steps 2-4 of the protocol: move the complete table at ``tmp``
    into ``path``. Caller guarantees ``tmp`` is fully written.

    Concurrent-reader contract (round-13 advice item 3): the swap is
    crash-SAFE, not reader-ATOMIC — between rename(path -> old) and
    rename(tmp -> path) there is a window where no live dir exists
    at ``path``, so a DIFFERENT session that lists the path mid-swap
    can hit FileNotFound. A complete copy always exists on disk
    (that's the crash-safety claim), so readers racing a writer must
    call ``recover_table`` + retry on miss — or the table must use
    the partition-grain variant below, whose hidden .old/.staging
    dirs never leave the table dir unlistable. Single-session
    pipelines (every registered query: build then read in one
    driver) never race themselves; the contract matters only for the
    persisted-index story where a later session loads what an
    earlier one maintains."""
    old = f"{path}_old"
    shutil.rmtree(old, ignore_errors=True)  # stale copy from a crash
    # after a previous swap completed — safe to drop
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def write_replace(
    df: DataFrame,
    path: str,
    tag: object,
    partition_by: str | None = None,
) -> None:
    """Crash-safe full-table overwrite: write ``df`` to
    ``<path>_tmp_<tag>`` then swap it into place. A failed write
    cleans its tmp dir and leaves the live table untouched.
    ``partition_by`` writes the table hive-partitioned on that
    column (the persisted-IVF cell layout) — the swap discipline is
    unchanged: the whole partitioned tree stages and swaps as one
    unit (contrast ``overwrite_partitions_atomic``, which swaps
    partition dirs individually and touches only those present)."""
    recover_table(path)
    tmp = f"{path}_tmp_{tag}"
    try:
        w = df.write.mode("overwrite")
        if partition_by is not None:
            w = w.partitionBy(partition_by)
        w.parquet(tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    swap_into_place(path, tmp)


# ---------------------------------------------------- partition grain


def recover_partitions(table_path: str) -> None:
    """Partition-grain recovery: restore any ``.old_<part>`` dir whose
    live partition is missing, then sweep staging dirs and any
    ``.drop_<part>`` residue an interrupted ``drop_partitions_atomic``
    left behind. The two hidden prefixes have OPPOSITE recovery
    semantics on purpose: a stranded ``.old_`` means an overwrite
    died mid-swap and the partition must come BACK; a stranded
    ``.drop_`` means a drop's rename already landed — the partition
    is deleted the instant it leaves the listable namespace — so the
    residue is always swept, never restored. Idempotent; call before
    reading a table written via ``overwrite_partitions_atomic`` /
    ``drop_partitions_atomic`` if a crash is suspected."""
    if not os.path.isdir(table_path):
        return
    for entry in os.listdir(table_path):
        if entry.startswith(".old_"):
            live = os.path.join(table_path, entry[len(".old_") :])
            old = os.path.join(table_path, entry)
            if os.path.exists(live):
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.rename(old, live)
    for stale in glob.glob(f"{table_path}/.staging_*"):
        shutil.rmtree(stale, ignore_errors=True)
    for stale in glob.glob(f"{table_path}/.drop_*"):
        shutil.rmtree(stale, ignore_errors=True)


def overwrite_partitions_atomic(
    df: DataFrame, table_path: str, part_col: str, tag: object
) -> None:
    """Crash-safe dynamic-partition overwrite: write ``df``'s
    partitions to a hidden staging dir inside the table, then swap
    each written ``<part_col>=<value>`` dir into place with the
    rename protocol. Only the partitions PRESENT in ``df`` are
    touched — every other partition's files are never renamed, same
    contract as ``partitionOverwriteMode=dynamic`` but with no
    crash point that loses a partition (the native committer deletes
    matched partitions before its renames land).

    One Spark job writes all partitions in parallel; the swap loop is
    driver-side O(#partitions-touched) metadata renames.

    A partition whose rows should ALL disappear cannot be expressed
    here (dynamic overwrite only touches partitions present in the
    new frame — same as the native committer); pair with
    ``drop_partitions_atomic`` for emptied partitions."""
    recover_partitions(table_path)
    stage = os.path.join(table_path, f".staging_{tag}")
    try:
        df.write.mode("overwrite").partitionBy(part_col).parquet(stage)
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    for entry in sorted(os.listdir(stage)):
        if not entry.startswith(f"{part_col}="):
            continue  # _SUCCESS etc. — swept with the stage dir
        live = os.path.join(table_path, entry)
        old = os.path.join(table_path, f".old_{entry}")
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(live):
            os.rename(live, old)
        os.rename(os.path.join(stage, entry), live)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _hive_unescape(name: str) -> str:
    """Invert Spark/Hive partition-path escaping: special characters
    in partition VALUES are written as %XX dir-name escapes (space ->
    %20, '/' -> %2F, ':' -> %3A, ...). Matching dirs by their
    unescaped value keeps the drop verb correct for string partition
    columns — a raw f-string path would silently miss them
    (round-14 self-review finding 2).

    %XX runs decode as UTF-8 BYTES, not per-escape code points
    (round-14 advice item 3): Spark writes non-ASCII values raw, but
    a Hive/external writer that percent-escapes per byte writes
    ``café`` as ``caf%C3%A9`` — chr()-per-escape would read that as
    mojibake (``caf\\xc3\\xa9``) and the drop/link verbs would
    silently skip the partition.

    An escape run that is NOT valid UTF-8 (e.g. a latin-1 per-byte
    escaper's ``caf%E9``) cannot come from a ``str(value)`` target,
    so that RUN is left undecoded — but only that run (round-15
    advice item 3): each maximal %XX run decodes independently, so a
    name mixing valid escapes with one non-UTF-8 run (``a%20b%E9``)
    still gets its valid decodes (``a b%E9``) instead of losing the
    whole name to the literal-escaped form. Raising instead (the
    first cut used errors='strict') was wrong: these helpers run
    over EVERY dir entry during membership tests, so one foreign dir
    would abort drops/links of partitions it was never part of."""
    try:
        return unquote(name, errors="strict")
    except UnicodeDecodeError:
        return _ESC_RUN.sub(_unquote_run, name)


_ESC_RUN = re.compile(r"(?:%[0-9A-Fa-f]{2})+")


def _unquote_run(m: re.Match) -> str:
    try:
        return unquote(m.group(0), errors="strict")
    except UnicodeDecodeError:
        return m.group(0)


def drop_partitions_atomic(
    table_path: str, part_col: str, values: list[object]
) -> None:
    """Crash-safe partition DROP — the delete verb of the
    partition-grain CRUD set (overwrite = create/update, this =
    delete): rename each live ``<part_col>=<value>`` dir to a hidden
    ``.drop_`` dir (one atomic rename — a reader listing the table
    sees the partition either fully present or fully gone, never a
    half-deleted cell), then remove the renamed dir. Crash before a
    value's rename: that partition intact, the drop retryable; crash
    after: the partition is already deleted (it left the namespace at
    the rename) and ``recover_partitions`` sweeps the ``.drop_``
    residue. A value with no live dir is skipped — idempotent retry.

    Dir names are matched by their HIVE-UNESCAPED value (Spark
    writes ``a b`` as ``%20``-escaped ``a%20b``; a None value is the
    ``__HIVE_DEFAULT_PARTITION__`` dir), so string partition values
    drop correctly. Values compare as ``str(value)`` — pass them in
    the partition column's own type/rendering (an int column's cell
    is ``cid=7``, so 7, not 7.0).

    The dropped partition's files are never read or listed: dropping
    a cell costs O(1) driver-side metadata (one listdir + a rename
    per dropped cell) regardless of cell size — the property that
    makes kill-list deletes O(touched cells), not O(index)."""
    recover_partitions(table_path)
    if not os.path.isdir(table_path):
        return
    targets = {_HIVE_NULL if v is None else str(v) for v in values}
    prefix = f"{part_col}="
    for entry in sorted(os.listdir(table_path)):
        if not entry.startswith(prefix):
            continue
        if _hive_unescape(entry[len(prefix):]) not in targets:
            continue
        live = os.path.join(table_path, entry)
        dropped = os.path.join(table_path, f".drop_{entry}")
        shutil.rmtree(dropped, ignore_errors=True)
        os.rename(live, dropped)
        shutil.rmtree(dropped, ignore_errors=True)
