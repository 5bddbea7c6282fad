"""Interval-overlap join via time-bucket equi-join (J12).

Spark has no native plan for an interval join with NO equi key —
the optimizer's only options are BroadcastNestedLoopJoin (small
side only) or a cartesian. The scale form quantizes time into
buckets: each interval explodes into the buckets it covers (fan-out
bounded by interval length / bucket size, not by data), each event
maps to exactly one bucket, and an ordinary equi-join on the bucket
key carries the EXACT half-open predicate as its join-side filter.
An event maps to one bucket and an interval covers each bucket at
most once, so the output needs no dedup pass.

Bucket granularity is the tuning knob: finer buckets mean more
fan-out rows per interval but tighter candidate sets; match it to
the typical interval length (a 6-hour window over hour buckets
emits 7 rows). Both sides shuffle once on the bucket key; at 100TB
this is a standard partitioned hash join whose key also lines up
with calendar partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_INTERVAL = {
    "minute": "INTERVAL 1 MINUTE",
    "hour": "INTERVAL 1 HOUR",
    "day": "INTERVAL 1 DAY",
}


def interval_bucket_join(
    intervals: DataFrame,
    events: DataFrame,
    left_start: str,
    left_end: str,
    right_time: str,
    bucket_unit: str = "hour",
) -> DataFrame:
    """Join every ``events`` row to every ``intervals`` row whose
    half-open window [left_start, left_end) contains ``right_time``.

    Returns all interval columns + all event columns (minus the
    internal bucket key). Column names must not collide across the
    two inputs apart from the generated ``__bucket``."""
    if bucket_unit not in _UNIT_INTERVAL:
        raise ValueError(
            f"bucket_unit must be one of {sorted(_UNIT_INTERVAL)}"
        )
    step = F.expr(_UNIT_INTERVAL[bucket_unit])
    # end bucket is included: a half-open end mid-bucket still
    # admits events from that bucket
    buckets = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket_unit, F.col(left_start)),
                F.date_trunc(bucket_unit, F.col(left_end)),
                step,
            )
        ),
    )
    tagged = events.withColumn(
        "__bucket", F.date_trunc(bucket_unit, F.col(right_time))
    )
    return (
        buckets.join(tagged, "__bucket")
        .filter(
            (F.col(right_time) >= F.col(left_start))
            & (F.col(right_time) < F.col(left_end))
        )
        .drop("__bucket")
    )
