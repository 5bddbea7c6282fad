"""As-of / first-match range join (SURVEY §2.4 J7).

Reference semantics (update_etl.py:699-748; create_shadow_trade.sql:93-135):
for each left row (a "buy"), find the earliest right row (a "sell")
with matching equi-keys and ``right.on_col >= left.on_col``; keep the
left row even when no match exists (left outer as-of).

Spark-first design — the LINEAR merge-scan form: both sides union
into one stream, shuffle ONCE on the equi keys, sort within each key
group by the time axis, and a running ``last(ignorenulls)`` window
(unbounded-preceding frame — incremental, O(group)) carries the best
candidate right row onto every left row. Nothing ever builds the
per-key left×right cross product: a hot (wallet, collection) with
10^4 buys and 10^4 sells costs 2·10^4 scanned rows, not 10^8 joined
ones. (The first implementation was equi-join → range mask → window
first-match, which explodes exactly that product before collapsing
it; the union scan replaces it with identical semantics.)

Determinism: ties on the right order column are broken by
``right_tiebreakers`` (the reference's row_number has no unique order
key — update_etl.py:710 — we pin one and document the divergence).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_on: str,
    right_on: str,
    direction: str = "forward",
    strict: bool = False,
    right_tiebreakers: Sequence[str] = (),
    how: str = "left",
) -> DataFrame:
    """Join each left row to the first right row at-or-after it.

    direction='forward': earliest right with right_on >= left_on
      (the reference's buy→first-subsequent-sell shape).
    direction='backward': latest right with right_on <= left_on
      (classic point-in-time lookup).
    strict=True uses > / < instead of >= / <=.

    Left columns are kept as-is; right columns are prefixed with
    ``r_`` unless they are join keys.

    How the scan encodes the semantics: rows sort by the time axis
    AWAY from the match direction (forward scans DESC, backward ASC),
    so the running last() at any left row has seen exactly the right
    rows on the qualifying side of it — and the most recently seen
    one is the nearest. Equal-timestamp handling is one bit: the side
    marker orders right rows before left rows iff the comparison is
    inclusive. Tiebreakers sort DESCENDING so the last-seen (winning)
    right row among equal timestamps is the tiebreaker-smallest —
    the same row the reference's row_number()=1 picks.
    """
    if direction not in ("forward", "backward"):
        raise ValueError(direction)
    keys = list(keys)

    lcols = left.columns
    l_payload = [c for c in lcols if c not in keys]
    r_payload = [c for c in right.columns if c not in keys]
    clash = [c for c in lcols if c in (f"r_{p}" for p in r_payload)]
    if clash:
        raise ValueError(
            f"asof_join output name collision on {clash}: left already "
            "has columns named like renamed right payload"
        )

    # A right row with a null order value can never satisfy the range
    # predicate — drop before the scan (mirrors the masked-join form).
    rt = right.filter(F.col(right_on).isNotNull()).select(
        *keys,
        F.col(right_on).alias("__ts"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
    )
    r_struct_t = rt.schema["__r"].dataType

    # Inclusive compare: rights sort BEFORE lefts at equal __ts so the
    # running frame (which ends at the current row) already contains
    # them; strict compare: after, so it doesn't.
    side_left = 1 if not strict else 0
    lt = left.select(
        *keys,
        F.col(left_on).alias("__ts"),
        F.lit(None).cast(r_struct_t).alias("__r"),
        F.lit(side_left).alias("__side"),
        *[F.col(c) for c in l_payload],
    )
    rt = rt.select(
        *keys,
        "__ts",
        "__r",
        F.lit(1 - side_left).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_payload
        ],
    )
    u = lt.unionByName(rt)

    ts_ord = (
        F.col("__ts").desc_nulls_last()
        if direction == "forward"
        else F.col("__ts").asc_nulls_last()
    )
    order = [ts_ord, F.col("__side").asc()] + [
        F.col("__r").getField(t).desc_nulls_first()
        for t in right_tiebreakers
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # a left row with a null order value matches nothing (the range
    # predicate is null) — mask it out of the carried candidate
    matched = u.withColumn(
        "__m",
        F.when(
            F.col("__ts").isNotNull(),
            F.last("__r", ignorenulls=True).over(w),
        ),
    )
    out = matched.filter(F.col("__side") == side_left)
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())
    return out.select(
        *lcols,
        *[F.col("__m").getField(c).alias(f"r_{c}") for c in r_payload],
    )
