"""As-of / first-match range join (SURVEY §2.4 J7).

Reference semantics (update_etl.py:699-748; create_shadow_trade.sql:93-135):
for each left row (a "buy"), find the earliest right row (a "sell")
with matching equi-keys and ``right.on_col >= left.on_col``; keep the
left row even when no match exists (left outer as-of).

Spark-first design: non-equi join conditions force a broadcast or
cartesian strategy, so instead we express the as-of as
  equi-join on keys  →  range filter  →  window first-match
which shuffles both sides once on the equi keys — the plan Catalyst
would pick for the equivalent SQL, and the one that scales: state per
key group, no cross product. When the right side is small,
``F.broadcast`` the right input before calling.

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
    """
    if direction not in ("forward", "backward"):
        raise ValueError(direction)

    lcols = left.columns
    # Tag row identity so the window can collapse back to one row per left row.
    left_t = left.withColumn("__lid", F.monotonically_increasing_id())
    # Track the EXACT set of renamed right columns (not a name-prefix
    # test) so a left column that happens to start with "r_" is never
    # mistaken for right payload. Internal names use a collision-proof
    # "__r_" prefix, stripped to the documented "r_" on output.
    r_payload = [c for c in right.columns if c not in keys]
    rren = [
        F.col(c).alias(c if c in keys else f"__r_{c}") for c in right.columns
    ]
    right_t = right.select(*rren)
    r_on = right_on if right_on in keys else f"__r_{right_on}"

    joined = left_t.join(right_t, on=list(keys), how="left")
    lcol, rcol = F.col(left_on), F.col(r_on)
    if direction == "forward":
        cond = rcol > lcol if strict else rcol >= lcol
        order = [F.col(r_on).asc_nulls_last()]
    else:
        cond = rcol < lcol if strict else rcol <= lcol
        order = [F.col(r_on).desc_nulls_last()]
    order += [
        F.col(t if t in keys else f"__r_{t}").asc_nulls_last()
        for t in right_tiebreakers
    ]

    # Null out non-matching right rows instead of filtering, so a left
    # row whose only partner rows miss the range still survives.
    internal = [f"__r_{c}" for c in r_payload]
    masked = joined.select(
        *[c for c in joined.columns if c not in internal],
        *[F.when(cond, F.col(c)).alias(c) for c in internal],
    )
    w = Window.partitionBy("__lid").orderBy(*order)
    out = (
        masked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__lid")
    )
    if how == "inner":
        out = out.filter(F.col(r_on).isNotNull())
    clash = [c for c in lcols if c in (f"r_{p}" for p in r_payload)]
    if clash:
        raise ValueError(
            f"asof_join output name collision on {clash}: left already "
            "has columns named like renamed right payload"
        )
    return out.select(
        *lcols,
        *[F.col(f"__r_{c}").alias(f"r_{c}") for c in r_payload],
    )
