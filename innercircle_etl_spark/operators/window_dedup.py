"""Window-ranking dedup family.

Re-expresses the reference's pervasive
``row_number() over (partition by k order by ts) = 1`` idiom
(reference: update_etl.py:129-140 latest contract, :430-437 first
acquisition, :491-507 ownership snapshot, :723-729 latest floor;
SURVEY §2.6 W1/W2/W3).

Scale note: a window over (keys, order) shuffles once on the keys —
same cost as the groupBy it replaces. For latest/first-per-key we
instead use ``max_by``/``min_by`` aggregate forms when the caller
only needs one row's columns, which enables partial (map-side)
aggregation and avoids materializing the full sorted window. The
window form is kept for top-N (N>1) where aggregation can't express
the result.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _rank_filter(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    n: int,
    func=F.row_number,
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rnk", func().over(w))
        .filter(F.col("__rnk") <= n)
        .drop("__rnk")
    )


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep the row with the greatest ``order_col`` per key group (W1).

    ``tiebreakers`` pins determinism when order_col ties (the
    reference leaves ties unspecified — SURVEY §7 'what's hard').
    """
    order = [F.col(order_col).desc()] + [F.col(t).desc() for t in tiebreakers]
    return _rank_filter(df, keys, order, 1)


def _extremum_per_key_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str],
    extremum,
) -> DataFrame:
    order_struct = F.struct(
        F.col(order_col), *[F.col(t) for t in tiebreakers]
    )
    others = [c for c in df.columns if c not in keys]
    row = extremum(
        F.struct(*[F.col(c) for c in others]), order_struct
    ).alias("__row")
    out = df.groupBy(*[F.col(k) for k in keys]).agg(row)
    return out.select(
        *[
            F.col(c) if c in keys else F.col(f"__row.{c}").alias(c)
            for c in df.columns
        ]
    )


def latest_per_key_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """``latest_per_key`` as a ``max_by`` AGGREGATE (the module-doc
    form): keeps the same row per key group as the window form
    PROVIDED (order_col, *tiebreakers) is unique within each group
    (the callers pass a row-unique tiebreaker chain, so the greatest
    order-struct is exactly the window's rank-1 row) and none of the
    order columns is null in a group's winning row's comparison
    (max_by skips null-ordering rows).

    Why it exists (guide §2.3 'aggregate before you shuffle'): the
    window form shuffles EVERY row and sorts each partition; the
    aggregate form partially collapses per key on the map side, so
    the exchange carries ~|keys| rows instead of |rows| and the sort
    disappears. At a dup factor of d the shuffle shrinks ~d× — the
    win grows with corpus size, while the window form's sort cost
    does too. Column order and types are preserved (struct
    round-trip)."""
    return _extremum_per_key_agg(
        df, keys, order_col, tiebreakers, F.max_by
    )


def first_per_key_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """``first_per_key`` as a ``min_by`` aggregate — the W2 twin of
    ``latest_per_key_agg``; same uniqueness/non-null precondition,
    same map-side-collapse rationale."""
    return _extremum_per_key_agg(
        df, keys, order_col, tiebreakers, F.min_by
    )


def first_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep the row with the smallest ``order_col`` per key group (W2)."""
    order = [F.col(order_col).asc()] + [F.col(t).asc() for t in tiebreakers]
    return _rank_filter(df, keys, order, 1)


def top_n_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    n: int,
) -> DataFrame:
    """Top-N rows per group by explicit order columns (W3;
    reference: top-3 insights per collection update_etl.py:1186-1193)."""
    return _rank_filter(df, keys, order, n)
