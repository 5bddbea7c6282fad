"""Exact discrete percentile (SURVEY §2.5 A8, §4 custom-1).

The reference's daily floor price is
``percentile_disc(0.2) WITHIN GROUP (ORDER BY price_per_token)``
(update_etl.py:456-476): the *smallest actual element* whose
cume_dist >= p — not an interpolated value. Interpolating
(``percentile``/``approx_percentile``) would fail a value-hash oracle,
so we use Spark's native ``percentile_disc`` SQL aggregate (Spark
3.5+) via ``F.expr``.

Scale: percentile_disc is a sort-based aggregate within each group —
one shuffle on the group keys, no global sort. For very hot single
groups, pre-aggregate to (value, count) pairs first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def percentile_disc(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    p: float,
    out_col: str = "percentile_disc",
) -> DataFrame:
    """Group by ``keys``, emit the discrete p-th percentile of
    ``value_col`` as ``out_col``."""
    agg = F.expr(
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY {value_col})"
    ).alias(out_col)
    return df.groupBy(*keys).agg(agg)
