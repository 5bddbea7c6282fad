"""Vector column expressions for embedding similarity.

All folds are left-to-right (`F.aggregate`), which matches DuckDB's
``list_reduce`` exactly — double results are bit-identical, so exact
value-hash oracles work even on floating point (verified
empirically). Inputs are cast float→double (exact) first.

Scale: these are JVM column expressions — no Python. For very high
dims or huge candidate sets, the same dot product vectorizes well in
a pandas UDF over numpy (batch matrix multiply); keep that variant in
mind past ~1k dims.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i, left-to-right fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; assumes non-zero vectors."""
    return dot(a, b) / (norm(a) * norm(b))


def scale(a: Column, factor: float) -> Column:
    return F.transform(a, lambda x: x * F.lit(factor))
