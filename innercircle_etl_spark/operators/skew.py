"""Skew-mitigated join (SURVEY §4 X11).

At 100TB a handful of hot keys (burn addresses, the zero address,
marketplace contracts — the reference's blacklist in const.py:6-9 is
exactly a hot-key list) can put one shuffle partition hours behind
the rest. Two mitigations compose here:

1. AQE skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on
   in session.py) — handles moderate skew automatically at runtime.
2. Explicit salting for the pathological case: spread each fact row
   across ``n_salts`` sub-keys derived deterministically from a
   high-cardinality column, replicate the (small) build side once per
   salt, and join on (key, salt). Result set is IDENTICAL to the
   plain join — only the shuffle distribution changes — so the
   plain-join SQL remains the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    salt_src: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``keys`` with an ``n_salts``-way
    salt: fact rows hash ``salt_src`` (any high-cardinality fact
    column) into a salt; every dim row is replicated once per salt
    value. The hot key's rows land on n_salts partitions instead of
    one.

    Deterministic (pmod of the source column, no rand()) so results
    are reproducible and oracle-checkable.

    Only fact-preserving join types are allowed: for right/full (or
    right-semi) variants the replicated dim rows that match no fact
    row would surface once per salt, breaking the identical-result
    contract."""
    allowed = ("inner", "left", "left_outer", "left_semi", "left_anti")
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} not supported; use one of {allowed}"
        )
    salt = F.pmod(F.hash(salt_src), F.lit(n_salts)).alias("__salt")
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    out = fact_s.join(dim_s, [*keys, "__salt"], how)
    return out.drop("__salt")
