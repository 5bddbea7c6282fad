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

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_factor(
    df: DataFrame,
    key: str | Column,
    shuffle_partitions: int | None = None,
    min_salts: int = 1,
    max_salts: int = 256,
) -> int:
    """Size a salt factor from the measured key distribution — the
    loop-closer between the q4_key_skew_report diagnostic and the
    salted operators below (static salt constants under-split a
    pathological key and over-split a uniform one).

    A key is pathological when it exceeds its balanced shuffle share
    1/P (P = shuffle partitions): its reducer holds top1_share * P
    times the average load. Spreading it over
    ``ceil(top1_share * P)`` salts brings every sub-key back under
    the balanced share, so that is the computed factor, clamped to
    [min_salts, max_salts]. (The Herfindahl view agrees: 1/hhi is
    the effective key count, and ceil(P * hhi) = ceil(P / eff_keys)
    is within a constant of the top-1 rule; top-1 is the binding
    constraint because ONE oversized reducer sets the stage's wall
    clock.)

    Cost: one map-side-combinable count per key + a 1-row collect —
    the same driver-bounded-metadata class as a watermark read. At
    100TB run it on a sample or reuse a maintained q4 profile table
    rather than re-scanning per query."""
    sp = df.sparkSession
    if shuffle_partitions is None:
        shuffle_partitions = int(
            sp.conf.get("spark.sql.shuffle.partitions")
        )
    prof = (
        df.groupBy(F.col(key).alias("__k") if isinstance(key, str) else key.alias("__k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_cnt"),
        )
        .collect()[0]
    )
    if not prof["n_rows"]:
        return max(1, min_salts)
    top1_share = prof["max_cnt"] / prof["n_rows"]
    needed = math.ceil(top1_share * shuffle_partitions)
    return max(min_salts, min(max_salts, needed))


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


def salted_agg(
    fact: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    salt_src: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase salted aggregation for pathologically skewed group
    keys: phase 1 aggregates on (keys, salt) — the hot key's rows
    spread over ``n_salts`` reducers — phase 2 combines the partials
    on keys alone (n_salts rows per key, trivial).

    ``aggs`` maps output column name → (combiner, phase-1 column),
    where combiner ∈ {'sum', 'min', 'max'} is the phase-2 merge (the
    algebraic-aggregate re-combine: counts re-sum, sums re-sum, mins
    re-min, maxes re-max; express avg as sum/count in the caller).
    Result is IDENTICAL to the plain groupBy — only the shuffle
    distribution changes — so the plain-groupBy SQL is the oracle.

    Note Spark's own partial aggregation already handles hot keys for
    single-level aggs (map-side combine). The explicit two-phase form
    is the one to reach for when the agg must pass through a
    non-combinable stage (collect_list, exact distinct via a first
    dedup, a pandas UDAF) — the salt bounds each task's group size.
    """
    combiners = {"sum": F.sum, "min": F.min, "max": F.max}
    bad = [c for c, (comb, _) in aggs.items() if comb not in combiners]
    if bad:
        raise ValueError(f"salted_agg: unknown combiner for {bad}")
    salt = F.pmod(F.hash(salt_src), F.lit(n_salts)).alias("__salt")
    phase1 = fact.withColumn("__salt", salt).groupBy(
        *keys, "__salt"
    ).agg(*[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()])
    return phase1.groupBy(*keys).agg(
        *[
            combiners[comb](F.col(f"__p_{name}")).alias(name)
            for name, (comb, _) in aggs.items()
        ]
    )
