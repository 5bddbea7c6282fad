"""Set operations (SURVEY §2.8 T1-T3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from innercircle_etl_spark.plans.registry import dsum, duck_dsum, load, register


@register(
    "t1_union_all_legs",
    oracle=f"""
    SELECT o_custkey, 'open' AS leg,
           {duck_dsum('o_totalprice')} AS leg_total,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_custkey
    UNION ALL
    SELECT o_custkey, 'finished' AS leg,
           {duck_dsum('o_totalprice')} AS leg_total,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_custkey
    """,
)
def t1_union_all_legs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: UNION ALL of buy-leg and sell-leg aggregates — the
    reference's insight_trx (update_etl.py:948-985). unionByName so
    column order can't silently misalign."""
    orders = load(spark, sf_dir, "orders")

    def leg(status: str, label: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .groupBy("o_custkey")
            .agg(
                dsum("o_totalprice").alias("leg_total"),
                F.count(F.lit(1)).alias("n_orders"),
            )
            .select(
                "o_custkey", F.lit(label).alias("leg"), "leg_total", "n_orders"
            )
        )

    return leg("O", "open").unionByName(leg("F", "finished"))


@register(
    "t2_except",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def t2_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: EXCEPT (distinct) — customers with orders but no finished
    orders (reference emulates with LEFT JOIN ... IS NULL,
    exclude_payment_tokens.sql:115-142)."""
    orders = load(spark, sf_dir, "orders")
    all_c = orders.select("o_custkey")
    fin_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_c.subtract(fin_c)


@register(
    "t3_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def t3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: INTERSECT — membership overlap (reference does
    set().intersection in Python, update_etl.py:1422-1425)."""
    orders = load(spark, sf_dir, "orders")
    o_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o_c.intersect(f_c)


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_T4_ORACLE = f"""
SELECT user_id,
       {", ".join(
           f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
           f" AS n_{t}" for t in _EVENT_TYPES
       )}
FROM events GROUP BY user_id
"""


@register("t4_pivot", oracle=_T4_ORACLE)
def t4_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 (beyond-parity): pivot — one column per event type, counts
    per user. The value list is EXPLICIT (``pivot(col, values)``):
    without it Spark runs an extra distinct-collect job to discover
    values, and at 100TB an unbounded pivot width is a bug, not a
    feature. Compiles to a single groupBy with conditional
    aggregates — same plan the oracle's FILTER clauses describe."""
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    # pivot leaves null where a (user, type) pair never occurred;
    # the oracle's FILTER count says 0 — align, and pin names
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    )


_T5_ORACLE = f"""
WITH pivoted AS ({_T4_ORACLE})
SELECT user_id, event_type, n_events FROM (
    {" UNION ALL ".join(
        f"SELECT user_id, '{t}' AS event_type, n_{t} AS n_events "
        f"FROM pivoted" for t in _EVENT_TYPES
    )}
)
"""


@register("t5_unpivot", oracle=_T5_ORACLE)
def t5_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 (beyond-parity): unpivot/melt — the inverse reshaping,
    wide per-type count columns back to (user, type, n) long form
    via the native ``unpivot`` (stack expression under the hood; a
    narrow 1→N row expansion, no shuffle)."""
    wide = t4_pivot(spark, sf_dir)
    return wide.unpivot(
        "user_id",
        [f"n_{t}" for t in _EVENT_TYPES],
        "event_type_col",
        "n_events",
    ).select(
        "user_id",
        F.expr("substring(event_type_col, 3)").alias("event_type"),
        "n_events",
    )
