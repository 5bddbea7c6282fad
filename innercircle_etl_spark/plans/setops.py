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
