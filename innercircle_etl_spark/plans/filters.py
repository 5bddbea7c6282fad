"""Projection / filter / predicate operators (SURVEY §2.3 P1-P10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from innercircle_etl_spark.plans.registry import load, register

# P10-style constant blacklist (reference: const.py:6-9, burn/system
# addresses update_etl.py:552-560) — here: excluded market segments.
SEGMENT_BLACKLIST = ("AUTOMOBILE", "HOUSEHOLD")


@register(
    "p1_project_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity / 10.0 AS qty_frac
    FROM lineitem
    WHERE l_quantity >= 45
    """,
)
def p1_project_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: projection + rename + arithmetic — `value/pow(10,18) AS
    eth_value` (update_etl.py:24-34). Pure column expressions stay in
    whole-stage codegen; the filter and the 5-column read both push
    to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") >= 45).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity") / 10.0).alias("qty_frac"),
    )


@register(
    "p2_p3_time_range",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts < TIMESTAMP '2024-01-05 00:00:00' + INTERVAL 1 DAY
    """,
)
def p2_p3_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3: half-open timestamp-range day filter — the reference's
    `ts >= d AND ts < d + interval '1 day'` (update_etl.py:332-339).
    Half-open (not `date(ts) = d`) so the raw-column predicate pushes
    into parquet row-group stats / date-partition pruning."""
    ev = load(spark, sf_dir, "events")
    d = F.lit("2024-01-05 00:00:00").cast("timestamp")
    return ev.filter(
        (F.col("ts") >= d) & (F.col("ts") < d + F.expr("INTERVAL 1 DAY"))
    ).select("event_id", "ts", "user_id", "event_type")


@register(
    "p4_p5_inlist_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      AND p_name LIKE 's%'
    """,
)
def p4_p5_inlist_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5: IN-list + LIKE-prefix predicates — payment-token IN
    (update_etl.py:466,654), topic-prefix LIKE '0xc4109843%'
    (decode_utls.py:111). A LIKE 'x%' compiles to StartsWith, which
    pushes down to parquet."""
    part = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
        & F.col("p_name").like("s%")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@register(
    "p6_p7_membership",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
      AND s.s_suppkey NOT IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '2001-11-01 00:00:00')
    """,
)
def p6_p7_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P7: IN-subquery (semi) + NOT-IN-subquery (anti) predicates
    (reference: update_etl.py:114,162-168,822-833). Keys are non-null
    so NOT IN ≡ left_anti (SQL NOT-IN null semantics don't bite —
    SURVEY §2.3 P6 caveat)."""
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    big = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-11-01").cast("timestamp")
    )
    return (
        supp.join(
            F.broadcast(nation),
            supp.s_nationkey == nation.n_nationkey,
            "left_semi",
        )
        .join(big, supp.s_suppkey == big.l_suppkey, "left_anti")
        .select("s_suppkey", "s_name")
    )


@register(
    "p8_p9_p10_null_blacklist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS safe_bal
    FROM customer
    WHERE c_mktsegment NOT IN ('AUTOMOBILE', 'HOUSEHOLD')
      AND (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NOT NULL
    """,
)
def p8_p9_p10_null_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8+P9+P10: null-check + hardcoded-blacklist filters
    (update_etl.py:179,1286; const.py:6-9). The testdata has no null
    cells, so nulls are synthesized with a guard CASE (the reference's
    div-by-zero guard shape, update_etl.py:613)."""
    cust = load(spark, sf_dir, "customer")
    safe_bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.col("c_acctbal")
    )
    return (
        cust.filter(~F.col("c_mktsegment").isin(*SEGMENT_BLACKLIST))
        .select("c_custkey", "c_mktsegment", safe_bal.alias("safe_bal"))
        .filter(F.col("safe_bal").isNotNull())
    )


@register(
    "p12_null_safe_eq",
    oracle="""
    WITH a AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_orderpriority END AS pr
        FROM orders
    ),
    b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE o_orderpriority END AS pr
        FROM orders
    )
    SELECT a.o_orderkey,
           (a.pr IS NOT DISTINCT FROM b.pr) AS same_priority
    FROM a JOIN b ON a.o_orderkey = b.o_orderkey
    """,
)
def p12_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 (beyond-parity): null-safe equality (``<=>`` / IS NOT
    DISTINCT FROM) — NULL == NULL is TRUE, NULL == value is FALSE,
    never the three-valued UNKNOWN that silently drops rows from a
    plain equality filter. The comparison every change-detection
    diff needs on nullable columns."""
    orders = load(spark, sf_dir, "orders")
    a = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("pr_a"),
    )
    b = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("pr_b"),
    )
    return a.join(b, "o_orderkey").select(
        "o_orderkey",
        F.col("pr_a").eqNullSafe(F.col("pr_b")).alias("same_priority"),
    )
