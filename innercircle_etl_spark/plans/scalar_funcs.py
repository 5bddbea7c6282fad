"""Scalar-function operators (SURVEY §2.9 F1-F6).

All pure column expressions — whole-stage-codegen'd JVM-side, never
Python UDFs (SURVEY §2.10 D6: the reference's pandas `apply`s that
are really column expressions become built-ins here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from innercircle_etl_spark.plans.registry import load, register

# Deterministic run-clock (SURVEY §4 custom-3): the reference's now()
# becomes an injected parameter everywhere.
RUN_DATE = "2002-01-01"


@register(
    "f1_string_funcs",
    oracle="""
    SELECT c_custkey,
           lower(trim(replace(replace(replace(c_name, '#', ''), '@', ''), '/', '')))
             AS handle,
           substring(c_name, 1, 8) AS prefix8,
           CAST(length(c_name) AS INTEGER) AS name_len,
           string_split(c_name, '#')[1] AS name_stem,
           c_name LIKE '%0' AS ends_zero
    FROM customer
    """,
)
def f1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string battery — the reference's social-handle normalizer
    `lower(trim(replace(replace(replace(x,'@',''),'#',''),'/','')))`
    (update_etl.py:1279-1283), substring/length (etl_utls.py:193-197),
    split (update_etl.py:1409), LIKE suffix (social_account.sql:44-48)."""
    cust = load(spark, sf_dir, "customer")
    cleaned = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("c_name"), "#", ""), "@", ""
                ),
                "/",
                "",
            )
        )
    )
    return cust.select(
        "c_custkey",
        cleaned.alias("handle"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.length("c_name").cast("int").alias("name_len"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_stem"),
        F.col("c_name").like("%0").alias("ends_zero"),
    )


@register(
    "f2_datetime_funcs",
    oracle=f"""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(datediff('day', o_orderdate, TIMESTAMP '{RUN_DATE} 00:00:00')
                AS INTEGER) AS age_days,
           CAST(o_orderdate + INTERVAL 1 DAY AS DATE) AS next_day,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           date_trunc('month', o_orderdate) AS month_start
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
)
def f2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date/time battery — date(ts), now()-interval arithmetic,
    day-difference (update_etl.py:111,160,333,645,1058-1064).
    Determinism: RUN_DATE replaces wall-clock now() (SURVEY §4
    custom-3)."""
    orders = load(spark, sf_dir, "orders")
    run_ts = F.lit(f"{RUN_DATE} 00:00:00").cast("timestamp")
    return orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.datediff(run_ts.cast("date"), F.to_date("o_orderdate"))
        .cast("int")
        .alias("age_days"),
        F.to_date(F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias(
            "next_day"
        ),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    )


@register(
    "f3_math_decay",
    oracle=f"""
    SELECT o_orderkey,
           power(0.5, CAST(year(o_orderdate) - 1995 AS INTEGER) + 1)
             AS decay_weight,
           CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_bucket,
           abs(o_totalprice - 100000.0) AS dist_from_100k
    FROM orders
    """,
)
def f3_math_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math battery — exponential decay `power(.8, days+1)`
    (update_etl.py:1058-1064), pow-of-10 scaling (update_etl.py:30),
    floor (update_etl.py:1476). Base 0.5 (dyadic) so pow() is exactly
    representable → bit-identical across libm implementations; the
    reference's 0.8-decay works the same, this choice is only for
    oracle hash parity."""
    orders = load(spark, sf_dir, "orders")
    age = (F.year("o_orderdate") - F.lit(1995)).cast("int")
    return orders.select(
        "o_orderkey",
        F.pow(F.lit(0.5), age + 1).alias("decay_weight"),
        F.floor(F.col("o_totalprice") / 10000).alias("price_bucket"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist_from_100k"),
    )


@register(
    "f4_case_coalesce",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'purchase' THEN 'trade'
                WHEN event_type = 'click' THEN 'interact'
                WHEN event_type = 'view' THEN 'interact'
                WHEN event_type = 'error' THEN 'system'
                ELSE 'other' END AS action,
           coalesce(
             CASE WHEN value > 0 THEN value END,
             0.0) AS value_or_zero,
           user_id % 2 = 0 AS is_even_user
    FROM events
    """,
)
def f4_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: CASE WHEN classifier + coalesce + boolean expression — the
    reference's payment-token map (update_etl.py:314-322), action
    classifier burn/mint/trade/transfer (update_etl.py:371-384),
    caller_is_receiver (update_etl.py:326). A many-branch token map
    can also be a broadcast-joined lookup dim; chained `when` keeps
    it codegen'd."""
    ev = load(spark, sf_dir, "events")
    action = (
        F.when(F.col("event_type") == "purchase", "trade")
        .when(F.col("event_type").isin("click", "view"), "interact")
        .when(F.col("event_type") == "error", "system")
        .otherwise("other")
    )
    return ev.select(
        "event_id",
        action.alias("action"),
        F.coalesce(
            F.when(F.col("value") > 0, F.col("value")), F.lit(0.0)
        ).alias("value_or_zero"),
        (F.col("user_id") % 2 == 0).alias("is_even_user"),
    )


@register(
    "f5_array_access",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS first_token,
           string_split(text, ' ')[3] AS third_token,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
    FROM documents
    """,
)
def f5_array_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: array-typed column access — `topics[ORDINAL(1)]`
    (decode_utls.py:111) → element_at on a split array."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, 3).alias("third_token"),
        F.size(toks).cast("int").alias("n_tokens"),
    )


@register(
    "f6_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 80
    """,
)
def f6_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: JSON field extraction from a string column — OpenSea
    account metadata parse (update_etl.py:1380-1398). Schema-on-read
    via get_json_object; at scale prefer from_json with an explicit
    StructType once per pipeline, not repeated path extraction."""
    ev = load(spark, sf_dir, "events")
    k_val = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_id", k_val.alias("k_val"))
        .filter(F.col("k_val") > 80)
    )


@register(
    "f7_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)
             AS n_positive,
           list_reduce(list_transform(embedding,
                                      x -> CAST(x AS DOUBLE) * x),
                       (a, b) -> a + b) AS sum_sq,
           array_to_string(list_transform(embedding[1:3],
                x -> CAST(round(CAST(x AS DOUBLE), 3) + 0.0 AS VARCHAR)), ',')
             AS head3
    FROM embeddings
    """,
)
def f7_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 (beyond-parity): higher-order array functions — filter /
    transform / left-fold aggregate over the embedding arrays, all
    JVM-side lambda expressions (the primitives the vector library
    builds on, exercised here as a first-class query). Left-to-right
    folds match DuckDB's list_reduce bit-exactly; the fold seeds with
    the first squared element (reduce semantics) to mirror it."""
    emb = load(spark, sf_dir, "embeddings")
    sq = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * x
    )
    return emb.select(
        "vec_id",
        F.size(
            F.filter(F.col("embedding"), lambda x: x > 0)
        ).cast("long").alias("n_positive"),
        # reduce (no init): acc starts at sq[0]; fold the tail
        F.aggregate(
            F.slice(sq, 2, F.size(sq) - 1),
            F.element_at(sq, 1),
            lambda acc, x: acc + x,
        ).alias("sum_sq"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice("embedding", 1, 3),
                lambda x: (F.round(x.cast("double"), 3) + F.lit(0.0)).cast("string"),
            ),
        ).alias("head3"),
    )
