"""Aggregation operators (SURVEY §2.5 A1-A11) over the synthetic tables.

Each query names the reference operator it re-expresses; oracle SQL is
the DuckDB-dialect equivalent. Exact-sum discipline per registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from innercircle_etl_spark.operators.percentiles import percentile_disc
from innercircle_etl_spark.plans.registry import (
    davg,
    dsum,
    duck_davg,
    duck_dsum,
    load,
    register,
)


@register(
    "a1_count_distinct",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           CAST(COUNT(1) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a1_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: exact count(distinct x) per group (reference:
    update_etl.py:347-353 tokens-per-trx, :1447-1452 holders>500).

    Exact distinct — `approx_count_distinct` would be the 100TB relief
    valve but fails hash parity; Spark expands distinct aggs via
    expand+two-phase agg, which partial-aggregates map-side."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "a3_sum_min_max_avg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {duck_dsum('l_quantity')} AS sum_qty,
           {duck_dsum('l_extendedprice')} AS sum_base_price,
           {duck_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {duck_davg('l_quantity')} AS avg_qty,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a3_sum_min_max_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: sum/min/max/avg battery — TPC-H Q1 shape (reference agg
    sites update_etl.py:589,766-768,869,998,1135-1136). Flagship
    pricing-summary query; one shuffle, partial aggregation map-side,
    filter pushed to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "a4_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)
    """,
)
def a4_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: scalar-subquery aggregate as predicate (reference:
    update_etl.py:499,551,1081 `(select max(...) from ...)`).

    Spark-first: a 1-row aggregate cross-joined in (Catalyst turns it
    into a broadcast nested loop over one row — no driver collect, so
    the same plan works when the 'scalar' comes from a 100TB scan)."""
    orders = load(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_totalprice").alias("__mx"))
    return (
        orders.crossJoin(F.broadcast(mx))
        .filter(F.col("o_totalprice") > 0.9 * F.col("__mx"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "a6_having",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) > 50
    """,
)
def a6_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: HAVING on aggregate (reference: update_etl.py:849-857
    `having sum(collection_pct_total) < 0.9`, :1451 holders>500)."""
    cust = load(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .filter(F.col("n_customers") > 50)
    )


@register(
    "a7_conditional_agg",
    oracle=f"""
    SELECT o_custkey,
           {duck_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS f_total,
           COUNT(DISTINCT CASE WHEN o_totalprice > 100000 THEN o_orderkey END) AS n_big,
           CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS n_urgent
    FROM orders
    GROUP BY o_custkey
    """,
)
def a7_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: conditional aggregation — sum(case when), count(distinct
    case when) (reference: update_etl.py:1148-1151, :1018-1023)."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        dsum(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        ).alias("f_total"),
        F.countDistinct(
            F.when(F.col("o_totalprice") > 100000, F.col("o_orderkey"))
        ).alias("n_big"),
        F.count(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        ).alias("n_urgent"),
    )


@register(
    "a8_percentile_disc",
    oracle="""
    SELECT l_returnflag,
           percentile_disc(0.2) WITHIN GROUP (ORDER BY l_extendedprice)
             AS floor_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a8_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: exact discrete percentile — the reference's daily floor
    price `percentile_disc(0.2) WITHIN GROUP` (update_etl.py:456-476).
    Discrete (an actual element), NOT interpolated — see
    operators/percentiles.py."""
    li = load(spark, sf_dir, "lineitem")
    return percentile_disc(
        li, ["l_returnflag"], "l_extendedprice", 0.2, out_col="floor_price"
    )


@register(
    "a9_dedup_groupby",
    oracle="""
    SELECT DISTINCT o_custkey, o_orderstatus, o_orderpriority
    FROM orders
    """,
)
def a9_dedup_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: deduplicating GROUP BY with no aggregates == DISTINCT
    (reference: update_etl.py:661-671 `group by 1,..,6`)."""
    orders = load(spark, sf_dir, "orders")
    return orders.select("o_custkey", "o_orderstatus", "o_orderpriority").distinct()


@register(
    "a11_two_phase_agg",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey, {duck_dsum('o_totalprice')} AS cust_total
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_nationkey,
           {duck_dsum('pc.cust_total')} AS nation_total,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {duck_davg('pc.cust_total')} AS avg_cust_total
    FROM per_cust pc JOIN customer c ON pc.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)
def a11_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: two-level rollup — per-collection worth → per-address
    total worth (reference: update_etl.py:542-598). One DAG of two
    groupBys; Catalyst inserts map-side partial aggregation at each."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        dsum("o_totalprice").alias("cust_total")
    )
    return (
        per_cust.join(
            cust, per_cust.o_custkey == cust.c_custkey, "inner"
        )
        .groupBy("c_nationkey")
        .agg(
            dsum("cust_total").alias("nation_total"),
            F.count(F.lit(1)).alias("n_customers"),
            davg("cust_total").alias("avg_cust_total"),
        )
    )


@register(
    "a1b_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps_exact,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS parts_within_bound,
           TRUE AS supps_within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a1b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1's 100TB relief valve: HyperLogLog++ approximate distinct
    (rsd=2%). The sketch itself is engine-specific (DuckDB's HLL
    differs from Spark's), so the ESTIMATE can't be value-hashed
    cross-engine; instead the query emits the in-query accuracy
    contract — ``|approx - exact| / exact < 5%`` per group, computed
    against the exact distinct in the same DAG — plus the exact
    values, which DO hash. The oracle computes the exact side and
    asserts the bound literally holds (``TRUE``). rsd=2% has never
    exceeded 1.1% observed error on any fixture generation
    (tools/measure_bounds.py), so 5% carries ~5x margin.

    Scale: in production the exact branch is dropped and the sketch
    is the answer — fixed-size state per group (vs the exact
    expand+two-phase distinct whose state grows with cardinality);
    this is the form that survives a trillion-row distinct. The exact
    branch here exists to make the sketch's accuracy driver-checkable."""
    li = load(spark, sf_dir, "lineitem")
    rel = lambda a, e: F.abs(F.col(a) - F.col(e)) / F.greatest(  # noqa: E731
        F.col(e), F.lit(1)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
            F.countDistinct("l_partkey").alias("n_parts_exact"),
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("asu"),
            F.countDistinct("l_suppkey").alias("n_supps_exact"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "n_parts_exact",
            "n_supps_exact",
            "n_rows",
            (rel("ap", "n_parts_exact") < 0.05).alias("parts_within_bound"),
            (rel("asu", "n_supps_exact") < 0.05).alias("supps_within_bound"),
        )
    )


@register(
    "a12_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {duck_dsum("l_quantity")} AS total_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 (beyond-parity): hierarchical ROLLUP totals — per
    (flag, status), per flag, and grand total in ONE pass with
    GROUPING flags disambiguating real NULL keys from subtotal rows.
    Spark expands grouping sets before the exchange, so subtotals
    still partial-aggregate map-side — one shuffle for all three
    levels, vs the reference's habit of separate queries per
    granularity."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("total_qty"),
    ).select(
        "l_returnflag", "l_linestatus", "g_flag", "g_status",
        "n_rows", "total_qty",
    )


@register(
    "a8b_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           percentile_disc(0.2) WITHIN GROUP (ORDER BY l_extendedprice)
             AS p20_exact,
           TRUE AS approx_within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a8b_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8's 100TB relief valve: approx_percentile over a bounded
    accuracy sketch instead of the exact within-group sort. Like the
    HLL distinct (a1b) the sketch is engine-specific, so the query
    emits the in-query accuracy contract instead of the estimate:
    ``|approx - exact| / |exact| < 2%`` per group against the exact
    discrete percentile computed in the same DAG, plus the exact
    value (which hashes cross-engine — a8 proves it). accuracy=10000
    has never exceeded 0.06% observed error on any fixture generation
    (tools/measure_bounds.py) → 2% carries ~30x margin.

    Scale: production drops the exact branch and keeps the sketch —
    fixed-size state per group vs the exact within-group sort. The
    join is 3 rows x 3 rows on the group key (broadcast, free); the
    exact branch exists to make the sketch driver-checkable."""
    li = load(spark, sf_dir, "lineitem")
    exact = percentile_disc(
        li, ["l_returnflag"], "l_extendedprice", 0.2, out_col="p20_exact"
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.lit(0.2), F.lit(10000)
        ).alias("p20_approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return approx.join(F.broadcast(exact), "l_returnflag").select(
        "l_returnflag",
        "n_rows",
        "p20_exact",
        (
            F.abs(F.col("p20_approx") - F.col("p20_exact"))
            / F.abs(F.col("p20_exact"))
            < 0.02
        ).alias("approx_within_bound"),
    )


_A13_ORACLE = """
SELECT event_type,
       CAST(COUNT(value) AS BIGINT) AS n,
       MIN(value) AS vmin,
       MAX(value) AS vmax,
       median(value) AS vmedian
FROM events
GROUP BY event_type
"""


@register("a13_grouped_pandas_stats", oracle=_A13_ORACLE)
def a13_grouped_pandas_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED-MAP UDAF surface (SURVEY §2.10): per-group stats
    via ``groupBy().applyInPandas`` — each group lands in one Arrow
    batch and an arbitrary numpy/pandas computation emits the
    aggregate row. This is the escape hatch for aggregations Spark
    SQL can't express (robust stats, model fits, per-entity
    sketches); the built-in path (a3) stays the hot default.

    Every emitted stat is ORDER-INDEPENDENT (count/min/max/median),
    so the result is hash-exact against the SQL oracle — the same
    discipline as dsum's decimal trick, achieved here by choosing
    statistics whose float evaluation has no accumulation order.
    Median interpolation for even n is (a+b)/2 in IEEE double on
    both engines — bit-identical.

    Scale: one shuffle on the group key; a group must fit one
    executor's Arrow batch (event_type cardinality ~unbounded rows —
    at 100TB pre-aggregate per (key, salt) first or switch to the
    built-ins; the operator is for many-small-groups workloads)."""
    import numpy as np
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].dropna().to_numpy()
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [np.int64(v.size)],
                "vmin": [v.min() if v.size else None],
                "vmax": [v.max() if v.size else None],
                "vmedian": [float(np.median(v)) if v.size else None],
            }
        )

    ev = load(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        stats,
        "event_type string, n long, vmin double, vmax double, "
        "vmedian double",
    )


_A14_ORACLE = """
SELECT event_type,
       median(value) AS vmedian,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
"""


@register("a14_grouped_agg_udf", oracle=_A14_ORACLE)
def a14_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED_AGG pandas-UDF surface: a vectorized Python
    aggregate (Series → scalar) used directly inside ``.agg()``
    alongside built-ins — the lighter sibling of a13's grouped-map
    (no per-group DataFrame, composes with other aggregates in one
    pass; note Spark disallows mixing it with JVM aggregates in one
    .agg(), so the row count is a second pandas aggregate).
    Median is order-independent, so the Python path stays hash-exact
    against the SQL oracle. Spilling caveat: a GROUPED_AGG UDF
    materializes each group's column in memory (no partial
    aggregation) — same many-small-groups constraint as a13."""
    import numpy as np

    # explicit functionType: the module's `from __future__ import
    # annotations` stringifies type hints, which defeats pandas_udf's
    # signature inference
    @F.pandas_udf("double", F.PandasUDFType.GROUPED_AGG)
    def py_median(v):
        arr = v.dropna().to_numpy()
        return float(np.median(arr)) if arr.size else None

    # a GROUPED_AGG UDF cannot share an .agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — the count rides a second
    # pandas aggregate instead
    @F.pandas_udf("long", F.PandasUDFType.GROUPED_AGG)
    def py_count(v):
        return len(v)

    ev = load(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").agg(
        py_median("value").alias("vmedian"),
        py_count("value").alias("n"),
    )


# --------------------------------------- sketch family (beyond-parity)

_CMS_D = 4        # hash rows
_CMS_W = 1024     # buckets per row
_CMS_TOPK = 20

_A15_ORACLE = f"""
WITH exact AS (
    SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS exact_cnt
    FROM lineitem GROUP BY l_partkey
),
ranked AS (
    SELECT k, exact_cnt,
           CAST(row_number() OVER (ORDER BY exact_cnt DESC, k ASC)
                AS INTEGER) AS hh_rank
    FROM exact
)
SELECT k, exact_cnt, hh_rank,
       TRUE AS never_underestimates, TRUE AS within_error_bound
FROM ranked WHERE hh_rank <= {_CMS_TOPK}
"""


@register("a15_cms_heavy_hitters", oracle=_A15_ORACLE)
def a15_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (beyond-parity sketch family,
    same in-query bound-check oracle pattern as a1b/a8b): d=4 hash
    rows x w=1024 buckets of xxhash64 counts — fixed-size state for
    frequency estimation over an unbounded key space, THE relief
    valve for top-k-frequent at 100TB where an exact per-key groupBy
    is itself the bottleneck.

    The query emits the CMS contract per top-20 key: (a) the sketch
    NEVER underestimates (structural: every bucket the key hashes to
    counts at least all of that key's occurrences — deterministically
    true, not probabilistically), and (b) the overestimate stays
    under 4*N/w (classic bound is e*N/w with probability 1-e^-d per
    lookup; observed max is 0.63*N/w on every fixture scale, so 4x
    carries ~6x margin). Exact side (count + deterministic rank) is
    the hashable payload the oracle recomputes.

    Scale shape: the sketch build is one groupBy over (d x w) = 4096
    cells — map-side combinable, fixed size regardless of N; the
    exact side exists to make the contract checkable and is the part
    production drops."""
    li = load(spark, sf_dir, "lineitem")
    keys = li.select(F.col("l_partkey").alias("k"))
    n_total = keys.groupBy().agg(F.count(F.lit(1)).alias("n"))

    rows = keys.select(
        "k",
        F.explode(F.array(*[F.lit(j) for j in range(_CMS_D)])).alias("j"),
    ).withColumn("b", F.pmod(F.xxhash64("k", "j"), F.lit(_CMS_W)))
    sketch = rows.groupBy("j", "b").agg(F.count(F.lit(1)).alias("c"))

    # top-K via sorted limit (TakeOrderedAndProject — no global
    # single-partition window over the full key table); the rank
    # window then only ever sees the K pre-limited rows, same trick
    # as o1_global_topk
    exact = keys.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    w_rank = Window.orderBy(F.col("exact_cnt").desc(), F.col("k").asc())
    top = (
        exact.orderBy(F.col("exact_cnt").desc(), F.col("k").asc())
        .limit(_CMS_TOPK)
        .withColumn("hh_rank", F.row_number().over(w_rank).cast("int"))
    )

    probes = top.crossJoin(
        spark.range(_CMS_D).select(F.col("id").cast("int").alias("j"))
    ).withColumn("b", F.pmod(F.xxhash64("k", "j"), F.lit(_CMS_W)))
    est = (
        probes.join(sketch, ["j", "b"])
        .groupBy("k", "exact_cnt", "hh_rank")
        .agg(F.min("c").alias("est"))
    )
    return est.crossJoin(F.broadcast(n_total)).select(
        "k",
        "exact_cnt",
        "hh_rank",
        (F.col("est") >= F.col("exact_cnt")).alias("never_underestimates"),
        (
            F.col("est") - F.col("exact_cnt")
            <= 4.0 * F.col("n") / _CMS_W
        ).alias("within_error_bound"),
    )


_A16_ORACLE = """
SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_groups,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_global_exact,
       TRUE AS union_within_bound,
       TRUE AS direct_within_bound
FROM lineitem
"""


@register("a16_hll_mergeable_rollup", oracle=_A16_ORACLE)
def a16_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-sketch rollup (beyond-parity): per-group Datasketches
    HLL sketches built with ``hll_sketch_agg``, merged with
    ``hll_union_agg``, estimated with ``hll_sketch_estimate`` — the
    contract that makes 100TB distinct-count rollups work: sketch
    once per partition/day, merge cheaply at ANY later grain instead
    of re-scanning rows. (a1b is the one-shot estimate; this is the
    re-aggregation story.)

    Sketch estimates are engine-specific AND the union estimate can
    differ from the direct estimate in the last few counts (sparse
    vs dense register coercion during merge), so the query emits the
    bound contract, not the estimates: union-of-group-sketches and
    direct global sketch must EACH land within 5% of the exact
    global distinct computed in the same DAG (observed <=0.5% at
    every fixture scale). Default lgConfigK=12 on both paths."""
    li = load(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    merged = per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
    )
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias(
            "est_direct"
        ),
        F.countDistinct("l_partkey").alias("n_global_exact"),
    )
    rel = lambda est: (  # noqa: E731
        F.abs(F.col(est) - F.col("n_global_exact"))
        / F.col("n_global_exact")
    )
    return merged.crossJoin(direct).select(
        "n_groups",
        "n_global_exact",
        (rel("est_union") < 0.05).alias("union_within_bound"),
        (rel("est_direct") < 0.05).alias("direct_within_bound"),
    )


# ------------------------------------- sketch set intersection (A17)

_A17_ORACLE = """
WITH a AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_totalprice > 350000),
b AS (SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F')
SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS exact_a,
       CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS exact_b,
       CAST((SELECT COUNT(*) FROM
             (SELECT * FROM a UNION SELECT * FROM b)) AS BIGINT)
         AS exact_union,
       CAST((SELECT COUNT(*) FROM a JOIN b USING (o_custkey))
            AS BIGINT) AS exact_inter,
       ROUND(((SELECT COUNT(*) FROM a) + (SELECT COUNT(*) FROM b)
              + (SELECT COUNT(*) FROM
                 (SELECT * FROM a UNION SELECT * FROM b)))
             / GREATEST((SELECT COUNT(*) FROM a JOIN b
                         USING (o_custkey)), 1)::DOUBLE, 2)
         AS amplification,
       TRUE AS inter_within_bound
"""


@register("a17_sketch_set_intersection", oracle=_A17_ORACLE)
def a17_sketch_set_intersection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate distinct-set INTERSECTION from sketches — the
    audience-overlap query every segmentation system runs: |A∩B| =
    |A| + |B| - |A∪B| by inclusion-exclusion over three HLL
    estimates (high-spender customers x urgent-finished customers).
    Sketches make each term mergeable and fixed-size; the exact
    counts ride the same DAG (a1b's pattern) so the driver can
    value-hash them AND check the in-query accuracy contract.
    Inclusion-exclusion AMPLIFIES sketch error by the factor
    (|A|+|B|+|A∪B|)/|A∩B| (~5x on current fixtures), so the bound
    is DERIVED, not a literal: |est_inter - exact_inter| /
    exact_inter < 3*rsd x that measured amplification. A fixture
    regen that shrinks the intersection loosens the bound by
    exactly the error theory predicts instead of tripping a
    spurious gate failure; the amplification factor itself is
    emitted as a hash-checked column (both engines compute it from
    exact counts) so the trade stays visible.

    Scale: each term is one map-side-combinable sketch aggregate;
    the exact branches (distinct + semi-join) exist to make the
    contract checkable and are dropped in production. At 100TB the
    three sketches are three scans' worth of fixed-size state, vs
    the exact intersection's full distinct shuffle."""
    orders = load(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 350000).select("o_custkey")
    b = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderstatus") == "F")
    ).select("o_custkey")

    agg_a = a.agg(
        F.countDistinct("o_custkey").alias("exact_a"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("ap_a"),
    )
    agg_b = b.agg(
        F.countDistinct("o_custkey").alias("exact_b"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("ap_b"),
    )
    agg_u = a.unionByName(b).agg(
        F.countDistinct("o_custkey").alias("exact_union"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("ap_u"),
    )
    agg_i = (
        a.distinct()
        .join(b.distinct(), "o_custkey", "semi")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    est_inter = F.col("ap_a") + F.col("ap_b") - F.col("ap_u")
    # Adaptive contract (not a literal): inclusion-exclusion error is
    # bounded by per-term error x (|A|+|B|+|A∪B|), so relative to the
    # intersection the tolerance is 3*rsd x the measured amplification
    # factor — it scales with the fixture instead of baking in the
    # current ~5x amplification. (A raw numeric error column can't
    # ride the hash-exact gate — sketch estimates differ per engine —
    # so the contract stays boolean but its bound is derived, and the
    # amplification itself is emitted hash-checked below.) 3*rsd is
    # the ~3-sigma per-term envelope for HLL++ at rsd=0.02.
    amp = (
        F.col("exact_a") + F.col("exact_b") + F.col("exact_union")
    ) / F.greatest(F.col("exact_inter"), F.lit(1))
    return (
        agg_a.crossJoin(F.broadcast(agg_b))
        .crossJoin(F.broadcast(agg_u))
        .crossJoin(F.broadcast(agg_i))
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_inter",
            F.round(amp, 2).alias("amplification"),
            (
                F.abs(est_inter - F.col("exact_inter"))
                / F.greatest(F.col("exact_inter"), F.lit(1))
                < F.lit(3 * 0.02) * amp
            ).alias("inter_within_bound"),
        )
    )
