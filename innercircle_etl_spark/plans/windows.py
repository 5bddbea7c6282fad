"""Window-function operators (SURVEY §2.6 W1-W5, §2.7 O1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from innercircle_etl_spark.operators.window_dedup import (
    first_per_key_agg,
    latest_per_key_agg,
    top_n_per_group,
)
from innercircle_etl_spark.plans.registry import dsum, load, register


@register(
    "w1_latest_per_key",
    oracle="""
    SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate, l_extendedprice
    FROM (
        SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC
               ) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
)
def w1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: latest-row-per-key dedup — the reference's ownership
    snapshot / latest-contract idiom (update_etl.py:129-140,
    :491-507, schema.sql:392-408). Tiebreakers pinned for
    determinism.

    Aggregate (max_by) form: (l_shipdate, l_orderkey, l_linenumber)
    is row-unique (orderkey+linenumber is the table key), so the
    greatest order-struct IS the window form's rank-1 row, and the
    partial aggregation collapses each key's ~dup-factor rows on the
    map side before the exchange (guide §2.3) instead of shuffling
    and sorting every row."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"
    )
    return latest_per_key_agg(
        li, ["l_partkey"], "l_shipdate", tiebreakers=["l_orderkey", "l_linenumber"]
    )


@register(
    "w2_first_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey,
           o_orderdate AS first_orderdate,
           o_totalprice AS first_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def w2_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: first-row-per-key — first acquisition
    (update_etl.py:430-437, first_acquisition.sql:16-22).

    min_by aggregate form (o_orderkey is unique, so the smallest
    order-struct IS the window's rank-1 row): map-side partial
    collapse before the exchange instead of shuffling every order
    row into a window sort (guide §2.3); the 4-column pre-select
    keeps the partial-agg structs narrow."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    out = first_per_key_agg(
        orders, ["o_custkey"], "o_orderdate", tiebreakers=["o_orderkey"]
    )
    return out.select(
        "o_custkey",
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderdate").alias("first_orderdate"),
        F.col("o_totalprice").alias("first_totalprice"),
    )


@register(
    "w3_topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def w3_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: top-N per group — top-3 insights per collection
    (update_etl.py:1186-1193), collection rank in portfolio (:578)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return top_n_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )


@register(
    "w4_global_rank",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(rank() OVER (ORDER BY c_acctbal DESC) AS INTEGER) AS wealth_rank
    FROM customer
    """,
)
def w4_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: global (unpartitioned) rank — whale ranking by net worth
    (update_etl.py:596).

    Scale hazard (SURVEY §4 X11): an unpartitioned window shuffles
    everything to ONE partition. Fine at dim-table cardinality; for a
    100TB fact table the scalable form is a two-phase rank: sort by a
    range-partitioned orderBy (Spark's range partitioner samples
    bounds), compute per-partition ranks + partition offsets, then
    add. Kept single-window here because the rank input is already an
    aggregate (per-address), orders of magnitude smaller than raw
    facts."""
    cust = load(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc())
    return cust.select(
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).cast("int").alias("wealth_rank"),
    )


@register(
    "o1_global_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 200
    """,
)
def o1_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: ORDER BY ... LIMIT k — top-200 whales/traders
    (update_etl.py:858-879). Spark plans TakeOrderedAndProject: each
    partition keeps its local top-k, only k rows per partition reach
    the driver — no global sort, scales to any input size. Tiebreak
    by orderkey pins the boundary row deterministically."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(200)
    )


@register(
    "w4b_global_rank_scalable",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(rank() OVER (ORDER BY c_acctbal DESC) AS INTEGER) AS wealth_rank
    FROM customer
    """,
)
def w4b_global_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4's scalable form — the two-phase global rank that survives
    fact-table cardinality where w4's single-partition window dies:

    1. range-repartition on the sort key (Spark samples split
       bounds); equal keys land in the same partition, so no tie
       ever spans a boundary;
    2. rank() locally within each partition (parallel windows keyed
       by spark_partition_id — no data moves);
    3. global rank = local rank + rows-in-earlier-partitions offset.
       The offset table is #partitions rows — dimension-sized — and
       broadcast back.

    Identical result to the plain global window (same oracle as w4);
    only the shuffle distribution changes."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    nparts = max(spark.sparkContext.defaultParallelism // 4, 2)
    parts = cust.repartitionByRange(
        nparts, F.col("c_acctbal").desc()
    ).withColumn("pid", F.spark_partition_id())
    # repartitionByRange SAMPLES its split bounds per evaluation, and
    # `parts` feeds two subtrees (local ranks + the offset counts).
    # Evaluated independently they can draw DIFFERENT bounds, and the
    # offset table then describes a partitioning the rank rows don't
    # have (caught by the vanilla-session gate: ranks off by the rows
    # that switched partitions). Partitioning determinism is a
    # CORRECTNESS requirement here, so cache() is not enough — a
    # cached block evicted under memory pressure (or lost with its
    # executor) silently recomputes with freshly sampled bounds.
    # localCheckpoint truncates the lineage entirely: consumers can
    # only ever read the materialized blocks, and losing one fails
    # the job loudly for a retry instead of returning wrong ranks.
    parts = parts.localCheckpoint(eager=True)

    w_local = Window.partitionBy("pid").orderBy(F.col("c_acctbal").desc())
    local = parts.withColumn("local_rank", F.rank().over(w_local))

    counts = parts.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    w_off = (
        Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset"),
    )

    return local.join(F.broadcast(offsets), "pid").select(
        "c_custkey",
        "c_acctbal",
        (F.col("local_rank") + F.col("offset")).cast("int").alias(
            "wealth_rank"
        ),
    )


@register(
    "w6_gap_fill_ffill",
    oracle="""
    WITH daily AS (
        SELECT l_partkey AS coll, CAST(l_shipdate AS DATE) AS d,
               MIN(l_extendedprice) AS day_floor
        FROM lineitem WHERE l_partkey % 50 = 0
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT coll, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY coll
    ),
    spine AS (
        SELECT coll, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
        FROM bounds
    ),
    joined AS (
        SELECT s.coll, s.d, dy.day_floor
        FROM spine s LEFT JOIN daily dy ON s.coll = dy.coll AND s.d = dy.d
    )
    SELECT coll, d,
           last_value(day_floor IGNORE NULLS) OVER (
               PARTITION BY coll ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS floor_filled,
           (day_floor IS NULL) AS was_gap
    FROM joined
    """,
)
def w6_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 (beyond-parity): daily resample + forward-fill — the
    time-series gap-fill every floor-price/valuation series needs
    (the reference instead re-queries the last known price ad hoc).
    Per collection: a generated date spine from first to last
    observation, left-joined to the observed daily floor, then
    ``last(ignorenulls)`` carries the previous value across gaps.

    Scale: the spine generates per collection (sequence + explode —
    narrow), the join and the fill window both key on the collection;
    nothing is global. A 50x collection sample keeps the fixture
    row count honest (~days-per-coll × |sample|)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 50 == 0)
    daily = li.groupBy(
        F.col("l_partkey").alias("coll"),
        F.to_date("l_shipdate").alias("d"),
    ).agg(F.min("l_extendedprice").alias("day_floor"))
    bounds = daily.groupBy("coll").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = bounds.select(
        "coll",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("d"),
    )
    joined = spine.join(daily, ["coll", "d"], "left")
    w = (
        Window.partitionBy("coll")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "coll",
        "d",
        F.last("day_floor", ignorenulls=True).over(w).alias("floor_filled"),
        F.col("day_floor").isNull().alias("was_gap"),
    )


@register(
    "w7_rolling_7day",
    oracle="""
    WITH daily AS (
        SELECT l_partkey AS coll,
               datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                 AS epoch_day,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 AS day_qty
        FROM lineitem WHERE l_partkey % 50 = 0
        GROUP BY 1, 2
    )
    SELECT coll, epoch_day,
           CAST(SUM(CAST(day_qty AS DECIMAL(38,6))) OVER (
               PARTITION BY coll ORDER BY epoch_day
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS qty_7d,
           CAST(COUNT(*) OVER (
               PARTITION BY coll ORDER BY epoch_day
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS days_present_7d
    FROM daily
    """,
)
def w7_rolling_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 (beyond-parity): event-time rolling aggregate — trailing
    7-day quantity per collection via a RANGE frame over epoch-days
    (value-based, so calendar gaps shrink the frame instead of
    silently widening it the way a ROWS frame would). The rolling
    sum stays in decimal through the frame so partial order can't
    move a ulp. One shuffle on the collection key; frames never
    cross partitions."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 50 == 0)
    daily = li.groupBy(
        F.col("l_partkey").alias("coll"),
        F.datediff(
            F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date")
        ).alias("epoch_day"),
    ).agg(dsum("l_quantity").alias("day_qty"))
    w = (
        Window.partitionBy("coll")
        .orderBy("epoch_day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "coll",
        "epoch_day",
        F.sum(F.col("day_qty").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("qty_7d"),
        F.count(F.lit(1)).over(w).alias("days_present_7d"),
    )


@register(
    "w8_day_over_day",
    oracle="""
    WITH daily AS (
        SELECT l_partkey AS coll, CAST(l_shipdate AS DATE) AS d,
               MIN(l_extendedprice) AS day_floor
        FROM lineitem WHERE l_partkey % 50 = 0
        GROUP BY 1, 2
    )
    SELECT coll, d, day_floor,
           lag(day_floor) OVER w AS prev_floor,
           (day_floor - lag(day_floor) OVER w)
             / lag(day_floor) OVER w AS pct_change,
           lead(day_floor) OVER w AS next_floor
    FROM daily WINDOW w AS (PARTITION BY coll ORDER BY d)
    """,
)
def w8_day_over_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 (beyond-parity): lead/lag deltas — day-over-day floor
    change per collection (first observation's change is NULL, not
    zero). The offset functions ride the same per-key sort the other
    W queries use; division of identical doubles is identical in
    both engines, so pct_change hash-matches."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 50 == 0)
    daily = li.groupBy(
        F.col("l_partkey").alias("coll"),
        F.to_date("l_shipdate").alias("d"),
    ).agg(F.min("l_extendedprice").alias("day_floor"))
    w = Window.partitionBy("coll").orderBy("d")
    prev = F.lag("day_floor").over(w)
    return daily.select(
        "coll",
        "d",
        "day_floor",
        prev.alias("prev_floor"),
        ((F.col("day_floor") - prev) / prev).alias("pct_change"),
        F.lead("day_floor").over(w).alias("next_floor"),
    )


@register(
    "w9_ntile_deciles",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(10) OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey ASC)
                AS BIGINT) AS wealth_decile
    FROM customer
    """,
)
def w9_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 (beyond-parity): ntile decile assignment per market
    segment — the bucketing analysts reach for before cohort
    comparisons. Tie order pinned by custkey so the decile
    boundaries are deterministic in both engines."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(10).over(w).cast("long").alias("wealth_decile"),
    )


_TWAP_ORACLE = """
WITH seq AS (
    SELECT user_id, ts, value,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS nxt
    FROM events
),
iv AS (
    SELECT user_id, value,
           (epoch_us(nxt) - epoch_us(ts)) // 1000000 AS dur_s
    FROM seq WHERE nxt IS NOT NULL
)
SELECT user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6)) * dur_s) AS DOUBLE)
         / SUM(dur_s) AS twap,
       CAST(COUNT(*) AS BIGINT) AS n_intervals
FROM iv GROUP BY user_id
HAVING SUM(dur_s) > 0
"""


@register("w10_twap", oracle=_TWAP_ORACLE)
def w10_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 (beyond-parity): time-weighted average value per user —
    the TWAP every trading/metering pipeline computes (a price that
    held for 6 hours must weigh more than one that held 6 seconds;
    the reference's ROI tables average per-row, which systematically
    over-weights bursty activity). Each observation is weighted by
    its holding duration: the gap to the SAME key's next event via
    lead() — one shuffle on user_id. The weighted mean is EXACT
    decimal arithmetic end to end: value converts to DECIMAL(18,6)
    BEFORE the multiply (at value's ~1e2 magnitude the double ulp is
    1e-14, so scale-6 rounding can never tie — registry doctrine),
    then decimal × integer stays exact through the sum. Durations
    are WHOLE SECONDS (integer-div of the micros gap) by design:
    per-user total time is calendar-bounded, so the numerator's
    significand stays under 2^53 and the final decimal→double cast
    is correctly rounded in both engines. Microsecond weights broke
    exactly there — the sums agreed decimal-for-decimal, but each
    engine's decimal→double cast rounds >2^53 significands through
    different paths (measured: 25-29% of groups off by one ulp).
    Sub-second flickers carry zero weight — documented semantics,
    not an accident. The final open interval has no duration and is
    excluded, matching the oracle's NULL lead drop.
    Event-time epoch math uses the NTZ-safe timestamp_diff helper —
    unix_micros throws on the fixture's TIMESTAMP_NTZ."""
    from innercircle_etl_spark.plans.streaming_queries import _ts_us

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        "user_id",
        "ts",
        "value",
        F.lead("ts").over(w).alias("nxt"),
    )
    iv = (
        seq.filter(F.col("nxt").isNotNull())
        .select(
            "user_id",
            "value",
            (_ts_us("nxt") - _ts_us("ts")).alias("dur_us"),
        )
        # integer div, matching the oracle's // — a double `/` with a
        # truncating cast can disagree at knife-edge quotients
        .select(
            "user_id",
            "value",
            F.expr("dur_us div 1000000").alias("dur_s"),
        )
    )
    return (
        iv.groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.col("value").cast("decimal(18,6)")
                    * F.col("dur_s")
                ).cast("double")
                / F.sum("dur_s")
            ).alias("twap"),
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur_s").alias("_tot_dur"),
        )
        # a user whose every inter-event gap is sub-second has
        # SUM(dur_s)=0 — Spark double/0 gives NaN, DuckDB NULL, a
        # cross-engine hash divergence. Drop the group identically
        # on both sides (HAVING SUM(dur_s) > 0 in the oracle).
        .filter(F.col("_tot_dur") > 0)
        .drop("_tot_dur")
    )


# ---------------------------------------------- cohort retention

_COHORT_ORACLE = """
WITH firsts AS (
    SELECT user_id, CAST(MIN(ts) AS DATE) AS d0 FROM events
    GROUP BY user_id
),
k AS (
    SELECT e.user_id, f.d0 AS cohort_day,
           CAST(datediff('day', f.d0, CAST(e.ts AS DATE)) AS INTEGER)
             AS days_since
    FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_day, days_since,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM k GROUP BY cohort_day, days_since
"""


@register("w11_cohort_retention", oracle=_COHORT_ORACLE)
def w11_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11 (beyond-parity): the cohort-retention matrix — users
    grouped by the DAY of their FIRST event, activity counted at
    each day offset since (day grain because the fixture's event
    stream spans one month; the month-grain variant is the same
    plan with date_trunc). This is the product-analytics shape
    behind the reference's insider-cohort tables ("circles" group
    wallets by when they entered; retention is the same first-
    touch-anchored rollup over time, update_etl.py:906-920's
    created_at cohorts).

    Day arithmetic is date-to-date on BOTH engines (Spark datediff
    and DuckDB datediff('day') agree on DATE args; timestamp args
    would tangle partial-day semantics, so both sides cast first).

    Scale shape: first-touch = one groupBy(user) min (map-side
    combinable); the join back to events shuffles on user_id ONCE
    and AQE reuses the aggregation's clustering where it can; the
    final (cohort, offset) rollup is days x days sized. The
    countDistinct is exact per cell — at extreme cardinality swap
    in a16's mergeable HLL sketches per cell."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("d0")
    )
    joined = ev.join(firsts, "user_id")
    k = joined.select(
        "user_id",
        F.col("d0").alias("cohort_day"),
        F.datediff(F.to_date("ts"), F.col("d0"))
        .cast("int")
        .alias("days_since"),
    )
    return k.groupBy("cohort_day", "days_since").agg(
        F.countDistinct("user_id").alias("n_active")
    )


# ------------------------------------------ batch gap sessionization

_SESS_GAP_US = 12 * 3600 * 1_000_000  # 12h inactivity closes a session

_SESS_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_id, ts,
           lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prv
    FROM events
),
flg AS (
    SELECT user_id, event_id, ts,
           CASE WHEN prv IS NULL
                 OR epoch_us(ts) - epoch_us(prv) > {_SESS_GAP_US}
                THEN 1 ELSE 0 END AS new_s
    FROM seq
),
sess AS (
    SELECT user_id, ts,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
    FROM flg
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS dur_s
FROM sess GROUP BY user_id, session_idx
"""


@register("w12_sessionize", oracle=_SESS_ORACLE)
def w12_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12 (beyond-parity): batch gap sessionization — the classic
    lag-flag-cumsum composition that turns an event log into
    sessions (an inactivity gap over 12h closes the session), with
    per-session event count, start/end, and whole-second duration.
    This is the BATCH analog of i8_session_window (streaming state
    timeout): the same session semantics computed retrospectively
    over the full log — every analytics backfill needs both.

    Determinism: session boundaries order by (ts, event_id) so ties
    are pinned; the gap compare and duration are integer micros via
    the NTZ-safe timestamp-diff helper (unix_micros throws on the
    fixture's TIMESTAMP_NTZ; registry doctrine from w10_twap).

    Scale shape: ONE shuffle total. The lag flag and the running
    session counter share the same user-keyed partitioning/sort (a
    single Window exchange+sort in the physical plan), and the
    per-session rollup's grouping keys (user_id, session_idx) are
    satisfied by that same hashpartitioning(user_id) — user_id is a
    subset of the keys — so the partial+final aggregate runs with no
    second exchange (asserted by the plan test). Per-user
    state is one pass over that user's timeline; power users at
    100TB shard by coarse time range first (the seq_event_assembly
    discipline), which cannot split a session shorter than the
    shard overlap.

    Reference parity: beyond-reference (north-star extension)."""
    from innercircle_etl_spark.plans.streaming_queries import _ts_us

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    flg = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((_ts_us("ts") - _ts_us(F.lag("ts").over(w))) > _SESS_GAP_US),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_s"),
    )
    sess = flg.select(
        "user_id",
        "ts",
        F.sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_idx"),
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        # exact integer floor-div, matching the oracle's `//`
        .withColumn(
            "dur_s",
            F.expr(
                "timestampdiff(MICROSECOND, session_start, session_end)"
                " div 1000000"
            ),
        )
    )


# ----------------------------------------------- w13: exact EWMA

_EWMA_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       list_reduce(list(value ORDER BY ts, event_id),
                   (acc, x) -> acc * 0.5 + x * 0.5) AS ewma
FROM events
GROUP BY user_id
"""


@register("w13_ewma", oracle=_EWMA_ORACLE)
def w13_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W13 (beyond-parity): exponentially weighted moving average of
    each user's event values — the time-decayed feature/monitoring
    statistic the window family lacked (w7's rolling mean weights
    uniformly; EWMA discounts by recency). alpha is fixed at 0.5:
    multiplication by 0.5 is EXACT in binary floating point
    (exponent decrement), so the only rounding in the fold is the
    addition — and both engines run the IDENTICAL left-to-right
    sequential fold (DuckDB list_reduce seeds the accumulator with
    the first element; Spark's aggregate over slice(2..) with
    arr[0] as init is the same recurrence, ewma_1 = x_1), so the
    result is bit-identical, not approximately equal. Ordering is
    total via (ts, event_id).

    Scale shape: ONE user-keyed shuffle; the sort and fold happen
    inside the aggregate's collect+sort_array per user (bounded by
    per-user event counts, like seq_funnel_states); no window, no
    join, no UDF.

    Reference parity: beyond-reference (north-star extension)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id,"
            " value))), s -> s.value)"
        ).alias("vals"),
    )
    return per_user.select(
        "user_id",
        "n_events",
        F.expr(
            "aggregate(slice(vals, 2, size(vals) - 1), vals[0],"
            " (acc, x) -> acc * 0.5D + x * 0.5D)"
        ).alias("ewma"),
    )
