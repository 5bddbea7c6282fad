"""Property tests for the upsert/merge family (SURVEY §5): the
idempotence the reference's gap-scan + delete-reload machinery exists
to provide, plus determinism of the tie-pinned operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from innercircle_etl_spark.operators.upsert import (
    insert_if_absent,
    merge_update,
    partition_delete_reload,
)
from innercircle_etl_spark.plans.registry import load


def rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r) for r in df.select(cols).collect())


def test_insert_if_absent_idempotent(spark, sf_dir):
    """U1 applied twice with the same source == applied once."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    target = orders.filter(F.col("o_orderkey") % 3 == 0)
    source = orders.filter(F.col("o_custkey") % 2 == 0)
    once = insert_if_absent(target, source, ["o_orderkey"])
    twice = insert_if_absent(once, source, ["o_orderkey"])
    assert rows(once) == rows(twice)


def test_insert_if_absent_never_duplicates_keys(spark, sf_dir):
    """U1 output keys stay unique when target keys were unique."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    target = orders.filter(F.col("o_orderkey") % 3 == 0).dropDuplicates(
        ["o_orderkey"]
    )
    source = orders.dropDuplicates(["o_orderkey"])
    out = insert_if_absent(target, source, ["o_orderkey"])
    total = out.count()
    distinct = out.select("o_orderkey").distinct().count()
    assert total == distinct


def test_partition_delete_reload_idempotent(spark, sf_dir):
    """U3 re-run for the same day == run once (the property the
    reference's 7-day lookback depends on)."""
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "value")
    fresh = ev.filter(F.to_date("ts") == F.lit("2024-01-05")).withColumn(
        "value", F.col("value") + 100
    )
    once = partition_delete_reload(ev, fresh, F.to_date(F.col("ts")), "2024-01-05")
    twice = partition_delete_reload(
        once, fresh, F.to_date(F.col("ts")), "2024-01-05"
    )
    assert rows(once) == rows(twice)


def test_merge_update_empty_source_is_identity(spark, sf_dir):
    """U2 with an empty source changes nothing."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    empty = cust.filter(F.lit(False))
    out = merge_update(cust, empty, ["c_custkey"], ["c_acctbal"])
    assert rows(out) == rows(cust)


def test_asof_join_deterministic(spark, sf_dir):
    """J7 with pinned tiebreakers returns identical matches across
    runs (the reference's unpinned row_number does not guarantee
    this — SURVEY §7)."""
    from innercircle_etl_spark.plans import QUERIES

    a = rows(QUERIES["j7_asof_join"](spark, sf_dir))
    b = rows(QUERIES["j7_asof_join"](spark, sf_dir))
    assert a == b


def test_daily_pipeline_idempotent(spark, sf_dir):
    """A second cron cycle on an already-repaired warehouse changes
    nothing — the property the reference's gap-scan + current-day
    delete+reload machinery exists to provide (SURVEY §2.11 I2)."""
    from innercircle_etl_spark.plans.pipeline_queries import (
        repair_cycle,
        seed_damaged_warehouse,
    )

    wh = seed_damaged_warehouse(spark, sf_dir)
    first = sorted(
        map(tuple, repair_cycle(spark, sf_dir, wh).collect())
    )
    second = sorted(
        map(tuple, repair_cycle(spark, sf_dir, wh).collect())
    )
    assert first == second
    assert len(first) > 0


def test_merge_into_empty_source_is_identity(spark, sf_dir):
    """MERGE with an empty source must return the target unchanged
    (all three WHEN branches vacuous)."""
    from innercircle_etl_spark.operators.merge import merge_into
    from innercircle_etl_spark.plans.registry import load
    from pyspark.sql import functions as F

    target = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    empty = target.filter(F.lit(False)).withColumn("op", F.lit("U"))
    out = merge_into(
        target, empty, keys=["c_custkey"],
        delete_cond=F.col("op") == "D",
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, target.collect())
    )


def test_merge_into_subsumes_insert_if_absent(spark, sf_dir):
    """U1 is MERGE with no update columns and no delete clause —
    the two operators must agree row-for-row."""
    from innercircle_etl_spark.operators.merge import merge_into
    from innercircle_etl_spark.operators.upsert import insert_if_absent
    from innercircle_etl_spark.plans.registry import load
    from pyspark.sql import functions as F

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    target = cust.filter(F.col("c_custkey") % 2 == 0)
    source = cust.filter(F.col("c_custkey") % 3 == 0)
    via_merge = merge_into(
        target, source, keys=["c_custkey"], update_cols=[]
    )
    via_u1 = insert_if_absent(target, source, ["c_custkey"])
    assert sorted(map(tuple, via_merge.collect())) == sorted(
        map(tuple, via_u1.collect())
    )


def test_backfill_180_day_gap_bounded_plan(spark):
    """A 180-day outage repairs through run_daily with a plan whose
    size does not grow with the gap length (round-3 built one union
    branch per day — a months-long backfill was a driver-side plan
    bomb), and in ONE builder invocation when the batch allows it."""
    import datetime as dt
    import shutil

    from pyspark.sql import functions as F

    from innercircle_etl_spark.pipeline import (
        run_daily,
        write_daily_partitioned,
    )

    d0 = dt.date(2001, 1, 1)
    days = [d0 + dt.timedelta(i) for i in range(200)]
    src = spark.createDataFrame(
        [(d, i % 5, float(i)) for i, d in enumerate(days)],
        "d date, k int, v double",
    )
    wh = "/root/repo/.scratch/test_backfill_180"
    shutil.rmtree(wh, ignore_errors=True)
    write_daily_partitioned(src.filter(F.col("d") < days[20]), wh)

    calls: list[list[str]] = []

    def build_days(ds):
        calls.append(list(ds))
        wanted = [dt.date.fromisoformat(x) for x in ds]
        return src.filter(F.col("d").isin(wanted))

    # plan size must not scale with the day count: no per-day unions
    plan = (
        build_days([str(d) for d in days[20:]])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    calls.clear()
    assert "Union" not in plan

    repaired = run_daily(
        spark,
        wh,
        build_days,
        run_date=str(days[-1]),
        lookback_start=str(days[0]),
        lookback_end=str(days[-1]),
    )
    # one batch -> one builder call covering all 180 missing days
    assert len(calls) == 1
    assert len(calls[0]) == 180
    got = sorted(map(tuple, repaired.select("d", "k", "v").collect()))
    want = sorted(map(tuple, src.collect()))
    assert got == want

    # chunked path: small batches still converge to the same table
    shutil.rmtree(wh, ignore_errors=True)
    write_daily_partitioned(src.filter(F.col("d") < days[20]), wh)
    calls.clear()
    repaired = run_daily(
        spark,
        wh,
        build_days,
        run_date=str(days[-1]),
        lookback_start=str(days[0]),
        lookback_end=str(days[-1]),
        batch_days=50,
    )
    assert [len(c) for c in calls] == [50, 50, 50, 30]
    got = sorted(map(tuple, repaired.select("d", "k", "v").collect()))
    assert got == want
    shutil.rmtree(wh, ignore_errors=True)
