"""Round-16 optimization internals: pin_concurrently scheduling and
the max_by aggregate form of latest-per-key.

Both changes must be OUTPUT-INVISIBLE: pin_concurrently only
reorders job submission (contents identical to serial pins), and
latest_per_key_agg keeps exactly the window form's rank-1 row when
the (order_col, *tiebreakers) chain is row-unique — the precondition
every caller satisfies (w1: orderkey+linenumber is the table key).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from innercircle_etl_spark.operators.window_dedup import (
    first_per_key,
    first_per_key_agg,
    latest_per_key,
    latest_per_key_agg,
)
from innercircle_etl_spark.plans.registry import pin_concurrently


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_latest_per_key_agg_matches_window_form(spark):
    # 500 rows, 40 keys (~12 dup factor), unique (ts, seq) tiebreak
    # chain with deliberate ts TIES inside keys so the tiebreaker is
    # load-bearing in both forms.
    df = (
        spark.range(500)
        .select(
            (F.col("id") % 40).alias("k"),
            (F.col("id") % 7).alias("ts"),  # ties within key groups
            F.col("id").alias("seq"),  # unique -> total order
            (F.col("id") * 3 % 101).alias("payload"),
        )
    )
    win = latest_per_key(df, ["k"], "ts", tiebreakers=["seq"])
    agg = latest_per_key_agg(df, ["k"], "ts", tiebreakers=["seq"])
    # column order + types preserved (nullability may widen through
    # the struct round-trip; the driver's schema gate compares names
    # and types, not nullability)
    assert [(f.name, f.dataType) for f in agg.schema] == [
        (f.name, f.dataType) for f in win.schema
    ]
    assert _rows(agg, "k") == _rows(win, "k")


def test_first_per_key_agg_matches_window_form(spark):
    df = (
        spark.range(500)
        .select(
            (F.col("id") % 40).alias("k"),
            (F.col("id") % 7).alias("ts"),
            F.col("id").alias("seq"),
            (F.col("id") * 3 % 101).alias("payload"),
        )
    )
    win = first_per_key(df, ["k"], "ts", tiebreakers=["seq"])
    agg = first_per_key_agg(df, ["k"], "ts", tiebreakers=["seq"])
    assert [(f.name, f.dataType) for f in agg.schema] == [
        (f.name, f.dataType) for f in win.schema
    ]
    assert _rows(agg, "k") == _rows(win, "k")


def test_latest_per_key_agg_plan_has_partial_aggregation(spark):
    df = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.col("id").alias("ts"),
        (F.col("id") % 13).alias("v"),
    )
    plan = (
        latest_per_key_agg(df, ["k"], "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # map-side partial before the exchange (guide §2.3), and the
    # window operator is gone entirely
    assert "partial_max_by" in plan
    assert "Window" not in plan


def test_pin_concurrently_matches_serial_pins(spark):
    a = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("x"))
    b = spark.range(50).select(F.col("id"), F.md5(F.col("id").cast("string")).alias("h"))
    c = spark.range(10).groupBy((F.col("id") % 3).alias("g")).count()
    pa, pb, pc = pin_concurrently(a, b, c)
    # argument order preserved, schemas intact
    assert pa.schema == a.schema
    assert pb.schema == b.schema
    assert pc.schema == c.schema
    # contents identical to the unpinned frames
    assert _rows(pa, "id") == _rows(a, "id")
    assert _rows(pb, "id") == _rows(b, "id")
    assert _rows(pc, "g") == _rows(c, "g")
    # each result really is a materialization boundary: the plan
    # reads pinned blocks, not the original lineage
    for pinned in (pa, pb, pc):
        plan = pinned._jdf.queryExecution().optimizedPlan().toString()
        assert "ExistingRDD" in plan or "LogicalRDD" in plan


def test_pin_concurrently_single_frame_fast_path(spark):
    a = spark.range(7).select((F.col("id") + 1).alias("n"))
    (pa,) = pin_concurrently(a)
    assert _rows(pa, "n") == _rows(a, "n")
