"""AQE skew-join evidence: the runtime half of the skew story.

The engine's skew handling has two layers: the MANUAL salted
join/agg forms (x11/x12, factor sized from the measured key
distribution by `salt_factor`) for skew you know about at authoring
time, and Spark's ADAPTIVE skew-join split (AQE OptimizeSkewedJoin)
for skew you discover at runtime. The manual layer is covered by
tests/test_round6_ops.py; this file proves the adaptive layer
actually engages on a skewed shuffle join in this engine's sessions
— i.e. that nothing in our session factory or plan shapes disables
the 100TB runtime fallback.

AQE's skew trigger compares partition sizes against
skewedPartitionThresholdInBytes (default 256MB) — far above fixture
scale — so the test lowers the thresholds to force the optimizer
down the same code path a genuinely skewed 100TB shuffle would take,
then asserts the executed plan carries the skew-split marker on
the sort-merge join / its AQEShuffleRead.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partitions(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # force the skew path at fixture scale (defaults: 256MB / 5x)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        # keep the join a sort-merge join: broadcast would dodge the
        # skew machinery instead of exercising it
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 1 hot key carrying ~90% of rows + a uniform tail: the
        # shape q4_key_skew_report exists to detect
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("v"),
        )
        # unique-key side: one row per key, so the hot key fans out
        # to |left| matches, not a quadratic blowup
        right = spark.range(200_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k")
        # collect() executes THIS Dataset's queryExecution, so the
        # final adaptive plan is readable from it afterwards
        # (count() would execute a separate derived plan)
        rows = joined.collect()
        # every left row matches exactly one right key; the skew is
        # in the left SHUFFLE (180k rows land on k=0's partition)
        assert len(rows) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # AQE marks the split join "(skew=true)" on the SMJ node and
        # "skewed" on the AQEShuffleRead that fans the hot partition
        # out; accept either spelling across Spark versions
        assert "skew=true" in plan or "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
