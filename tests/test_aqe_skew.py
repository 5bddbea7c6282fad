"""AQE skew-join splitting demo: plant a pathologically hot key,
lower the skew thresholds to fixture scale, and assert the runtime
re-plan actually splits the skewed partition (AQEShuffleRead marks
it ``skew=true``). This is mitigation #1 from operators/skew.py's
module doc — automatic, no salting — shown working end to end; the
explicit salting operators (x11/x12) are mitigation #2 for the cases
AQE can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_planted_skew(spark, sf_dir):
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # fixture-scale thresholds: a real cluster keeps the 256MB
        # defaults; the MECHANISM under test is identical
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # keep the join a sort-merge join so there IS a shuffle to split
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # coalescing can merge away the planted skew at this scale
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)

        # planted skew: key 0 carries 50k rows, keys 1..99 carry 50
        hot = spark.range(50_000).select(
            F.lit(0).alias("k"), F.col("id").alias("payload")
        )
        cold = (
            spark.range(100)
            .select((F.col("id") % 99 + 1).alias("k"))
            .crossJoin(spark.range(50).select(F.col("id").alias("payload")))
        )
        fact = hot.unionByName(cold.select("k", "payload"))
        dim = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
        )

        joined = fact.join(dim, "k")
        # AQE finalizes the plan only on execution, and count() would
        # spawn a separate query execution — collect() runs THIS plan
        n = len(joined.collect())
        assert n == 50_000 + 100 * 50

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
