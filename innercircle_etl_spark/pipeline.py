"""Entry point 1: the daily batch pipeline (SURVEY §3,
`daily_update_script.py:1-80` + `etl_utls.py:285-357`).

The reference's cron loop is: (1) scan the last N days for date gaps
(`check_table_for_date_gaps`), (2) re-ingest every missing day,
(3) delete+reload the current day so an intraday re-run is idempotent
(`delete_current_day_data`), then (4) refresh the derived cascade.
Here the warehouse is date-partitioned parquet and steps 2–3 are ONE
dynamic-partition-overwrite write: only the repaired date directories
rewrite, everything else is untouched — the Spark-native form of the
reference's per-day DELETE + COPY.

Everything is parameterized by ``run_date`` (no wall clock, SURVEY §4
custom-3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from innercircle_etl_spark.operators.upsert import date_gaps


def write_daily_partitioned(df: DataFrame, path: str, date_col: str = "d"):
    """Write/overwrite only the date partitions present in ``df``
    (U3 at scale: partitionOverwriteMode=dynamic)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(date_col)
        .parquet(path)
    )


def run_daily(
    spark: SparkSession,
    warehouse_path: str,
    build_day: Callable[[str], DataFrame],
    run_date: str,
    lookback_start: str,
    lookback_end: str,
    date_col: str = "d",
) -> DataFrame:
    """One cron cycle: gap-scan the lookback window, then repair every
    missing day PLUS the run date (the reference always reloads the
    current day, `daily_update_script.py:6-39`) in a single dynamic
    partition overwrite. Returns the repaired table.

    ``build_day(day) -> DataFrame`` recomputes one day's rows from the
    source of truth — the reference's per-day BigQuery extract. Days
    are recomputed as one union so the write is one job; at cluster
    scale each day is an independent partition directory and the
    repair parallelizes across executors.
    """
    loaded = spark.read.parquet(warehouse_path)
    missing = [
        r["missing_date"].isoformat()
        for r in date_gaps(
            loaded, date_col, lookback_start, lookback_end
        ).collect()
    ]
    repair_days = sorted(set(missing) | {run_date})
    fresh = None
    for day in repair_days:
        day_df = build_day(day)
        fresh = day_df if fresh is None else fresh.unionByName(day_df)
    if fresh is not None:
        write_daily_partitioned(fresh, warehouse_path, date_col)
    return spark.read.parquet(warehouse_path)
