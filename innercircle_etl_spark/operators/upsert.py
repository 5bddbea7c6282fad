"""Upsert / merge family (SURVEY §2.2 U1-U6) on immutable storage.

The reference's signature write pattern is staging-table merges in
Postgres (etl_utls.py:133-175) and day-partition delete+reload
(etl_utls.py:303-313). On Spark + Parquet, mutation becomes
*recomputation of the target state* followed by an atomic overwrite;
these helpers compute the post-merge state as a DataFrame. Writing is
the caller's job (``df.write.mode("overwrite")`` for full rebuilds,
``partitionOverwriteMode=dynamic`` + ``insertInto`` for U3 at scale so
only touched date partitions rewrite).

All are pure and idempotent: applying the same source twice yields
the same target — the property the reference's gap/delete machinery
exists to provide (SURVEY §5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def insert_if_absent(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """U1: append source rows whose key is not yet in target.

    Reference: staging + ``INSERT ... LEFT JOIN ... WHERE t.key IS
    NULL`` (etl_utls.py:141-155). Spark: left_anti join — a single
    shuffle on the key, broadcastable when target keys are small.
    Source rows are deduped on the key first (deterministically, by
    the full row ordering) so the result preserves key uniqueness.
    """
    src = source.dropDuplicates(list(keys))
    new_rows = src.join(target.select(*keys).distinct(), list(keys), "left_anti")
    return target.unionByName(new_rows)


def merge_update(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str],
) -> DataFrame:
    """U2: for rows whose key matches, take ``update_cols`` from
    source (non-null source value wins); all other target rows/cols
    unchanged. Reference: dynamic ``UPDATE ... FROM`` reading columns
    from information_schema (etl_utls.py:157-175).
    """
    src_cols = list(keys) + [c for c in update_cols]
    src = source.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in update_cols],
    ).dropDuplicates(list(keys))
    joined = target.join(src, list(keys), "left")
    out_cols: list[Column] = []
    for c in target.columns:
        if c in update_cols:
            out_cols.append(F.coalesce(F.col(f"__s_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def partition_delete_reload(
    target: DataFrame,
    source: DataFrame,
    partition_expr: Column,
    partition_value,
) -> DataFrame:
    """U3: idempotent day re-run — drop the target rows in one
    partition, append the fresh batch (etl_utls.py:303-313,
    update_etl.py:306). At scale: write with dynamic partition
    overwrite instead of full rewrite; this helper expresses the
    resulting state for testing/oracle parity.
    """
    kept = target.filter(~(partition_expr == F.lit(partition_value)))
    return kept.unionByName(source)


def conditional_flag_update(
    target: DataFrame,
    matches: DataFrame,
    keys: Sequence[str],
    flag_col: str,
    flag_value=True,
) -> DataFrame:
    """U5: ``UPDATE t SET flag=v WHERE key IN (subquery)``
    (update_etl.py:150-174, :1216-1228). Spark: left join to the
    match-key set + ``when``. Matches are reduced to distinct keys →
    broadcastable."""
    m = matches.select(*keys).distinct().withColumn("__hit", F.lit(True))
    joined = target.join(m, list(keys), "left")
    out = [
        F.when(F.col("__hit"), F.lit(flag_value)).otherwise(F.col(c)).alias(c)
        if c == flag_col
        else F.col(c)
        for c in target.columns
    ]
    return joined.select(*out)


def date_gaps(
    loaded: DataFrame, date_col: str, start: str, end: str
) -> DataFrame:
    """U6: expected-dates EXCEPT loaded-dates (etl_utls.py:340-357,
    driven by dim_dates.csv). Spark: a generated date dimension
    anti-joined to the distinct loaded dates. Returns one column
    ``missing_date`` sorted ascending."""
    spark = loaded.sparkSession
    dates = spark.sql(
        f"SELECT explode(sequence(DATE '{start}', DATE '{end}', "
        f"INTERVAL 1 DAY)) AS missing_date"
    )
    have = loaded.select(
        F.to_date(F.col(date_col)).alias("missing_date")
    ).distinct()
    return dates.join(have, "missing_date", "left_anti").orderBy("missing_date")
