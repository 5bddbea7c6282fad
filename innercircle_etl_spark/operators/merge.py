"""Generic MERGE INTO on plain parquet-backed DataFrames.

The reference's write patterns are all special cases of one merge:
insert-if-absent (U1, `etl_utls.py:141-155`), update-matching (U2,
`etl_utls.py:157-175`), conditional flag update (U5,
`update_etl.py:150-174`). This operator is the single API a user
would reach for on Delta/Iceberg — expressed here engine-agnostically
as ONE full-outer join (one shuffle on the merge keys; at scale the
target side is bucketed on the key so only the delta shuffles):

    WHEN MATCHED AND <delete_cond> THEN DELETE
    WHEN MATCHED THEN UPDATE SET <update_cols from source>
    WHEN NOT MATCHED THEN INSERT

The result is the post-merge table; writing it back atomically is
the caller's job (same discipline as operators/upsert.py).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Optional[Sequence[str]] = None,
    delete_cond: Optional[Column] = None,
    insert: bool = True,
) -> DataFrame:
    """Merge ``source`` into ``target`` on equality of ``keys``.

    update_cols: target columns overwritten from the source on match
      (default: every non-key column the two frames share).
    delete_cond: boolean over SOURCE columns; matched rows where it
      holds are deleted. Evaluated before the update.
    insert: unmatched source rows are appended (projected to the
      target schema; source must carry every target column).
    """
    if update_cols is None:
        update_cols = [
            c for c in target.columns if c not in keys and c in source.columns
        ]
    s = source
    if delete_cond is not None:
        # SQL MERGE 'WHEN MATCHED AND cond THEN DELETE' treats a NULL
        # condition as not-matched → the row is kept, not deleted.
        s = s.withColumn("__del", F.coalesce(delete_cond, F.lit(False)))
    else:
        s = s.withColumn("__del", F.lit(False))
    s = s.select(
        *[F.col(k).alias(k) for k in keys],
        *[
            F.col(c).alias(f"__s_{c}")
            for c in source.columns
            if c not in keys
        ],
        "__del",
        F.lit(True).alias("__s_present"),
    )
    t = target.withColumn("__t_present", F.lit(True))
    joined = t.join(s, list(keys), "full_outer")

    matched = F.col("__t_present").isNotNull() & F.col(
        "__s_present"
    ).isNotNull()
    deleted = matched & F.col("__del")
    inserted = F.col("__t_present").isNull()

    out_cols = []
    for c in target.columns:
        if c in keys:
            out_cols.append(F.col(c))
        elif c in update_cols:
            # matched → source value; insert → source value;
            # target-only → target value
            out_cols.append(
                F.when(
                    matched | inserted, F.col(f"__s_{c}")
                ).otherwise(F.col(c)).alias(c)
            )
        else:
            src = (
                F.col(f"__s_{c}")
                if f"__s_{c}" in joined.columns
                else F.lit(None)
            )
            out_cols.append(
                F.when(inserted, src).otherwise(F.col(c)).alias(c)
            )
    kept = joined.filter(~deleted)
    if not insert:
        kept = kept.filter(~inserted)
    return kept.select(*out_cols)
