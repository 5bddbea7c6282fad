"""Edge branches not exercised by the registry queries: salted_join
across its allowed join types must equal the plain join, and
merge_into's insert=False mode must update/delete without appending.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from innercircle_etl_spark.operators.merge import merge_into
from innercircle_etl_spark.operators.skew import salted_join


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_for_all_allowed_hows(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (4, "d")], "k int, x string"
    )
    dim = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k int, y int"
    )
    for how in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        plain = fact.join(dim, ["k"], how)
        salted = salted_join(
            fact, dim, ["k"], salt_src=F.col("x"), n_salts=4, how=how
        )
        assert _rows(salted) == _rows(plain), how


def test_merge_into_no_insert_mode(spark):
    """insert=False: matched rows update/delete, unmatched source
    rows are NOT appended (the update-only merge the reference's U2
    uses)."""
    target = spark.createDataFrame(
        [(1, "old"), (2, "old"), (3, "keep")], "k int, v string"
    )
    source = spark.createDataFrame(
        [(1, "new", False), (2, "x", True), (9, "ghost", False)],
        "k int, v string, del boolean",
    )
    out = {
        (r["k"], r["v"])
        for r in merge_into(
            target,
            source.select("k", "v", "del"),
            ["k"],
            update_cols=["v"],
            delete_cond=F.col("del"),
            insert=False,
        ).collect()
    }
    # 1 updated, 2 deleted, 3 untouched, 9 NOT inserted
    assert out == {(1, "new"), (3, "keep")}
