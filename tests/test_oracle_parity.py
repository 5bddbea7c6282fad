"""Driver-mirror correctness gate: every registered query vs its
DuckDB oracle at a small SF — row count, column names, and an
order-insensitive exact value comparison. Passing here is designed to
predict passing the driver's CORRECTNESS check at sf=0.01.
"""

from __future__ import annotations

import datetime
import math

import pytest

from innercircle_etl_spark.plans import ORACLES, QUERIES


def _canon_cell(v):
    """Canonicalize one cell so Spark and DuckDB results compare
    exactly: floats by bit pattern (NaN normalized), timestamps/dates
    by ISO string, Decimals by normalized string, arrays recursively."""
    if v is None:
        return "\x00NULL"
    # date vs midnight-timestamp is a pandas conversion artifact
    # (DuckDB fetchdf -> datetime64, Spark toPandas -> datetime.date);
    # tools/verify_local.py (the driver mirror) treats them as equal
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat(sep=" ")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_rows(df):
    """pandas DataFrame -> sorted list of row tuples, columns ordered
    by name (the driver sorts columns by name before hashing)."""
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    spark_pd = sdf.toPandas()

    if name not in ORACLES:
        # non-SQL-expressible op: the driver's weaker rows-only check
        assert len(spark_pd) >= 0
        return

    duck_pd = duck.execute(ORACLES[name]).fetchdf()

    assert len(spark_pd) == len(duck_pd), (
        f"{name}: row count {len(spark_pd)} != oracle {len(duck_pd)}"
    )
    s_cols, s_rows = _canon_rows(spark_pd)
    d_cols, d_rows = _canon_rows(duck_pd)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != oracle {d_cols}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{mismatches[0][1]} != {mismatches[0][2]}"
    )
