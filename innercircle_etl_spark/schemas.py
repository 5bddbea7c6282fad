"""Explicit post-load schema contracts for the warehouse tables
(SURVEY §7 design shape: the reference's schema.sql as code).

``registry.load`` infers from parquet footers — these DDL contracts
pin what every query is allowed to assume, so a fixture or upstream
schema drift fails loudly at the contract test instead of deep
inside a cascade. The events contract is POST-conversion: the
nanosecond parquet column arrives as ``ts timestamp`` (micros) after
the loader's div-1000 conversion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

EXPECTED_SCHEMAS: dict[str, str] = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": (
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    ),
    "supplier": (
        "s_suppkey bigint, s_name string, s_nationkey int, "
        "s_acctbal double"
    ),
    "part": (
        "p_partkey bigint, p_name string, p_brand string, "
        "p_type string, p_size int, p_retailprice double"
    ),
    "orders": (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string"
    ),
    "lineitem": (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp_ntz"
    ),
    "events": (
        # naive micros (parquet timestamp[us], no tz); the legacy nanos
        # fixture is converted to the SAME type by registry.load()
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    ),
    "documents": (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ),
    "embeddings": "vec_id bigint, embedding array<float>, label int",
}


def schema_drift(df: DataFrame, table: str) -> list[str]:
    """Field-level diff of a loaded table against its contract;
    empty list = conforming. Used by the schema-contract test and
    callable as a pre-flight data-quality check."""
    want = [
        tuple(part.rsplit(" ", 1))
        for part in (
            p.strip() for p in EXPECTED_SCHEMAS[table].split(",")
        )
        if part
    ]
    # array<float> contains a comma after naive splitting — rebuild
    # from the authoritative dict instead of parsing when needed
    if table == "embeddings":
        want = [
            ("vec_id", "bigint"),
            ("embedding", "array<float>"),
            ("label", "int"),
        ]
    got = df.dtypes
    problems = []
    if [n for n, _ in got] != [n for n, _ in want]:
        problems.append(
            f"{table}: column order/names {[n for n, _ in got]} != "
            f"{[n for n, _ in want]}"
        )
    for (gn, gt), (wn, wt) in zip(got, want):
        if gn == wn and gt != wt:
            problems.append(f"{table}.{gn}: type {gt} != {wt}")
    return problems
