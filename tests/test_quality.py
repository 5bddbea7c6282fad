"""The reference's validation-query corpus as pinned invariants
(SURVEY §5): payment-token distribution, price consistency,
transfers ⊇ trx_union reconciliation, date-gap audit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from innercircle_etl_spark import quality


def test_payment_token_distribution(spark, sf_dir):
    """validation_query.sql:17-40 — the decodable tokens dominate;
    the '<error>' bucket stays under 5% (planted rate is 1/97)."""
    rows = quality.payment_token_distribution(spark, sf_dir).collect()
    total = sum(r["n"] for r in rows)
    bad = sum(r["n"] for r in rows if r["payment_token"].startswith("<error>"))
    assert total > 0
    assert 0 < bad  # the planted malformed rows ARE visible
    assert bad / total < 0.05


def test_price_consistency(spark, sf_dir):
    """validation_query.sql:52-63 — decoded price equals the
    independent recomputation on every transaction (the fixture
    decode is exact; the reference tolerates ~0.1% drift)."""
    cons = quality.price_consistency(spark, sf_dir)
    n_bad = cons.filter(~F.col("consistent")).count()
    assert cons.count() > 0
    assert n_bad == 0


def test_reconciliation_all_misses_explained(spark, sf_dir):
    """exclude_payment_tokens.sql:83-142 — every transfer missing
    from the trx-union side is explained (errored decode or no
    currency row); zero unexplained."""
    miss = quality.reconciliation_missing(spark, sf_dir)
    assert miss.filter(~F.col("explained")).count() == 0


def test_date_gap_audit_matches_oracle(spark, duck, sf_dir):
    """etl_utls.py:340-357 — the gap scan agrees with a DuckDB
    recomputation over the same calendar range."""
    start, end = "2024-01-01", "2024-01-31"
    got = sorted(
        r["missing_date"].isoformat()
        for r in quality.date_gap_audit(spark, sf_dir, start, end).collect()
    )
    want = sorted(
        str(r[0])
        for r in duck.execute(
            f"""
            SELECT d FROM (
                SELECT unnest(generate_series(DATE '{start}', DATE '{end}',
                                              INTERVAL 1 DAY))::DATE AS d
            )
            WHERE d NOT IN (SELECT CAST(ts AS DATE) FROM events)
            """
        ).fetchall()
    )
    assert got == want


def test_quality_report_invariants(spark, sf_dir):
    """The registered q1 metrics frame: decode noise < 5%, zero
    price mismatches, zero unexplained reconciliation misses."""
    rows = {
        r["metric"]: r
        for r in quality.q1_quality_report(spark, sf_dir).collect()
    }
    assert set(rows) == {
        "payment_token_decode",
        "price_consistency",
        "transfers_reconciliation",
        "zero_price_trades",
    }
    assert 0 < rows["payment_token_decode"]["bad_rate"] < 0.05
    assert rows["price_consistency"]["n_bad"] == 0
    assert rows["transfers_reconciliation"]["n_bad"] == 0
    # the reference's own bar: "less than 1% ... weird but fine"
    assert rows["zero_price_trades"]["bad_rate"] < 0.01
