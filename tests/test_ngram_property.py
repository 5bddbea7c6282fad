"""Losslessness property for ngram_jaccard_pairs: the PPJoin
prefix/positional/length pruning must find EXACTLY the pairs a
brute-force all-pairs trigram Jaccard finds — at several thresholds,
including the rounding edge cases (n=10 grams, where float
ceil(0.9*n) goes wrong) and identical-copy pairs (J=1).
"""

from __future__ import annotations

import pytest

from innercircle_etl_spark.plans.dedup_queries import ngram_jaccard_pairs


def _grams(t: str) -> frozenset:
    return frozenset(t[i : i + 3] for i in range(len(t) - 2))


def _brute(corpus: list[tuple[int, str]], t: float) -> dict:
    out = {}
    docs = [(i, _grams(s)) for i, s in corpus if len(s) >= 3]
    for x in range(len(docs)):
        for y in range(x + 1, len(docs)):
            (ia, ga), (ib, gb) = docs[x], docs[y]
            jac = len(ga & gb) / len(ga | gb)
            if jac >= t:
                out[(min(ia, ib), max(ia, ib))] = jac
    return out


def _corpus() -> list[tuple[int, str]]:
    rows = []
    for i in range(25):
        base = f"the quick brown fox {i} jumps over the lazy dog {i * 7}"
        rows.append((i, base))
        if i % 5 == 0:
            rows.append((100 + i, base + "!"))      # near-dup
        if i % 7 == 0:
            rows.append((200 + i, base))            # exact copy (J=1)
    # rounding edge: exactly 10 grams (12 chars) — ceil(0.9*10) must
    # be 9, not 8; a float-ceil bug drops this true pair
    rows.append((300, "abcdefghijkl"))
    rows.append((301, "abcdefghijkl"))
    # short and sub-gram strings
    rows.append((302, "xyz"))
    rows.append((303, "xy"))
    return rows


@pytest.mark.parametrize("t_num,t_den", [(9, 10), (4, 5), (1, 2)])
def test_ngram_pairs_match_brute_force(spark, t_num, t_den):
    corpus = _corpus()
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, t_num, t_den).collect()
    }
    want = _brute(corpus, t_num / t_den)
    assert set(got) == set(want), (
        f"t={t_num}/{t_den}: missing={set(want) - set(got)}, "
        f"extra={set(got) - set(want)}"
    )
    for k, jac in want.items():
        assert abs(got[k] - jac) < 1e-12, (k, got[k], jac)


def test_wide_vocab_array_verify_matches_bitset(spark, sf_dir, monkeypatch):
    """The round-9 adaptive verify: forcing the wide-vocab regime
    (rank-array intersect instead of packed-bitset popcount) must
    produce the EXACT same pair set and jaccard values — the
    representation is a memory trade, never a semantics change.
    (The real trigger is vocab > 64k grams, where the per-doc bitset
    is vocab/8 bytes and the sf10 w5 verify side broke Spark's 8 GB
    HashedRelation cap; at test scale we force the switch instead.)"""
    from innercircle_etl_spark.plans import dedup_queries as D

    bitset = sorted(
        tuple(r)
        for r in D.dedup_ngram_jaccard(spark, sf_dir).collect()
    )
    monkeypatch.setattr(D, "_BITSET_MAX_LONGS", 0)
    wide = sorted(
        tuple(r)
        for r in D.dedup_ngram_jaccard(spark, sf_dir).collect()
    )
    assert wide == bitset and len(bitset) > 0


def test_verify_side_degrades_to_shuffle_join(spark, sf_dir, monkeypatch):
    """When the estimated verify payload exceeds the broadcast cap,
    the SAME two verify joins must run as non-broadcast joins on the
    doc-id keys (never crash, never cartesian) and still produce the
    identical result."""
    from innercircle_etl_spark.plans import dedup_queries as D

    expected = sorted(
        tuple(r)
        for r in D.dedup_ngram_jaccard(spark, sf_dir).collect()
    )
    monkeypatch.setattr(D, "_VERIFY_BCAST_MAX_BYTES", 0)
    df = D.dedup_ngram_jaccard(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    got = sorted(tuple(r) for r in df.collect())
    assert got == expected and len(expected) > 0
