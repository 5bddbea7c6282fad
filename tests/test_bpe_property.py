"""Model-based check of the fenced-string BPE merge trick.

tok_bpe_merges' correctness rests on one claim (tokenizer_queries
module doc): applying a merge (a, b) to the ``|``-fenced symbol
string with a plain left-to-right non-overlapping ``replace`` is
EXACTLY the reference BPE merge — greedy left-to-right over the
symbol sequence. Both engines' ``replace`` and Python's
``str.replace`` share that scan order, so the property is checked
here against an independent list-walking reference implementation
over hypothesis-generated symbol sequences (multi-char symbols
included — the case where naive substring matching would cross a
symbol boundary).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

SYMS = ["a", "b", "c", "ab", "bc", "aa", "cab"]


def fence(syms: list[str]) -> str:
    return "".join(f"|{s}|" for s in syms)


def merge_reference(syms: list[str], a: str, b: str) -> list[str]:
    """Reference BPE merge: walk left to right, fuse each first
    (a, b) adjacency, never re-match into a symbol just produced."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(max_examples=300, deadline=None)
@given(
    syms=st.lists(st.sampled_from(SYMS), min_size=1, max_size=12),
    a=st.sampled_from(SYMS),
    b=st.sampled_from(SYMS),
)
def test_fenced_replace_is_reference_bpe_merge(syms, a, b):
    got = fence(syms).replace(f"|{a}||{b}|", f"|{a + b}|")
    want = fence(merge_reference(syms, a, b))
    assert got == want, (syms, a, b, got, want)


@settings(max_examples=200, deadline=None)
@given(syms=st.lists(st.sampled_from(SYMS), min_size=2, max_size=12))
def test_pair_counting_counts_all_adjacencies(syms):
    """The counting side (transform over sequence) counts EVERY
    adjacent pair including overlaps — reference get_stats. The
    model here is the trivial zip; the Spark expression mirrors it
    index-for-index, so this pins the i-1/i (0-based) arithmetic
    used in _bpe_train against an off-by-one."""
    pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
    # mirror of the Spark expr: sequence(1, size-1), i -> (i-1, i)
    mirrored = [(syms[i - 1], syms[i]) for i in range(1, len(syms))]
    assert pairs == mirrored
