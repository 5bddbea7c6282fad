"""Unit tests for tools/make_sfN.py's de-aliased replica transforms
(round 9): the text permutations and embedding sign patterns must be
pairwise distinct for any realistic factor — the round-8 rotation
aliased replicas i and i+26 into exact cross-replica duplicates, and
the mod-97-linear sign pattern pigeonholed at factor > 97.
"""

from __future__ import annotations

import string
import sys

sys.path.insert(0, "/root/repo")

from tools.make_sfN import _SIGN_P, _sign_params, perm  # noqa: E402

ALPHA = string.ascii_lowercase


def test_perm_identity_at_replica_zero():
    assert perm(0) == ALPHA


def test_perm_is_a_derangement_of_the_alphabet():
    for i in range(1, 64):
        p = perm(i)
        assert sorted(p) == sorted(ALPHA)  # a true permutation
        assert all(a != b for a, b in zip(p, ALPHA))  # no fixed point


def test_perms_distinct_well_past_the_old_26_cycle():
    ps = [perm(i) for i in range(256)]
    assert len(set(ps)) == 256


def test_sign_patterns_distinct_well_past_the_old_97_cycle():
    pats = {
        (o % _SIGN_P, s % _SIGN_P)
        for o, s in (_sign_params(i) for i in range(1, 256))
    }
    assert len(pats) == 255
    # stride must never be 0 mod P (a 0-stride pattern is constant
    # in d and would flip either all or none of the dims)
    assert all(s % _SIGN_P != 0 for _, s in map(_sign_params, range(1, 256)))


def test_sign_pattern_flips_about_half_the_dims():
    # ~P/2 of the residues flip; over 64 dims expect a non-trivial,
    # non-degenerate flip count for every replica
    for i in range(1, 64):
        off, stride = _sign_params(i)
        flips = sum(
            1 for d in range(1, 65) if (off + d * stride) % _SIGN_P < _SIGN_P // 2
        )
        assert 10 <= flips <= 54, (i, flips)
