"""Synthesize a larger scale factor from the driver's sf0.1 fixtures.

The driver ships sf{0.001,0.01,0.1} only; validating that the plan
SHAPES (not just the constants) survive a 10x scale-up needs a
bigger input. This tool replicates each sf0.1 table ``factor`` times
with consistent key offsets so every foreign key keeps resolving:

- customer/orders/lineitem/part/supplier/events: replica ``i``
  offsets each key domain by ``i * (max_key + 1)`` of its owning
  table (o_custkey moves with c_custkey, l_partkey with p_partkey,
  events.user_id with c_custkey — the i13 CDC merge joins them).
- nation/region: true dimensions, copied once.
- documents: doc_id offsets; replica i>0 TEXT goes through a
  per-replica PERMUTATION of a..z (translate a..z -> perm_i(a..z))
  so replicas are NOT trigram/MinHash near-dups of each other — a
  naive 10x copy would make every cross-replica pair an exact dup
  and the pair-producing dedup queries would grow O(factor^2),
  measuring fixture artifacts instead of scan scaling. A FULL
  permutation (26! keyspace, deterministic Fisher-Yates seeded by
  i) rather than the original Caesar rotation: rotations cycle
  after 26 replicas, so factor>26 re-aliased replica pairs into
  exact dups and the sf10 dedup walls measured fixture structure
  (round-8 SCALE.md boundary; round-9 fix). Distinctness across
  replicas is asserted at generation time. Length and char-class
  statistics are preserved, and within-replica planted near-dups
  still work (planting is derived from doc_id at query time).
- embeddings: vec_id offsets; replica i>0 flips the SIGN of a
  per-(replica, dimension) pseudo-random half of the coordinates.
  Sign flips preserve every norm and every within-replica cosine
  exactly (s_d^2 = 1) while decorrelating across replicas, so ANN
  workloads scale in corpus size without 10 exact copies of every
  vector. Replica 0 is byte-identical to the source for all tables.

This output is for BENCHMARKING plan shapes at volume — it is not a
correctness fixture (oracle checks stay on the driver's own files).

Usage: python tools/make_sfN.py [factor] [out_dir]
       (defaults: 10 /root/repo/.scratch/sf1)
"""

from __future__ import annotations

import os
import string
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SFN_SRC", "/root/testdata/sf0.1")

# key column -> (owning table, owning column) for offset bases
DOMAINS = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ord": ("orders", "o_orderkey"),
    "ev": ("events", "event_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

# table -> {column: domain}
OFFSETS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "ord",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "ev", "user_id": "cust"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

ALPHA = string.ascii_lowercase


def perm(i: int) -> str:
    """Deterministic alphabet permutation for replica ``i``.

    Replica 0 is the identity (byte-identical replica). For i>0 a
    Fisher-Yates shuffle driven by a fixed-constant LCG (no
    dependence on Python's ``random`` internals) picks one of 26!
    permutations — the round-8 ``rotated()`` only had 26 rotations,
    so replicas i and i+26 got IDENTICAL text and every such pair
    was an exact cross-replica dup at factor>26 (the sf10 dedup
    walls measured that aliasing, not the plans). Derangement is
    additionally enforced (no fixed points) so no replica shares
    even single-character statistics-free identity with the source.
    """
    if i == 0:
        return ALPHA
    seed = i
    while True:
        chars = list(ALPHA)
        s = (seed * 2654435761 + 0x9E3779B9) & 0xFFFFFFFF
        for j in range(25, 0, -1):
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            k = s % (j + 1)
            chars[j], chars[k] = chars[k], chars[j]
        p = "".join(chars)
        # reject permutations with any fixed point (a 'derangement'
        # guard): keeps every replica's text fully re-lettered, and
        # incidentally rejects the identity
        if all(a != b for a, b in zip(p, ALPHA)):
            return p
        seed += 1_000_003  # deterministic re-roll


_SIGN_P = 1009  # prime modulus for the per-replica sign pattern


def _mix(x: int) -> int:
    """splitmix64-style avalanche — breaks the mod-P linearity that
    aliased replica sign patterns at factor > P."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


_SIGN_MIN_STRIDE = 16  # ceil(P/64): 64 dims must wrap the residue ring


def _sign_params(i: int) -> tuple[int, int]:
    """(offset, stride) of replica i's sign pattern over dimension d:
    flip iff ((offset + d*stride) % P) < P//2. Stride is drawn from
    [16, P-16]: with 64 dimensions a stride below ceil(P/64) keeps
    all 64 residues inside one window of the ring, so the pattern
    flips almost-all or almost-none of the dims (first cut: replica
    2 drew stride 1 and flipped exactly ONE dim — its embeddings
    were the source's up to one sign, defeating the decorrelation);
    strides near P behave like small negative strides, excluded for
    the same reason. ~P*(P-32) distinct patterns; two replicas
    collide only if BOTH params collide mod P."""
    off = _mix(i) % _SIGN_P
    stride = _SIGN_MIN_STRIDE + _mix(i ^ 0x5DEECE66D) % (
        _SIGN_P - 2 * _SIGN_MIN_STRIDE + 1
    )
    return off, stride


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    # no two replicas may share a text permutation or an embedding
    # sign pattern — the exact aliasing the round-8 26-cycle had
    perms = [perm(i) for i in range(factor)]
    assert len(set(perms)) == factor, "alphabet permutation collision"
    pats = [(0, 0)] + [
        (_sign_params(i)[0] % _SIGN_P, _sign_params(i)[1] % _SIGN_P)
        for i in range(1, factor)
    ]
    assert len(set(pats)) == factor, "embedding sign-pattern collision"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_SFN_THREADS', '8')}")

    bases = {
        dom: con.execute(
            f"SELECT MAX({col}) + 1 FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        for dom, (t, col) in DOMAINS.items()
    }

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied 1x")

    for t, keymap in OFFSETS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        legs = []
        for i in range(factor):
            sel = []
            for c in cols:
                if c in keymap:
                    off = i * bases[keymap[c]]
                    sel.append(f"{c} + {off} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    sel.append(
                        f"translate(text, '{ALPHA}', '{perm(i)}') AS text"
                    )
                elif t == "embeddings" and c == "embedding" and i > 0:
                    # deterministic per-(replica, dim) sign pattern;
                    # ~half the dims flip. The round-8 form was
                    # linear in i mod 97, so replicas i and i+97
                    # aliased to IDENTICAL patterns (pigeonhole at
                    # factor>97) — now the offset AND the stride are
                    # independently mixed per replica in Python over
                    # a larger prime, distinctness asserted below
                    off, stride = _sign_params(i)
                    sel.append(
                        "CAST([CASE WHEN (("
                        f"{off} + d * {stride}) % {_SIGN_P}) < {_SIGN_P // 2}"
                        " THEN -embedding[d] ELSE embedding[d] END"
                        " for d in generate_series(1, len(embedding))]"
                        " AS FLOAT[]) AS embedding"
                    )
                else:
                    sel.append(c)
            legs.append(
                f"SELECT {', '.join(sel)}"
                f" FROM read_parquet('{SRC}/{t}.parquet')"
            )
        q = " UNION ALL ".join(legs)
        con.execute(
            f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows ({factor}x)")


if __name__ == "__main__":
    main()
