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
- documents: doc_id offsets; replica i>0 TEXT is alphabet-ROTATED
  (translate a..z -> rotated a..z) so replicas are NOT trigram/
  MinHash near-dups of each other — a naive 10x copy would make
  every cross-replica pair an exact dup and the pair-producing
  dedup queries would grow O(factor^2), measuring fixture artifacts
  instead of scan scaling. Length and char-class statistics are
  preserved, and within-replica planted near-dups still work
  (planting is derived from doc_id at query time).
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


def rotated(i: int) -> str:
    k = (i * 7) % 26 or (1 if i else 0)
    return ALPHA[k:] + ALPHA[:k]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
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
                        f"translate(text, '{ALPHA}', '{rotated(i)}') AS text"
                    )
                elif t == "embeddings" and c == "embedding" and i > 0:
                    # deterministic per-(replica, dim) sign pattern;
                    # ~half the dims flip, distinct pattern per i
                    sel.append(
                        "CAST([CASE WHEN (("
                        f"{i} * 2654435761 + d * 40503) % 97) < 48"
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
