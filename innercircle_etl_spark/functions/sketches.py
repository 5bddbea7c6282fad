"""Hash-sketch column expressions: shingles, MinHash, SimHash, LSH.

These are the scale path for deduplication and similarity: instead of
the O(n²) pair space, candidates come from hash-bucket collisions —
shuffle on the bucket key, compare only within buckets.

Algorithms are the standard public constructions: MinHash resemblance
sketches (Broder, "On the resemblance and containment of documents",
1997) with the double-hashing family h_i = h1 + i*h2 (Kirsch &
Mitzenmacher 2006); LSH banding (Leskovec/Rajaraman/Ullman, "Mining of
Massive Datasets" ch. 3); SimHash (Charikar, "Similarity estimation
techniques from rounding algorithms", STOC 2002) with the
multi-block pigeonhole index of Manku/Jain/Sarma (WWW 2007). The
exact n-gram path in plans/dedup_queries.py is AllPairs/PPJoin prefix
filtering (Bayardo/Ma/Srikant WWW 2007; Xiao/Wang/Lin/Yu WWW 2008).

Engine-parity note: every hash bottoms out in md5 (available and
identical in Spark and DuckDB), with hex-string or hex→int
transport, so each sketch has an exact SQL oracle. Production would
swap md5 for xxhash64 (F.xxhash64, ~10x faster) — the operator shape
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a token array (empty if < k
    tokens).

    The token expression is let-bound through a 1-element transform()
    so it evaluates ONCE per row: higher-order functions are
    interpreted (no codegen CSE), so referencing `toks` directly in
    the per-shingle lambda would re-evaluate it — typically a full
    split(text) — once per shingle."""

    def _shingles(t: Column) -> Column:
        n = F.size(t)
        return F.when(
            n >= k,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(t, i, k)),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), _shingles), 1)


def char_ngrams(text: Column, k: int = 3) -> Column:
    """Distinct character k-grams (empty if text shorter than k)."""
    n = F.length(text)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.substring(text, i, k),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


# Prime just below 2^32 for the double-hashing minhash family
# h_i = (h1 + i*h2) mod P. With h1,h2 < 2^32 and i < ~64 the products
# stay < 2^38 — no BIGINT overflow in either engine.
MINHASH_P = 4294967291


def shingle_hashes(shingle_arr: Column) -> tuple[Column, Column]:
    """Two independent 32-bit hash arrays from ONE md5 per shingle
    (first/second 8 hex chars). Materialize these as columns before
    deriving the signature so md5 runs once, not num_hashes times."""
    mh = F.transform(shingle_arr, F.md5)
    h1 = F.transform(
        mh, lambda s: F.conv(F.substring(s, 1, 8), 16, 10).cast("long")
    )
    h2 = F.transform(
        mh, lambda s: F.conv(F.substring(s, 9, 8), 16, 10).cast("long")
    )
    return h1, h2


def minhash_from_hashes(h1: Column, h2: Column, num_hashes: int) -> list[Column]:
    """MinHash signature via double hashing: min over shingles of
    (h1 + i*h2) mod P for each of the num_hashes derived functions.
    One md5 per shingle total — the classic cost reduction vs. one
    full hash per (shingle, function)."""
    return [
        F.array_min(F.zip_with(h1, h2, lambda a, b: (a + i * b) % MINHASH_P))
        for i in range(num_hashes)
    ]


def lsh_band_keys(sigs: list[Column], bands: int) -> Column:
    """Concatenate the signature into ``bands`` band keys (array).
    Docs sharing ANY band key are candidate pairs."""
    rows = len(sigs) // bands
    return F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[s.cast("string") for s in sigs[b * rows : (b + 1) * rows]],
            )
            for b in range(bands)
        ]
    )


def word_hash32(word: Column) -> Column:
    """32-bit word hash: first 8 md5 hex chars → BIGINT (oracle:
    ('0x'||substr(md5(w),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("long")


def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash per document: per-bit majority vote over token
    hashes (token multiplicity = weight). One explode + one groupBy —
    shuffles once on the doc id; at scale the explode is map-local so
    partial aggregation absorbs most of it."""
    toks = F.explode(F.split(F.col(text_col), " ")).alias("__tok")
    exploded = df.select(F.col(id_col), toks).select(
        id_col, word_hash32(F.col("__tok")).alias("__h")
    )
    # per-bit vote = 2*sum(bit) - n (exact integer identity for
    # sum(+1/-1 per bit)): plain bit sums drop the 32 per-row CASE
    # branches of the naive +-1 form — same partial-agg width
    # (32 longs + 1 count), bit-identical majority (vote > 0 iff
    # 2*sum_b > n). r16 optimization, guide §1.2 per-task work.
    bit_sums = [
        F.sum(F.shiftright(F.col("__h"), b).bitwiseAND(1)).alias(f"__b{b}")
        for b in range(32)
    ]
    voted = exploded.groupBy(id_col).agg(
        *bit_sums, F.count(F.lit(1)).alias("__n")
    )
    sim = None
    for b in range(32):
        term = F.when(
            2 * F.col(f"__b{b}") > F.col("__n"), F.lit(1 << b)
        ).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return voted.select(id_col, sim.cast("long").alias("simhash"))


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit hashes stored as longs."""
    return F.bit_count(a.bitwiseXOR(b)).cast("int")
