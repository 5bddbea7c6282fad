"""Deduplication operator family over the documents/embeddings
tables (north-star extension: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup).

The synthetic corpus has no duplicates, so each query first builds a
``corpus`` with deterministically planted duplicates/near-duplicates
(expressed identically in the oracle SQL), then runs the dedup
operator. That keeps results non-trivial AND hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from innercircle_etl_spark.functions import sketches as SK
from innercircle_etl_spark.functions import vectors as V
from innercircle_etl_spark.plans.registry import load, register

# ---------------------------------------------------------------- exact

_EXACT_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, text FROM documents WHERE doc_id % 20 = 0
)
SELECT MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM corpus GROUP BY text
"""


@register("dedup_exact", oracle=_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep the smallest id.
    One shuffle on the text (at 100TB: on md5(text) — 16-byte keys
    instead of document bodies; same grouping, tiny shuffle)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dups)
    return corpus.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("keep_id", "n_copies")


# ---------------------------------------------------------- minhash-lsh

_NUM_HASHES, _BANDS = 16, 4
_ROWS = _NUM_HASHES // _BANDS
_P = 4294967291  # keep in sync with sketches.MINHASH_P

_mh_list = ", ".join(
    f"list_min([(h1[j] + {i} * h2[j]) % {_P} "
    f"for j in generate_series(1, len(h1))])"
    for i in range(_NUM_HASHES)
)
_band_list = ", ".join(
    "'%d|' || %s"
    % (
        b,
        " || '|' || ".join(
            f"CAST(m[{b * _ROWS + r + 1}] AS VARCHAR)" for r in range(_ROWS)
        ),
    )
    for b in range(_BANDS)
)

_MINHASH_ORACLE = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, text || ' zzz' FROM documents WHERE doc_id % 25 = 0
),
tok AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM corpus
),
sh AS (
    SELECT doc_id,
           list_distinct([array_to_string(w[i:i+2], ' ')
                          for i in generate_series(1, len(w) - 2)]) AS sh
    FROM tok WHERE len(w) >= 3
),
hashed AS (
    SELECT doc_id, sh, [md5(x) for x in sh] AS mh FROM sh
),
hh AS (
    SELECT doc_id, sh,
           [('0x' || substr(m, 1, 8))::BIGINT for m in mh] AS h1,
           [('0x' || substr(m, 9, 8))::BIGINT for m in mh] AS h2
    FROM hashed
),
sig AS (
    SELECT doc_id, sh, [{_mh_list}] AS m FROM hh
),
bands AS (
    SELECT doc_id, sh, unnest([{_band_list}]) AS band_key FROM sig
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
FROM cand c
JOIN sh sa ON c.doc_a = sa.doc_id
JOIN sh sb ON c.doc_b = sb.doc_id
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.8
"""


@register("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: 3-word shingles → 16 MinHashes → 4 LSH
    bands → band-bucket join for candidates → exact Jaccard verify
    at 0.8.

    This is the sub-linear scale path for dedup at 100TB: candidate
    generation is a shuffle on band keys (each doc emits 4 rows
    regardless of corpus size); only colliding docs are compared.
    Contrast j11_pairs_jaccard (inverted-index exact) and
    dedup_ngram_jaccard (exact verify) — same verify step, different
    candidate generation."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.unionByName(near)

    toks = F.split(F.col("text"), " ")
    sh = corpus.select("doc_id", SK.word_shingles(toks, 3).alias("sh")).filter(
        F.size("sh") > 0
    )
    # materialize the per-shingle hash arrays in their own projection
    # so md5 evaluates once per shingle, not once per hash function
    h1, h2 = SK.shingle_hashes(F.col("sh"))
    hashed = sh.select("doc_id", "sh", h1.alias("h1"), h2.alias("h2"))
    sigs = SK.minhash_from_hashes(F.col("h1"), F.col("h2"), _NUM_HASHES)
    banded = hashed.select(
        "doc_id",
        "sh",
        F.explode(SK.lsh_band_keys(sigs, _BANDS)).alias("band_key"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("band_key").alias("k")
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("band_key").alias("k")
    )
    cand = (
        a.join(b, (a.k == b.k) & (a.doc_a < b.doc_b))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
    )


# -------------------------------------------------------------- simhash

_bit_votes_sql = ", ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(32)
)
_sim_terms_sql = " + ".join(
    f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32)
)

_SIMHASH_ORACLE = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, text || ' zzz' FROM documents WHERE doc_id % 25 = 0
),
tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM corpus
),
hashed AS (
    SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM tok
),
votes AS (
    SELECT doc_id, {_bit_votes_sql} FROM hashed GROUP BY doc_id
),
sim AS (
    SELECT doc_id, CAST({_sim_terms_sql} AS BIGINT) AS simhash FROM votes
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 32-bit per-bit majority vote over token
    hashes; pairs within Hamming distance 3.

    Scale path: candidates via pigeonhole blocking — split the 32-bit
    hash into 4 bytes; any pair within distance ≤3 must agree on at
    least one byte, so a 4-way union of equi-joins on (block_id,
    block_value) finds ALL qualifying pairs with no O(n²) scan. The
    oracle does the brute-force n² compare; both produce the same
    set."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.unionByName(near)
    sim = SK.simhash32(corpus, "doc_id", "text")

    # pigeonhole blocking: 4 blocks of 8 bits
    blocked = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{k}:"),
                        F.shiftright(F.col("simhash"), 8 * k)
                        .bitwiseAND(255)
                        .cast("string"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("block"),
    )
    a = blocked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
        "block",
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
        "block",
    )
    return (
        a.join(b, ["block"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", SK.hamming32(F.col("sim_a"), F.col("sim_b")).alias("hamming")
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )


# ------------------------------------------------------- n-gram jaccard

_NGRAM_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, text || ' zzz' FROM documents WHERE doc_id % 25 = 0
),
grams AS (
    SELECT doc_id,
           list_distinct([substr(text, i, 3)
                          for i in generate_series(1, length(text) - 2)]) AS g
    FROM corpus WHERE length(text) >= 3
),
sizes AS (SELECT doc_id, len(g) AS n FROM grams),
inv AS (SELECT doc_id, unnest(g) AS gram FROM grams),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_common
    FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.9
"""


@register("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram Jaccard near-dup at 0.9, candidates via inverted
    index (explode grams → equi-join on gram → count per pair):
    only pairs sharing ≥1 gram materialize, set sizes join in via
    inclusion-exclusion — no arrays shipped through the shuffle,
    no O(n²). This is the exact (non-sketch) member of the dedup
    family."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.unionByName(near).filter(F.length("text") >= 3)
    grams = corpus.select(
        "doc_id", SK.char_ngrams(F.col("text"), 3).alias("g")
    )
    sizes = grams.select("doc_id", F.size("g").alias("n"))
    inv = grams.select("doc_id", F.explode("g").alias("gram"))
    a = inv.select(F.col("doc_id").alias("doc_a"), "gram")
    b = inv.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        a.join(b, ["gram"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.9)
        .select("doc_a", "doc_b", "jaccard")
    )


# ----------------------------------------------------- embedding cosine

_EMB_ORACLE = """
WITH corpus AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
    UNION ALL
    SELECT vec_id + 100000,
           list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.5)
    FROM embeddings WHERE vec_id % 50 = 0
),
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_reduce(list_transform(generate_series(1, len(a.v)),
                                      i -> a.v[i] * b.v[i]),
                       (x, y) -> x + y)
           / (sqrt(list_reduce(list_transform(a.v, x -> x*x), (x,y) -> x+y))
              * sqrt(list_reduce(list_transform(b.v, x -> x*x), (x,y) -> x+y)))
             AS cos
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos FROM pairs WHERE cos >= 0.99
"""


@register("dedup_embedding_cosine", oracle=_EMB_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: pairs with cosine ≥ 0.99 (planted scaled
    copies have cosine exactly ~1). Brute-force pair generation here
    (500 vecs); the LSH-bucketed variant in similarity_queries.py is
    the same verify over hyperplane-bucket candidates — that's the
    form that scales. Double folds are left-to-right → bit-identical
    to the oracle."""
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", V.as_double(F.col("embedding")).alias("v"))
    planted = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 1.5).alias("v"),
    )
    corpus = base.unionByName(planted)
    a = corpus.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = corpus.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = V.cosine(F.col("va"), F.col("vb"))
    return pairs.select("vec_a", "vec_b", cos.alias("cos")).filter(
        F.col("cos") >= 0.99
    )
