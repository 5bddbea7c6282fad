"""EP8: the end-to-end LLM training-corpus pipeline as one DAG —
the composition the north-star families exist for:

    quality gate -> PII scrub -> exact dedup -> near-dup removal
    (MinHash-LSH, keep-canonical) -> sequence packing into shards

Each stage is the registry operator's logic inlined over the shared
corpus flow; the output is the per-(lang, shard) manifest a training
run consumes. Every stage is a narrow projection, a groupBy, or a
candidate-restricted join — the whole pipeline is one pass over the
documents plus the MinHash candidate machinery, no driver state.

Oracle = the same chain in SQL, reusing the MinHash pair CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from innercircle_etl_spark.functions import text as TX
from innercircle_etl_spark.plans.dedup_queries import _MINHASH_ORACLE
from innercircle_etl_spark.plans.dedup_queries import (
    dedup_minhash_lsh,
)
from innercircle_etl_spark.plans.planting import (
    DOC_EXACT_MOD,
    DOC_NEAR_MOD,
    PLANT_ID_OFFSET,
)
from innercircle_etl_spark.plans.registry import load, register

_MIN_WORDS = 20
_PACK_BUDGET = 2048

_EP8_ORACLE = f"""
WITH corpus AS (
    SELECT doc_id, lang, text FROM documents
    UNION ALL   -- planted exact copies (the dedup_exact fixture, offset
                -- to 2x so ids cannot collide with the near-dups)
    SELECT doc_id + {2 * PLANT_ID_OFFSET}, lang, text FROM documents
    WHERE doc_id % {DOC_EXACT_MOD} = 0
    UNION ALL   -- planted near-dups (the MinHash fixture's ' zzz' docs)
    SELECT doc_id + {PLANT_ID_OFFSET}, lang, text || ' zzz'
    FROM documents WHERE doc_id % {DOC_NEAR_MOD} = 0
),
quality AS (
    SELECT doc_id, lang, text
    FROM corpus
    WHERE len(string_split(text, ' ')) >= {_MIN_WORDS}
),
scrubbed AS (
    SELECT doc_id, lang,
           regexp_replace(text, '[a-z0-9]+@[a-z]+\\.[a-z]+', '<EMAIL>',
                          'g') AS text
    FROM quality
),
exact_kept AS (
    SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM scrubbed
    ) WHERE rn = 1
),
near_pairs AS (
    SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE})
),
-- non-canonical side of any near-dup pair is dropped (planted pairs
-- live at doc_id+100000, so survivors keep the lower id)
near_kept AS (
    SELECT k.doc_id, k.lang, k.text
    FROM exact_kept k
    LEFT JOIN (SELECT DISTINCT doc_b FROM near_pairs) d
      ON k.doc_id = d.doc_b
    WHERE d.doc_b IS NULL
),
toks AS (
    SELECT doc_id, lang,
           len(regexp_extract_all(text,
               ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +')) AS n_tok
    FROM near_kept
),
packed AS (
    SELECT lang, doc_id, n_tok,
           CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok)
                      / {_PACK_BUDGET}) AS BIGINT) AS shard_id
    FROM toks
)
SELECT lang, shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM packed GROUP BY lang, shard_id
"""


@register("ep8_corpus_pipeline", oracle=_EP8_ORACLE)
def ep8_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-corpus preprocessing chain — see module
    docstring. Near-dup removal consumes the MinHash-LSH pairs
    (sub-linear candidates, exact verify) and drops each pair's
    non-canonical side with one anti-join."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    exact_copies = docs.filter(F.col("doc_id") % DOC_EXACT_MOD == 0).select(
        (F.col("doc_id") + 2 * PLANT_ID_OFFSET).alias("doc_id"),
        "lang",
        "text",
    )
    # planted synthetic near-dups (see dedup_queries module doc)
    near_copies = docs.filter(F.col("doc_id") % DOC_NEAR_MOD == 0).select(
        (F.col("doc_id") + PLANT_ID_OFFSET).alias("doc_id"),
        "lang",
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.unionByName(exact_copies).unionByName(near_copies)

    quality = corpus.filter(
        F.size(F.split(F.col("text"), " ")) >= _MIN_WORDS
    )
    scrubbed = quality.select(
        "doc_id",
        "lang",
        F.regexp_replace(
            F.col("text"), "[a-z0-9]+@[a-z]+\\.[a-z]+", "<EMAIL>"
        ).alias("text"),
    )
    w_exact = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact_kept = (
        scrubbed.withColumn("rn", F.row_number().over(w_exact))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    losers = (
        dedup_minhash_lsh(spark, sf_dir).select("doc_b").distinct()
    )
    near_kept = exact_kept.join(
        losers, exact_kept.doc_id == losers.doc_b, "left_anti"
    )

    toks = near_kept.select(
        "doc_id",
        "lang",
        TX.bpe_ish_token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    w_pack = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "shard_id",
        F.floor((F.sum("n_tok").over(w_pack) - F.col("n_tok")) / _PACK_BUDGET),
    )
    return packed.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
