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
    # Exact dedup stays the rn=1 window (NOT a min(struct) partial
    # agg): A/B'd round 16 — 2.09-2.27 s window vs 2.40-2.47 s agg
    # min-of-4 twice, because the corpus is ~90% distinct, so the
    # map-side combine removes almost nothing while the hash map
    # pays to hold full-text struct values; the window's sort
    # shuffles the same bytes and spills gracefully.
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


# ------------------------------------------- EP12: training-mix build

# Stage parameters — shared with the single-stage registrations so
# the composite and its parts stay one source of truth.
_EVAL_MOD = 101    # text_queries._EVAL_MOD: every 101st doc is eval
_DECON_K = 8       # 8-word exact-overlap decontamination shingles


def _ep12_oracle() -> str:
    from innercircle_etl_spark.plans.sampling_queries import (
        _DSIR_B,
        _DSIR_TARGET_SQL,
        _h16_sql,
    )
    from innercircle_etl_spark.functions.text import BPE_ISH_PATTERN

    return f"""
WITH pool AS (
    SELECT doc_id, lang, source, text FROM documents
    WHERE doc_id % {_EVAL_MOD} <> 0
    UNION ALL   -- planted leaks: eval text re-entering as train ids
    SELECT doc_id + {PLANT_ID_OFFSET}, lang, source, text
    FROM documents WHERE doc_id % {_EVAL_MOD} = 0
),
psh AS (
    SELECT doc_id,
           unnest(list_distinct(
               [array_to_string(w[i:i+{_DECON_K - 1}], ' ')
                for i in generate_series(1, len(w) - {_DECON_K - 1})]
           )) AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM pool)
    WHERE len(w) >= {_DECON_K}
),
esh AS (
    SELECT DISTINCT
           unnest(list_distinct(
               [array_to_string(w[i:i+{_DECON_K - 1}], ' ')
                for i in generate_series(1, len(w) - {_DECON_K - 1})]
           )) AS g
    FROM (SELECT string_split(text, ' ') AS w FROM documents
          WHERE doc_id % {_EVAL_MOD} = 0)
    WHERE len(w) >= {_DECON_K}
),
contam AS (SELECT DISTINCT p.doc_id FROM psh p JOIN esh e USING (g)),
s1 AS (SELECT * FROM pool
       WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
bg AS (
    SELECT doc_id, {_DSIR_TARGET_SQL} AS is_target,
           unnest([array_to_string(w[i:i+1], ' ')
                   for i in generate_series(1, len(w) - 1)]) AS g
    FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM s1)
    WHERE len(w) >= 2
),
feats AS (
    SELECT doc_id, is_target,
           CAST(({_h16_sql("md5(g)")}) % {_DSIR_B} AS BIGINT) AS b
    FROM bg
),
tmodel AS (
    SELECT b, CAST(COUNT(*) AS BIGINT) AS ct
    FROM feats WHERE is_target GROUP BY b
),
qmodel AS (
    SELECT b, CAST(COUNT(*) AS BIGINT) AS cq FROM feats GROUP BY b
),
ratio AS (
    SELECT q.b, ((COALESCE(t.ct, 0) + 1) * 1000) // (q.cq + 1) AS r
    FROM qmodel q LEFT JOIN tmodel t USING (b)
),
scored AS (
    SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS nb,
           CAST(SUM(r.r) AS BIGINT) AS rs
    FROM feats f JOIN ratio r USING (b) GROUP BY f.doc_id
),
gm AS (SELECT CAST(SUM(rs) // SUM(nb) AS BIGINT) AS cm FROM scored),
sel AS (
    SELECT s.doc_id FROM scored s CROSS JOIN gm
    WHERE (s.rs // s.nb) > gm.cm
),
s2 AS (SELECT * FROM s1 WHERE doc_id IN (SELECT doc_id FROM sel)),
per_lang AS (
    SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
             AS lang_tokens
    FROM s2 GROUP BY lang
),
tot AS (
    SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_langs
    FROM per_lang
),
wts AS (
    SELECT p.lang, CAST(t.total_tokens AS DOUBLE)
             / (t.n_langs * p.lang_tokens) AS w
    FROM per_lang p CROSS JOIN tot t
),
coin AS (
    SELECT s.doc_id, s.lang, s.text, w.w,
           CAST(({_h16_sql("md5(CAST(s.doc_id AS VARCHAR) || s.text)")})
                AS DOUBLE) / 65536.0 AS u
    FROM s2 s JOIN wts w USING (lang)
),
s3 AS (SELECT doc_id, lang, text FROM coin WHERE u < least(1.0, w)),
toksq AS (
    SELECT doc_id, lang,
           len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_tok
    FROM s3
),
packed AS (
    SELECT doc_id, lang,
           CAST(FLOOR((SUM(n_tok) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tok)
                / {_PACK_BUDGET}) AS BIGINT) AS shard_id
    FROM toksq
)
SELECT p.doc_id, p.lang, 'contaminated' AS verdict,
       CAST(NULL AS BIGINT) AS shard_id
FROM pool p JOIN contam c USING (doc_id)
UNION ALL
SELECT doc_id, lang, 'off_target', NULL FROM s1
WHERE doc_id NOT IN (SELECT doc_id FROM sel)
UNION ALL
SELECT doc_id, lang, 'downsampled', NULL FROM coin
WHERE NOT (u < least(1.0, w))
UNION ALL
SELECT doc_id, lang, 'packed', shard_id FROM packed
"""


@register("ep12_training_mix", oracle=_ep12_oracle())
def ep12_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP12: the TRAINING-MIX build — the end-of-pipeline composite
    that turns a cleaned corpus (ep8's output shape) into the shards
    a training run consumes, composed from this repo's registered
    stages in their production order:

      1. DECONTAMINATE (text_decontaminate's 8-word-shingle form):
         drop any train doc sharing an exact shingle with the
         held-out eval set; the fixture plants verbatim leaks so the
         stage actively removes rows.
      2. SELECT (samp_dsir_importance's dsir_scored_and_mean builder):
         keep the above-corpus-mean target-like docs — the DSIR
         data-selection gate; docs too short to carry a bigram
         feature are not selectable.
      3. REBALANCE (samp_weighted_resample's coin): per-language
         inverse-token weights over the SURVIVORS, keep with
         probability min(1, w) decided by the content-hash uniform.
      4. PACK (text_pack_shards' cumulative window): survivors bin
         into per-language {_PACK_BUDGET}-token shards.

    Output: every pool doc labeled contaminated / off_target /
    downsampled / packed, with the shard assignment for packed docs.

    Scale: decontamination broadcasts the benchmark-sized eval
    shingle set; DSIR's models are B-bounded (corpus-size-
    independent) and the ratio table broadcasts; the rebalance
    weight table is language-bounded; packing partitions by
    language — no global order, no driver state. Stage verdict sets
    are eagerly pinned (the ep11 discipline: the 4-leg union
    re-embeds earlier stages; unpinned, each gate would re-run once
    per leg).

    Reference parity: beyond-reference (north-star extension)."""
    from innercircle_etl_spark.functions import sketches as SK
    from innercircle_etl_spark.plans.sampling_queries import (
        _DSIR_TARGET_SQL,
        _h16_sql,
        dsir_scored_and_mean,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    evd = docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
    pool = docs.filter(F.col("doc_id") % _EVAL_MOD != 0).unionByName(
        evd.select(
            (F.col("doc_id") + PLANT_ID_OFFSET).alias("doc_id"),
            "lang",
            "source",
            "text",
        )
    )

    # -- stage 1: decontaminate against the eval shingle set
    toks = F.split(F.col("text"), " ")
    psh = pool.select(
        "doc_id", F.explode(SK.word_shingles(toks, _DECON_K)).alias("g")
    )
    esh = (
        evd.select(F.explode(SK.word_shingles(toks, _DECON_K)).alias("g"))
        .distinct()
    )
    contam = (
        psh.join(F.broadcast(esh), "g")
        .select("doc_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    s1 = pool.join(contam, "doc_id", "anti")

    # -- stage 2: DSIR target-likeness selection. The corpus mean
    # comes from the builder's PINNED B-bounded model table (the
    # sum(cq*r) identity, round 16) — `scored` now has ONE consumer,
    # so the survivor explode+score subtree runs once per pin, not
    # twice.
    scored, gm_mean = dsir_scored_and_mean(
        s1.select(
            "doc_id", F.expr(_DSIR_TARGET_SQL).alias("is_target"), "text"
        )
    )
    gm = gm_mean.select(F.col("corpus_mean").alias("cm"))
    sel = (
        scored.crossJoin(F.broadcast(gm))
        .filter(F.expr("(ratio_sum div n_bigrams) > cm"))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    s2 = s1.join(sel, "doc_id", "semi")

    # -- stage 3: per-language inverse-token rebalance over survivors
    per_lang = s2.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias(
            "lang_tokens"
        )
    )
    tot = per_lang.agg(
        F.sum("lang_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    wts = (
        per_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            (
                F.col("total_tokens").cast("double")
                / (F.col("n_langs") * F.col("lang_tokens"))
            ).alias("w"),
        )
        .localCheckpoint(eager=True)  # lang-bounded; two legs read it
    )
    # -- stage 4 + output assembly in ONE corpus pass (round 11; was
    # a 4-leg union where the contaminated, off_target and packed
    # legs each re-scanned the corpus — the gates were pinned, the
    # legs were not). The two pinned gate sets left-join onto one
    # pool scan (all keyed on doc_id, so consecutive joins reuse one
    # partitioning; at test scale they AQE-broadcast), the verdict
    # is a CASE over the gate flags (the gates are nested subsets —
    # contam over pool, sel over s1 — so precedence reproduces the
    # leg semantics exactly), and the per-language pack window runs
    # as a CONDITIONAL cumulative sum: non-packed rows contribute 0
    # tokens, so packed rows' shard boundaries are identical to a
    # window over the survivors alone.
    #
    # The downsample coin rides INLINE on this pass (round 16, guide
    # §2.4): `wts` is a lang-bounded broadcast, so joining it here
    # and computing u per row costs one md5 per pool row — strictly
    # cheaper than the dedicated corpus pass (pool scan + anti +
    # semi + the same md5) that used to materialize the `down` gate.
    # The CASE only consults the coin AFTER the contam/sel branches,
    # so rows outside s2 never read w/u — identical precedence, and
    # every s2 row's (w, u) pair is the same value the old coin pass
    # computed. The wts join is LEFT on lang: a lang absent from wts
    # has no s2 survivors, so its rows are always decided by an
    # earlier branch and their null w is never consulted.
    is_packed = F.col("verdict") == "packed"
    w_pack = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed_tok = F.when(is_packed, F.col("n_tok")).otherwise(F.lit(0))
    k = F.md5(F.concat(F.col("doc_id").cast("string"), F.col("text")))
    u = F.expr(f"({_h16_sql('k')})").cast("double") / 65536.0
    return (
        pool.join(
            contam.select("doc_id", F.lit(True).alias("is_contam")),
            "doc_id",
            "left",
        )
        .join(
            sel.select("doc_id", F.lit(True).alias("is_sel")),
            "doc_id",
            "left",
        )
        .join(F.broadcast(wts), "lang", "left")
        .withColumn("k", k)
        .select(
            "doc_id",
            "lang",
            F.when(F.col("is_contam"), F.lit("contaminated"))
            .when(F.col("is_sel").isNull(), F.lit("off_target"))
            .when(
                ~(u < F.least(F.lit(1.0), F.col("w"))),
                F.lit("downsampled"),
            )
            .otherwise(F.lit("packed"))
            .alias("verdict"),
            TX.bpe_ish_token_count(F.col("text"))
            .cast("long")
            .alias("n_tok"),
        )
        .select(
            "doc_id",
            "lang",
            "verdict",
            F.when(
                is_packed,
                F.floor(
                    (F.sum(packed_tok).over(w_pack) - F.col("n_tok"))
                    / _PACK_BUDGET
                ),
            )
            .otherwise(F.lit(None))
            .cast("long")
            .alias("shard_id"),
        )
    )
