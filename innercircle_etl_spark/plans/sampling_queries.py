"""Deterministic sampling for training-data pipelines.

A 100 TB corpus job samples constantly — class-balanced eval carve-
outs, per-source quality audits, debug slices. ``df.sample()`` is
seed-and-partitioning dependent (re-partition the input and the
sample changes), so pipelines that must be re-runnable key the
decision on a CONTENT hash instead: the same row lands in the same
sample on every run, on every engine, under any partitioning. md5 is
the engine-portable choice (Spark's ``hash``/``xxhash64`` and
DuckDB's ``hash`` disagree by design).

Cf. text_train_eval_split (the same idiom as a single 2-way split);
here the rate is per-stratum, the sampleBy/stratified analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from innercircle_etl_spark.plans.registry import load, register

# per-stratum keep thresholds on the first hex nibble of
# md5(doc_id || text): 'en' is the majority class -> 4/16 = 25%;
# every minority language keeps 8/16 = 50% (the class-rebalancing
# shape: downsample the head, keep the tail).
_RATE_CASE_SQL = "CASE WHEN lang = 'en' THEN '4' ELSE '8' END"

_STRAT_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id, lang, source, n_chars,
           substr(md5(CAST(doc_id AS VARCHAR) || text), 1, 1) AS h
    FROM documents
)
SELECT doc_id, lang, source, n_chars
FROM keyed
WHERE h < {_RATE_CASE_SQL}
"""


@register("samp_stratified_hash", oracle=_STRAT_ORACLE)
def samp_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates
    driven by a content-hash nibble — downsample the majority class
    (en -> 25%), keep minority classes at 50%.

    Pure map-side: no shuffle at all (the filter rides the scan),
    so it costs one pass at any scale and composes with predicate
    pushdown on other columns. The hash key is doc_id||text so two
    distinct docs with identical text still sample independently;
    drop the id component to make the decision purely content-keyed
    (then it co-varies with exact dedup, which is sometimes what a
    leakage-conscious eval split wants)."""
    docs = load(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.col("text"))), 1, 1
    )
    return docs.filter(h < F.expr(_RATE_CASE_SQL)).select(
        "doc_id", "lang", "source", "n_chars"
    )


# ------------------------------------------------- epoch shuffle

# First 16 bits of a hex digest as an integer, spelled with only
# engine-portable functions (instr/substr behave identically in
# Spark SQL and DuckDB; there is no portable hex->int cast).
def _h16_sql(k: str) -> str:
    nib = "(instr('0123456789abcdef', substr({k}, {i}, 1)) - 1)"
    return " + ".join(
        f"{nib.format(k=k, i=i + 1)} * {16 ** (3 - i)}" for i in range(3)
    ) + f" + {nib.format(k=k, i=4)}"


_EPOCH_SEED = "epoch7"
_N_SHARDS = 8

_EPOCH_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id,
           md5('{_EPOCH_SEED}:' || CAST(doc_id AS VARCHAR)) AS k
    FROM documents
),
sharded AS (
    SELECT doc_id, k,
           CAST(({_h16_sql('k')}) % {_N_SHARDS} AS INTEGER) AS shard_id
    FROM keyed
)
SELECT shard_id,
       CAST(row_number() OVER (
           PARTITION BY shard_id ORDER BY k, doc_id
       ) AS INTEGER) AS pos,
       doc_id
FROM sharded
"""


@register("samp_epoch_shuffle", oracle=_EPOCH_ORACLE)
def samp_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: every epoch a training
    job needs a fresh, globally-uniform, REPRODUCIBLE permutation of
    the corpus — restartable mid-epoch, identical across engines and
    partitionings (orderBy(rand(seed)) is none of those: Spark's
    rand is partition-dependent). The permutation key is
    md5(seed:doc_id); changing the seed string is a full reshuffle
    with zero data movement at rest.

    Scale shape: NO global sort. Docs hash into {_N_SHARDS} shards
    by the key's first 16 bits, and positions are per-shard
    row_number windows (partitionBy shard — each reducer sorts one
    shard; readers stream shards independently, which is exactly how
    a 1000-worker data loader consumes an epoch). A global order
    would funnel the corpus through one partition — the w4/w4b
    lesson applied to training I/O."""
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(
            F.concat(
                F.lit(f"{_EPOCH_SEED}:"), F.col("doc_id").cast("string")
            )
        ).alias("k"),
    )
    sharded = keyed.withColumn(
        "shard_id",
        F.expr(f"({_h16_sql('k')}) % {_N_SHARDS}").cast("int"),
    )
    w = Window.partitionBy("shard_id").orderBy("k", "doc_id")
    return sharded.select(
        "shard_id",
        F.row_number().over(w).cast("int").alias("pos"),
        "doc_id",
    )


# -------------------------------------------- weighted resample

_RESAMPLE_ORACLE = f"""
WITH per_lang AS (
    SELECT lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
             AS lang_tokens
    FROM documents GROUP BY lang
),
tot AS (
    SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_langs
    FROM per_lang
),
wts AS (
    SELECT p.lang,
           CAST(t.total_tokens AS DOUBLE)
             / (t.n_langs * p.lang_tokens) AS sample_weight
    FROM per_lang p CROSS JOIN tot t
),
keyed AS (
    SELECT d.doc_id, d.lang, w.sample_weight,
           md5(CAST(d.doc_id AS VARCHAR) || d.text) AS k
    FROM documents d JOIN wts w ON d.lang = w.lang
)
SELECT doc_id, lang, sample_weight
FROM keyed
WHERE CAST(({_h16_sql('k')}) AS DOUBLE) / 65536.0
      < least(1.0, sample_weight)
"""


@register("samp_weighted_resample", oracle=_RESAMPLE_ORACLE)
def samp_weighted_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the text_mix_weights rebalance: keep each doc
    with probability min(1, its language's inverse-token weight),
    decided by a content-hash uniform (first 16 digest bits /
    65536) — the deterministic, engine-portable coin every
    re-runnable pipeline needs. Head languages downsample toward
    the uniform-mix target; tail languages keep everything (their
    weight > 1 means UPsampling — the integral-repeat half of that
    is a planner concern, noted not materialized here, so the clamp
    to 1 is the honest sampling semantics).

    Scale shape: the weight table is language-cardinality (a
    broadcast), the keep decision is map-side per row — one corpus
    pass, no shuffle beyond the token-count rollup that builds the
    weights."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias(
            "lang_tokens"
        )
    )
    tot = per_lang.agg(
        F.sum("lang_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    wts = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        (
            F.col("total_tokens").cast("double")
            / (F.col("n_langs") * F.col("lang_tokens"))
        ).alias("sample_weight"),
    )
    keyed = docs.join(F.broadcast(wts), "lang").select(
        "doc_id",
        "lang",
        "sample_weight",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.col("text"))
        ).alias("k"),
    )
    u = F.expr(f"({_h16_sql('k')})").cast("double") / 65536.0
    return keyed.filter(
        u < F.least(F.lit(1.0), F.col("sample_weight"))
    ).select("doc_id", "lang", "sample_weight")


# ------------------------------------- DSIR importance selection

# Hashed-bigram feature space (DSIR's "hashed n-gram" buckets).
_DSIR_B = 4096
# Stand-in target domain: a curated source subset (in production:
# the Wikipedia/books corpus the mix should look like).
_DSIR_TARGET_SQL = "source IN ('src0', 'src1', 'src2', 'src3')"

_DSIR_ORACLE = f"""
WITH base AS (
    SELECT doc_id, {_DSIR_TARGET_SQL} AS is_target,
           string_split(text, ' ') AS w
    FROM documents
),
bg AS (
    SELECT doc_id, is_target,
           unnest([array_to_string(w[i:i+1], ' ')
                   for i in generate_series(1, len(w) - 1)]) AS g
    FROM base WHERE len(w) >= 2
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
    SELECT q.b,
           ((COALESCE(t.ct, 0) + 1) * 1000) // (q.cq + 1) AS r
    FROM qmodel q LEFT JOIN tmodel t USING (b)
),
scored AS (
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(r.r) AS BIGINT) AS ratio_sum
    FROM feats f JOIN ratio r USING (b)
    GROUP BY f.doc_id
),
g AS (
    SELECT CAST(SUM(ratio_sum) // SUM(n_bigrams) AS BIGINT) AS corpus_mean
    FROM scored
)
SELECT s.doc_id,
       s.n_bigrams,
       CAST(s.ratio_sum // s.n_bigrams AS BIGINT) AS dsir_score,
       (s.ratio_sum // s.n_bigrams) > g.corpus_mean AS selected
FROM scored s CROSS JOIN g
"""


def dsir_scored_and_mean(
    docs: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Shared builder: per-doc DSIR target-likeness sums for an
    arbitrary (doc_id, is_target, text) frame — the parameterized
    body of samp_dsir_importance, reused by ep12_training_mix (the
    incremental_minhash_pairs discipline: one source for both the
    registered query and the composite). Returns ``(scored, mean)``:
    ``scored`` is (doc_id, n_bigrams, ratio_sum) — docs with < 2
    tokens have no bigram feature and are absent (callers treat them
    as not-selected) — and ``mean`` is the 1-row corpus mean
    ``sum(ratio_sum) div sum(n_bigrams)`` the callers compare
    against.

    Corpus-pass budget (round 16, guide §2.4): the fused models
    aggregate is eagerly localCheckpointed — it is B-bounded
    (B=4096, corpus-size-independent), so the pin is constant-size —
    and
    BOTH the broadcast ratio table and the corpus mean derive from
    the pinned table. The mean uses the exact-BIGINT identity

        sum_docs(ratio_sum) = sum_b(cq * r)    [every feature joins
        sum_docs(n_bigrams) = sum_b(cq)         its bucket exactly
                                                once]

    so no second corpus pass computes it. Before: ``scored`` was
    consumed twice (output + mean) and its own subtree held two
    corpus explosions — 4 corpus bigram passes per run; now: one
    pass pins the models, one pass scores. Oracle-identical: the
    mean is the same integer, term for term."""
    base = docs.select(
        "doc_id", "is_target", F.split("text", " ").alias("w")
    )
    feats = (
        base.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            "is_target",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> concat_ws(' ', slice(w, i, 2)))"
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            "is_target",
            F.expr(f"({_h16_sql('md5(g)')}) % {_DSIR_B}")
            .cast("long")
            .alias("b"),
        )
    )
    # ONE aggregation builds BOTH hashed models (round 11; was two
    # separate groupBys whose inputs each re-ran the corpus bigram
    # explosion — the conditional count is the same map-side partial
    # aggregate, one corpus tokenization pass cheaper): cq = all
    # bigrams in the bucket, ct = the target-side subset.
    models = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("cq"),
        F.count(F.when(F.col("is_target"), F.lit(1))).alias("ct"),
    ).localCheckpoint(eager=True)
    ratio = models.select(
        "b",
        F.expr("((ct + 1) * 1000) div (cq + 1)").alias("r"),
    )
    mean = models.select(
        "cq", F.expr("((ct + 1) * 1000) div (cq + 1)").alias("r")
    ).agg(F.expr("sum(cq * r) div sum(cq)").alias("corpus_mean"))
    scored = (
        feats.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("r").alias("ratio_sum"),
        )
    )
    return scored, mean


@register("samp_dsir_importance", oracle=_DSIR_ORACLE)
def samp_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", public): score
    every raw document by how target-domain-like its hashed-bigram
    distribution is — the importance ratio between a bag-of-hashed-
    ngrams model of the TARGET corpus (here a curated source subset
    standing in for Wikipedia/books) and one of the RAW corpus —
    and select the above-average docs for the training mix.

    Exact-arithmetic adaptation (the text_lm_rarity_filter
    discipline): DSIR's per-feature log-ratio ``log p_t(b) -
    log p_q(b)`` is replaced by the integer-quantized likelihood
    ratio ``((ct[b]+1) * 1000) div (cq[b]+1)`` (add-one smoothing;
    the two models' normalizers are per-corpus CONSTANTS, so they
    cancel in every mean-vs-corpus-mean comparison and are dropped),
    summed per doc and floor-mean'd — a monotone target-likeness
    statistic whose keep boundary is exact BIGINT across engines
    (engines' last-ulp ``ln`` would make it engine-dependent).

    Plan/scale: both models are the SAME feature stream aggregated
    once — one corpus pass explodes bigrams to B=4096 hash buckets
    (map-side combined groupBy; model size is B-BOUNDED, independent
    of corpus size, DSIR's core trick) and pins the model table, the
    ratio table is 4096 rows (broadcast), scoring joins the feature
    stream to it map-side, then one doc-keyed shuffle sums per
    document; the corpus mean is a broadcast 1-row aggregate over
    the PINNED model table (the sum(cq*r) identity — see
    dsir_scored_and_mean), not a second corpus pass. At 100 TB: two
    corpus passes total (model build, scoring), two bounded shuffles
    (buckets, docs) and zero per-row Python.

    Reference parity: beyond-reference (north-star extension)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DSIR_TARGET_SQL).alias("is_target"), "text"
    )
    scored, g = dsir_scored_and_mean(docs)
    return scored.crossJoin(F.broadcast(g)).select(
        "doc_id",
        "n_bigrams",
        F.expr("ratio_sum div n_bigrams").alias("dsir_score"),
        F.expr("(ratio_sum div n_bigrams) > corpus_mean").alias(
            "selected"
        ),
    )


# ------------------------------------- temperature-sampled language mix

# mT5/XLM-R exponent alpha = 0.5 spelled as sqrt: IEEE-754 requires
# sqrt to be CORRECTLY ROUNDED (unlike pow/ln/exp, which differ in
# the last ulp across libm implementations), so this is the one
# temperature exponent that is bit-identical across engines.
_TEMP_ORACLE = """
WITH per_lang AS (
    SELECT lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
             AS lang_tokens
    FROM documents GROUP BY lang
),
s AS (
    SELECT lang, lang_tokens,
           CAST(FLOOR(sqrt(CAST(lang_tokens AS DOUBLE)) * 1000)
                AS BIGINT) AS sq
    FROM per_lang
),
tot AS (
    SELECT CAST(SUM(lang_tokens) AS BIGINT) AS tt,
           CAST(SUM(sq) AS BIGINT) AS ts
    FROM s
)
SELECT s.lang, s.lang_tokens,
       (s.lang_tokens * 1000000) // tot.tt AS p_ppm,
       (s.sq * 1000000) // tot.ts AS q_ppm,
       (((s.sq * 1000000) // tot.ts) * 1000)
           // ((s.lang_tokens * 1000000) // tot.tt) AS boost_milli
FROM s CROSS JOIN tot
"""


@register("samp_temperature_mix", oracle=_TEMP_ORACLE)
def samp_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling (mT5 / XLM-R, public):
    the multilingual-mix formula q_l ∝ p_l^alpha that upsamples tail
    languages and downsamples the head — the standard between
    uniform (text_mix_weights' target) and natural (p itself).

    alpha is fixed at 0.5 and spelled ``sqrt``, the ONE temperature
    exponent that is bit-identical across engines (IEEE-754 mandates
    correctly-rounded sqrt; pow/ln differ in the last ulp between
    libm implementations). Every derived share is integer-quantized
    (sqrt scaled by 1000 then floored to BIGINT before the
    normalizing sums, so the sums are exact integer arithmetic and
    order-independent — a float sum over languages would be
    partitioning-dependent). Output per language: natural share
    p_ppm, temperature share q_ppm (parts per million), and the
    boost ratio q/p in thousandths — the factors a sampler feeds
    into samp_weighted_resample's coin.

    Plan/scale: one map-side-combined groupBy builds the per-language
    token counts (language-bounded), the normalizers are a broadcast
    1-row aggregate — nothing here scales with corpus size past the
    single token-count pass.

    Reference parity: beyond-reference (north-star extension)."""
    docs = load(spark, sf_dir, "documents").select("lang", "text")
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias(
            "lang_tokens"
        )
    )
    s = per_lang.select(
        "lang",
        "lang_tokens",
        F.floor(F.sqrt(F.col("lang_tokens").cast("double")) * 1000)
        .cast("long")
        .alias("sq"),
    )
    tot = s.agg(
        F.sum("lang_tokens").alias("tt"), F.sum("sq").alias("ts")
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "lang",
        "lang_tokens",
        F.expr("(lang_tokens * 1000000) div tt").alias("p_ppm"),
        F.expr("(sq * 1000000) div ts").alias("q_ppm"),
        F.expr(
            "(((sq * 1000000) div ts) * 1000)"
            " div ((lang_tokens * 1000000) div tt)"
        ).alias("boost_milli"),
    )


# --------------------------------------------- UniMax water-filling

_UNIMAX_EPOCHS = 2  # per-language epoch cap (UniMax's N)
# budget = 3/2 of the natural corpus — between 1 epoch of everything
# and the 2-epoch cap, so both branches (capped tail, water-filled
# head) are exercised at every fixture SF.

_UNIMAX_ORACLE = f"""
WITH l AS (
    SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS c
    FROM documents GROUP BY lang
),
t AS (SELECT CAST((SUM(c) * 3) // 2 AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS n FROM l),
r AS (
    SELECT lang, c, c * {_UNIMAX_EPOCHS} AS cap,
           CAST(row_number() OVER
                (ORDER BY c * {_UNIMAX_EPOCHS} ASC, lang ASC) AS BIGINT)
             AS idx,
           CAST(COALESCE(SUM(c * {_UNIMAX_EPOCHS}) OVER
                (ORDER BY c * {_UNIMAX_EPOCHS} ASC, lang ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS pre
    FROM l
),
u AS (SELECT r.*, (b - pre) // (n - idx + 1) AS ui FROM r, t),
x AS (SELECT MIN(idx) AS cross_idx FROM u WHERE cap > ui),
a AS (
    SELECT lang, c, cap,
           CASE WHEN x.cross_idx IS NULL OR u.idx < x.cross_idx THEN cap
                ELSE (SELECT ui FROM u uu, x xx
                      WHERE uu.idx = xx.cross_idx) END AS alloc
    FROM u, x
)
SELECT lang, c AS lang_tokens, cap AS cap_tokens,
       CAST(alloc AS BIGINT) AS alloc_tokens,
       CAST((alloc * 1000) // c AS BIGINT) AS epochs_milli
FROM a
"""


@register("samp_unimax", oracle=_UNIMAX_ORACLE)
def samp_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023, public):
    distribute a token budget as uniformly as possible across
    languages subject to a per-language epoch cap — the successor to
    temperature sampling (samp_temperature_mix) for multilingual
    pretraining mixes. Tail languages are capped at
    ``_UNIMAX_EPOCHS`` epochs of their data; the head shares the
    remaining budget at a common water level.

    The water-filling has a CLOSED FORM over the cap-ascending
    order: with caps sorted ascending, the candidate uniform level
    at rank i is u_i = (B - prefix_cap_{{i-1}}) div (N - i + 1); the
    crossing is the FIRST rank whose cap exceeds its u_i, every
    earlier language takes its full cap, and every language from the
    crossing on takes the crossing's u (in exact arithmetic the
    uncapped levels are all equal; this operator DEFINES the
    allocation by that closed form in BIGINT div, so both engines
    agree bit-exactly — the UniMax paper's real-valued allocation
    differs from it by under one token per language).

    Plan/scale: one corpus-scale token-count groupBy (map-side
    combined) reduces everything to N language rows; the rank/prefix
    window runs over those N rows (dimension-bounded — the w4 global
    -rank justification), the budget is a broadcast 1-row aggregate,
    and the crossing is a broadcast 1-row min(struct(idx, ui)) that
    carries its own water level — no driver collect anywhere.

    Output per language: natural tokens, cap, allocated tokens, and
    epochs_milli = alloc*1000 div natural (1000 = exactly one epoch).

    Reference parity: beyond-reference (north-star extension)."""
    docs = load(spark, sf_dir, "documents").select("lang", "text")
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("c")
    )
    tot = per_lang.agg(
        F.expr("(sum(c) * 3) div 2").alias("b"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    cap = (F.col("c") * _UNIMAX_EPOCHS).alias("cap")
    w = Window.orderBy(F.col("cap").asc(), F.col("lang").asc())
    r = (
        per_lang.select("lang", "c", cap)
        .withColumn("idx", F.row_number().over(w).cast("long"))
        .withColumn(
            "pre",
            F.coalesce(
                F.sum("cap").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
    )
    u = (
        r.crossJoin(F.broadcast(tot))
        .withColumn("ui", F.expr("(b - pre) div (n - idx + 1)"))
        # language-bounded (N rows); pinned because three consumers
        # read it (crossing agg, final projection) — the racing-
        # consumer lesson, at trivial cost here
        .localCheckpoint(eager=True)
    )
    x = (
        u.agg(
            F.min(
                F.when(
                    F.col("cap") > F.col("ui"),
                    F.struct(F.col("idx"), F.col("ui")),
                )
            ).alias("m")
        )
        .select(
            F.col("m.idx").alias("cross_idx"),
            F.col("m.ui").alias("u_star"),
        )
    )
    alloc = F.when(
        F.col("cross_idx").isNull() | (F.col("idx") < F.col("cross_idx")),
        F.col("cap"),
    ).otherwise(F.col("u_star"))
    return u.crossJoin(F.broadcast(x)).select(
        "lang",
        F.col("c").alias("lang_tokens"),
        F.col("cap").alias("cap_tokens"),
        alloc.alias("alloc_tokens"),
    ).select(
        "lang",
        "lang_tokens",
        "cap_tokens",
        "alloc_tokens",
        F.expr("(alloc_tokens * 1000) div lang_tokens").alias(
            "epochs_milli"
        ),
    )


# ------------------------------------------- bottom-k fixed sample

_BOTTOMK = 100  # exact sample size

_BOTTOMK_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id, lang, source,
           md5(CAST(doc_id AS VARCHAR) || text) AS h
    FROM documents
)
SELECT doc_id, lang, source,
       CAST(row_number() OVER (ORDER BY h ASC NULLS LAST, doc_id ASC)
         AS INT) AS sample_rank
FROM keyed
ORDER BY h ASC NULLS LAST, doc_id ASC
LIMIT {_BOTTOMK}
"""


@register("samp_bottomk_fixed", oracle=_BOTTOMK_ORACLE)
def samp_bottomk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sampling (Cohen & Kaplan's bottom-k sketch, public):
    an EXACTLY-k uniform sample — order every row by a content hash
    and keep the k smallest. The fixed-size complement to
    samp_stratified_hash's rate-based coin: eval carve-outs, human-
    review batches and debug slices need a guaranteed size, and the
    content-hash key keeps the chosen set identical across re-runs,
    engines and partitionings (df.sample() is neither fixed-size nor
    partitioning-stable). A bottom-k set is also MERGEABLE: the
    bottom-k of a union is computable from per-shard bottom-k's —
    exactly what TakeOrderedAndProject exploits.

    Plan/scale: ONE scan; per-partition top-k heaps + a k-row final
    merge (TakeOrderedAndProject — never a global sort of the
    corpus). The rank window runs after the limit, over k rows.

    Reference parity: beyond-reference (north-star extension)."""
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "lang",
        "source",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.col("text"))
        ).alias("h"),
    )
    # NULLS LAST on both engines: Spark's asc() is NULLS FIRST but
    # DuckDB's ASC is NULLS LAST — a NULL text (NULL md5) would
    # otherwise enter the sample on one engine and miss it on the
    # other (latent today: fixtures carry no NULL text; the phash
    # ASCII-gate lesson applied to ordering)
    top = keyed.orderBy(
        F.col("h").asc_nulls_last(), F.col("doc_id").asc()
    ).limit(_BOTTOMK)
    w = Window.orderBy(F.col("h").asc_nulls_last(), F.col("doc_id").asc())
    return top.withColumn(
        "sample_rank", F.row_number().over(w).cast("int")
    ).select("doc_id", "lang", "source", "sample_rank")
