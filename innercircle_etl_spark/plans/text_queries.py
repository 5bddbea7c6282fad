"""Text-analysis queries over the documents table (north-star
extension family: language-ID, quality scoring, token counting,
fingerprinting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from innercircle_etl_spark.functions import text as TX
from innercircle_etl_spark.plans.planting import (
    DOC_NEAR_CORPUS_SQL,
    PLANT_ID_OFFSET,
)
from innercircle_etl_spark.plans.registry import load, register


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_actual,
           CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_token_len,
           CAST(len(regexp_extract_all(text,
                ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +')) AS INTEGER)
             AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + mean token length (pure
    column arithmetic, no explode) + a BPE-ish pre-tokenizer count
    (the LLM token-budget proxy, functions/text.py)."""
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        F.length(t).cast("int").alias("n_chars_actual"),
        TX.avg_token_len(t).alias("avg_token_len"),
        TX.bpe_ish_token_count(t).alias("n_bpe_tokens"),
    )


@register(
    "text_quality_score",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
               CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) AS sw
        FROM documents
    )
    SELECT doc_id,
           0.4 * (CASE WHEN n >= 20 AND n <= 400 THEN 1.0 ELSE 0.5 END)
           + 0.4 * (nd / n) + 0.2 * (sw / n) AS quality
    FROM s
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length band + lexical diversity + stopword
    ratio composite (functions/text.py::quality_score)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.quality_score(F.col("text")).alias("quality"))


@register(
    "text_lang_id",
    oracle="""
    WITH s AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    c AS (
        SELECT doc_id,
               len(list_filter(toks, t -> t IN ('the','a','of','and','to'))) AS c_en,
               len(list_filter(toks, t -> t IN ('der','die','das','und','zu'))) AS c_de,
               len(list_filter(toks, t -> t IN ('le','la','et','de','un'))) AS c_fr,
               len(list_filter(toks, t -> t IN ('el','la','y','de','un'))) AS c_es
        FROM s
    )
    SELECT doc_id,
           CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
                WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                WHEN c_fr >= c_es THEN 'fr'
                ELSE 'es' END AS pred_lang
    FROM c
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit argmax with a fixed
    preference order (en > de > fr > es) for ties — deterministic by
    construction. (The synthetic corpus shares one vocabulary across
    its `lang` labels, so this checks the operator, not classifier
    accuracy.)"""
    docs = load(spark, sf_dir, "documents")
    s = TX.lang_scores(F.col("text"))
    pred = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]),
            "en",
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )
    return docs.select("doc_id", pred.alias("pred_lang"))


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set —
    order/repetition-invariant canonical hash used as a cheap
    first-pass dedup key."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.fingerprint(F.col("text")).alias("fingerprint")
    )


# Planted-PII corpus: the synthetic docs carry no PII, so emails and
# phone numbers are injected deterministically (identically in the
# oracle) — the scrub operator is then non-trivially exercised.
_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

_PII_ORACLE = f"""
WITH corpus AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 10 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com now'
                   ELSE '' END
           || CASE WHEN doc_id % 15 = 0
                   THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                        || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END AS text
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
         AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
FROM corpus
"""


@register("text_pii_scrub", oracle=_PII_ORACLE)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub — the redaction pass every LLM training-data
    pipeline runs before tokenization: count + redact email and
    phone patterns (regexp kept to the character-class/quantifier
    subset where Java regex and RE2 agree). Pure column expressions,
    JVM codegen, no UDF; at 100TB this is a map-only stage fused
    into the scan."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 15 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), F.lit(0))
        )
        .cast("long")
        .alias("n_emails"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), F.lit(0))
        )
        .cast("long")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


_PACK_BUDGET = 2048  # tokens per shard

_PACK_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang,
           len(regexp_extract_all(text,
               ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +')) AS n_tok
    FROM documents
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


@register("text_pack_shards", oracle=_PACK_ORACLE)
def text_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the pre-training step that bins documents
    into fixed token-budget shards: running token count per language
    stream, shard = cumulative-tokens-before-me div budget (so a doc
    always lands in the shard its first token falls into).

    Scale: the cumulative window partitions BY LANGUAGE (any
    stratification key works) — packing is inherently order-
    dependent, so at 100TB you pack within partitions and never
    demand one global order. Pure column expressions over the BPE-ish
    token count; no UDF."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        TX.bpe_ish_token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "shard_id",
        F.floor(
            (F.sum("n_tok").over(w) - F.col("n_tok")) / _PACK_BUDGET
        ),
    )
    return packed.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )


_SPLIT_ORACLE = """
SELECT lang,
       CASE WHEN substr(md5(text), 1, 1) <= '3' THEN 'eval'
            ELSE 'train' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1, 2
"""


@register("text_train_eval_split", oracle=_SPLIT_ORACLE)
def text_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/eval split (~25% eval): the
    carve-out every training pipeline needs, keyed on md5(content)
    so the SAME document always lands in the same split regardless
    of ingestion order, partitioning, or re-runs — and so near-dup
    leakage checks can join across the boundary. Engine-portable
    (md5 is bit-identical everywhere, unlike engine hash functions).
    """
    docs = load(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5("text"), 1, 1) <= "3", F.lit("eval")
    ).otherwise(F.lit("train"))
    return docs.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


_TFIDF_ORACLE = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks GROUP BY 1, 2
),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
           tf.tf * ((n.n * 1000) // dfq.df) AS score
    FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN n
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, term) AS rnk
    FROM scored
)
SELECT doc_id, term, tf, df, score FROM r WHERE rnk <= 3
"""


@register("text_tfidf_terms", oracle=_TFIDF_ORACLE)
def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF distinctive-term extraction: top-3 rarity-weighted terms
    per document — the per-doc keyword signal a corpus search/pruning
    pass runs over every shard.

    The idf is INTEGER-QUANTIZED: ``(N*1000) div df`` instead of
    ``ln(N/df)``. Floating idf would make the ranking depend on each
    engine's last-ulp ``ln`` (Spark's Math.log and DuckDB's std::log
    are not bit-identical, and near-ties like 2*ln(4) vs 4*ln(2) flip
    ranks), so the score stays in exact BIGINT arithmetic end to end —
    same monotone rarity weighting, hash-stable across engines. At
    cluster scale the shape is unchanged: one doc-sized shuffle for
    tf, one vocab-sized shuffle for df, a vocab-sized join AQE turns
    into a broadcast, and a per-doc window.
    """
    docs = load(spark, sf_dir, "documents")
    n_df = docs.agg(F.count(F.lit(1)).alias("n"))
    terms = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(n_df))
        .withColumn("score", F.expr("tf * ((n * 1000) div df)"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


_SEQ_ORACLE = """
WITH e AS (
    SELECT user_id, event_id, event_type,
           CAST(date_diff('microsecond',
                          TIMESTAMP '1970-01-01 00:00:00',
                          CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us
    FROM events
)
SELECT user_id,
       string_agg(event_type || '@' || ts_us, '|'
                  ORDER BY ts_us, event_id) AS seq,
       CAST(COUNT(*) AS BIGINT) AS seq_len,
       MIN(ts_us) AS t_first,
       MAX(ts_us) AS t_last
FROM e GROUP BY user_id
"""


@register("seq_event_assembly", oracle=_SEQ_ORACLE)
def seq_event_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity event-sequence assembly — the operator that turns
    an event log into model-ready sequences (next-event prediction,
    session LLM pretraining): one shuffle on the entity key, events
    ordered by (time, id) INSIDE the aggregate via array_sort over
    structs (collect_list alone is partition-order-nondeterministic —
    the sort is what makes re-runs and engines agree), then folded to
    a delimited string.

    Scale: state per user is their event list — for power users at
    100TB, pre-truncate with a windowed top-N per user or shard long
    histories by time range before assembly (the text_pack_shards
    pattern); the shuffle key and plan shape are unchanged."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, "
            "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), "
            "CAST(ts AS TIMESTAMP_NTZ))"
        ).alias("ts_us"),
    )
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts_us", "event_id", "event_type")
                    )
                ),
                lambda x: F.concat_ws(
                    "@", x["event_type"], x["ts_us"].cast("string")
                ),
            ),
            "|",
        ).alias("seq"),
        F.count(F.lit(1)).alias("seq_len"),
        F.min("ts_us").alias("t_first"),
        F.max("ts_us").alias("t_last"),
    )


# ------------------------------------------- repetition quality signal

_REP_ORACLE = """
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sized AS (
    SELECT doc_id, w, len(w) AS n_words FROM tok WHERE len(w) >= 2
),
stats AS (
    SELECT doc_id, n_words,
           list_max(list_transform(list_distinct(w),
               x -> len(list_filter(w, y -> y = x)))) AS top_cnt,
           list_transform(generate_series(1, len(w) - 1),
               i -> w[i] || ' ' || w[i + 1]) AS bg
    FROM sized
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(top_cnt AS DOUBLE) / n_words AS top_word_frac,
       1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
         AS dup_bigram_frac,
       (CAST(top_cnt AS DOUBLE) / n_words > 0.2
        OR 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) > 0.3)
         AS flagged
FROM stats
"""


@register("text_repetition_quality", oracle=_REP_ORACLE)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: most-frequent-
    word fraction and duplicate-bigram fraction, with the
    Rae et al. 2021 (arXiv:2112.11446) style flag thresholds (top
    word > 20% of tokens, or > 30% repeated bigrams) — the classic
    low-quality/boilerplate detector a pretraining corpus gate runs
    alongside length/stopword heuristics (text_quality_score).

    Scale shape: EVERYTHING is per-row array expressions inside the
    scan — no explode, no shuffle, no UDF; at 100TB this is a pure
    map over the corpus that fuses into whole-stage codegen. The
    top-word count is O(distinct_words x words) per doc, fine for
    document-sized arrays (switch to an explode+groupBy at book
    scale)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    d = docs.select(
        "doc_id", toks.alias("w"), F.size(toks).alias("n_words")
    ).filter(F.col("n_words") >= 2)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("w"),
            lambda x: F.size(F.filter("w", lambda y: y == x)),
        )
    )
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.concat_ws(" ", F.element_at("w", i + 1),
                              F.element_at("w", i + 2)),
    )
    d = d.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        (top_cnt.cast("double") / F.col("n_words")).alias("top_word_frac"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(bigrams)).cast("double")
            / F.size(bigrams)
        ).alias("dup_bigram_frac"),
    )
    return d.withColumn(
        "flagged",
        (F.col("top_word_frac") > 0.2) | (F.col("dup_bigram_frac") > 0.3),
    )


# ------------------------------------------------------- BM25 search

_BM25_TERMS = ("hash", "vector", "spark")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)
_BM25_TOPK = 10

_BM25_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2
),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
meta AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           AVG(len(string_split(text, ' '))) AS avgdl
    FROM documents
),
dl AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
    FROM documents
),
ts AS (
    SELECT tf.doc_id,
           (((meta.n_docs - dfq.df) + 0.5) / (dfq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + (0.75 * dl.dl) / meta.avgdl)) AS s
    FROM tf
    JOIN dfq ON tf.term = dfq.term
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN meta
),
agg AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE) AS score
    FROM ts GROUP BY 1
),
r AS (
    SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                   AS INTEGER) AS rank
    FROM agg
)
SELECT doc_id, n_terms, score, rank FROM r WHERE rank <= {_BM25_TOPK}
"""


@register("text_bm25_search", oracle=_BM25_ORACLE)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-weighted corpus search: top-10 documents for a fixed
    3-term query — the relevance scan a corpus-curation pass runs to
    pull topical subsets out of a 100TB crawl (and the retrieval
    half of any RAG data pipeline).

    Standard Okapi shape (k1=1.2, b=0.75: term-frequency saturation
    + document-length normalization) with ONE deliberate change: the
    idf is the RAW Robertson ratio (N - df + 0.5)/(df + 0.5), not
    its log. ln() is the only non-algebraic step in BM25, and
    transcendentals are the one place two engines' doubles diverge
    (same lesson as text_tfidf_terms' integer-quantized idf); +,*,/
    on doubles are IEEE-exact in both, so with textually parallel
    expression trees the per-term scores are bit-identical and the
    value-hash holds. Monotonicity in df is preserved — rankings
    for a single-term query are unchanged; multi-term mixes weight
    rare terms harder than the log form, which curation usually
    wants anyway. Per-doc summation goes through DECIMAL(38,6) so
    addition order cannot flip last-ulp ties.

    Plan: the term filter prunes the exploded token stream before
    the tf groupBy (one doc-sized shuffle); df (3 rows) and the
    corpus meta (1 row) broadcast; doc length joins on doc_id; the
    global top-10 is a sorted limit (TakeOrderedAndProject), with
    the rank window running over 10 rows only."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    meta = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl"),
    )
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl")
    )
    idf = ((F.col("n_docs") - F.col("df")) + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    s = (idf * (F.col("tf") * F.lit(2.2))) / (
        F.col("tf")
        + F.lit(1.2)
        * (F.lit(0.25) + (F.lit(0.75) * F.col("dl")) / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(meta))
        .select("doc_id", s.alias("s"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.col("s").cast("decimal(38,6)")).cast("double").alias("score"),
    )
    top = agg.orderBy(F.col("score").desc(), F.col("doc_id")).limit(
        _BM25_TOPK
    )
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
        .cast("int"),
    ).select("doc_id", "n_terms", "score", "rank")


# ------------------------------------------------- mixture weighting

_MIX_ORACLE = """
WITH per_lang AS (
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
             AS lang_tokens
    FROM documents GROUP BY lang
),
tot AS (
    SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_langs
    FROM per_lang
)
SELECT p.lang, p.n_docs, p.lang_tokens,
       CAST(t.total_tokens AS DOUBLE)
         / (t.n_langs * p.lang_tokens) AS sample_weight
FROM per_lang p CROSS JOIN tot t
"""


@register("text_mix_weights", oracle=_MIX_ORACLE)
def text_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture weighting: per-language token counts and the
    per-document sampling weight that rebalances the corpus to a
    UNIFORM token share per language — the knob every training-data
    mix sweep turns (swap the uniform target for any published
    mixture by replacing 1/n_langs with the target share). A weight
    above 1 up-samples an under-represented language; below 1
    down-samples. weight = total_tokens / (n_langs * lang_tokens)
    stays in exact integer arithmetic until one final double
    division (both operands < 2^53 — the w10 casting rule), so the
    value hash-matches the oracle.

    Scale: one map-side-combinable groupBy over the scan; the
    1-row total broadcasts back. Composes with
    samp_stratified_hash: feed these weights in as the per-stratum
    rates to materialize the rebalanced corpus."""
    docs = load(spark, sf_dir, "documents").select("lang", "text")
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias(
            "lang_tokens"
        ),
    )
    tot = per_lang.agg(
        F.sum("lang_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "lang_tokens",
        (
            F.col("total_tokens").cast("double")
            / (F.col("n_langs") * F.col("lang_tokens"))
        ).alias("sample_weight"),
    )


# ----------------------------------------------- decontamination

_DECON_K = 8       # shingle width: 8-word exact overlap
_EVAL_MOD = 101    # every 101st doc is the held-out eval set

_DECON_ORACLE = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL   -- planted leaks: copies of EVAL docs inside train
    SELECT doc_id + {PLANT_ID_OFFSET}, text FROM documents
    WHERE doc_id % {_EVAL_MOD} = 0
),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(
               [array_to_string(w[i:i+{_DECON_K - 1}], ' ')
                for i in generate_series(1, len(w) - {_DECON_K - 1})]
           )) AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)
    WHERE len(w) >= {_DECON_K}
),
eval_sh AS (
    SELECT DISTINCT g FROM sh WHERE doc_id % {_EVAL_MOD} = 0
)
SELECT s.doc_id AS train_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM sh s JOIN eval_sh e ON s.g = e.g
WHERE s.doc_id % {_EVAL_MOD} <> 0
GROUP BY s.doc_id
"""


@register("text_decontaminate", oracle=_DECON_ORACLE)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval DECONTAMINATION — the audit every benchmark-clean
    training run requires: flag training documents that share any
    exact 8-word shingle with the held-out evaluation set, so
    benchmark text cannot leak into the corpus. The fixture plants
    the leak deliberately: verbatim copies of eval docs re-enter as
    training ids (offset +100000, which is never ≡ 0 mod 101, so
    every copy is a TRAIN doc carrying eval text).

    Plan: per-doc distinct 8-gram shingles JVM-side (the shared
    let-bound transform), the eval side reduces to a DISTINCT
    shingle set — eval sets are benchmark-sized, so at 100TB this
    side is small and broadcasts — and the train stream semi-joins
    against it; output is (train_doc_id, n_shared) for flagged docs
    only. Raising the shingle width k trades recall for precision
    exactly as in the published decontamination setups; hash the
    shingles (md5) when the eval set outgrows string-key joins."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    leaked = docs.filter(F.col("doc_id") % _EVAL_MOD == 0).select(
        (F.col("doc_id") + PLANT_ID_OFFSET).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(leaked)

    from innercircle_etl_spark.functions import sketches as SK

    toks = F.split(F.col("text"), " ")
    sh = (
        corpus.filter(F.size(F.split(F.col("text"), " ")) >= _DECON_K)
        .select(
            "doc_id",
            F.explode(SK.word_shingles(toks, _DECON_K)).alias("g"),
        )
    )
    eval_sh = (
        sh.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("g")
        .distinct()
    )
    return (
        sh.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .join(F.broadcast(eval_sh), "g")
        .groupBy(F.col("doc_id").alias("train_doc_id"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


# ------------------------------------------- in-vocabulary quality

_OOV_TOPK = 200  # per-language "known" bigram vocabulary size

_OOV_ORACLE = f"""
WITH grams AS (
    SELECT doc_id, lang,
           list_distinct([substr(text, i, 2)
                          for i in generate_series(1, length(text) - 1)])
             AS g
    FROM documents WHERE length(text) >= 2
),
df AS (
    SELECT lang, unnest(g) AS gram FROM grams
),
vocab AS (
    SELECT lang, gram FROM (
        SELECT lang, gram,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY COUNT(*) DESC, gram ASC
               ) AS rn
        FROM df GROUP BY lang, gram
    ) WHERE rn <= {_OOV_TOPK}
),
vlists AS (SELECT lang, list(gram) AS vl FROM vocab GROUP BY lang)
SELECT g.doc_id, g.lang,
       CAST(len(g.g) AS BIGINT) AS n_bigrams,
       CAST(len(list_intersect(g.g, v.vl)) AS DOUBLE) / len(g.g)
         AS iv_rate
FROM grams g JOIN vlists v ON g.lang = v.lang
"""


@register("text_oov_quality", oracle=_OOV_ORACLE)
def text_oov_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level language-model quality proxy: the fraction of
    a document's distinct char-bigrams that appear in its language's
    top-{_OOV_TOPK} bigram vocabulary (built from the corpus itself
    — self-supervised, like the KenLM-perplexity filters in web-
    corpus pipelines but log-free: an in-vocabulary RATE is a ratio
    of exact integers, so it hash-matches across engines where a
    log-prob would drift in libm). Low iv_rate = the doc's character
    statistics diverge from its language's bulk — mojibake, wrong
    lang tag, binary junk.

    Scale shape: the vocabulary build is the only shuffle (explode →
    groupBy(lang, gram), map-side combinable; the rank window runs
    over the per-language DF table — dimension-sized). Scoring is
    pure map-side: the top-K lists fold to one array per language
    (languages x {_OOV_TOPK} entries — a broadcast), and each doc
    scores itself with array_intersect against its language's list.
    No corpus re-shuffle, no UDF."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    grams = (
        docs.filter(F.length("text") >= 2)
        .select(
            "doc_id",
            "lang",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(text) - 1),"
                    " i -> substring(text, i, 2))"
                )
            ).alias("g"),
        )
        # two consumers (vocab build + scoring) — pin the gram
        # projection so they don't both re-run it
        .localCheckpoint(eager=True)
    )
    dfreq = (
        grams.select("lang", F.explode("g").alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("gram").asc()
    )
    vlists = (
        dfreq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _OOV_TOPK)
        .groupBy("lang")
        .agg(F.collect_list("gram").alias("vl"))
    )
    return grams.join(F.broadcast(vlists), "lang").select(
        "doc_id",
        "lang",
        F.size("g").cast("long").alias("n_bigrams"),
        (
            F.size(F.array_intersect("g", "vl")).cast("double")
            / F.size("g")
        ).alias("iv_rate"),
    )


# --------------------------------------------- boilerplate scrub

_SEG_W = 10  # words per deterministic segment ("line" stand-in)
_BOILER_N = 2  # segment appearing in >= N docs is boilerplate

_SCRUB_ORACLE = f"""
WITH corpus AS ({DOC_NEAR_CORPUS_SQL}),
base AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
segs AS (
    SELECT doc_id, i AS idx,
           array_to_string(w[(i*{_SEG_W}+1):((i+1)*{_SEG_W})], ' ') AS seg
    FROM base,
         UNNEST(range(CAST(ceil(len(w)/{_SEG_W}.0) AS BIGINT))) AS t(i)),
freq AS (SELECT seg, COUNT(DISTINCT doc_id) AS nd FROM segs GROUP BY seg),
kept AS (
    SELECT s.doc_id, s.idx, s.seg FROM segs s
    WHERE s.seg NOT IN (SELECT seg FROM freq WHERE nd >= {_BOILER_N})),
agg AS (
    SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS clean_text,
           COUNT(*) AS n_kept
    FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, COUNT(*) AS n_total FROM segs GROUP BY doc_id)
SELECT t.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       CAST(COALESCE(a.n_kept, 0) AS INTEGER) AS n_kept,
       CAST(t.n_total - COALESCE(a.n_kept, 0) AS INTEGER) AS n_removed
FROM tot t LEFT JOIN agg a USING (doc_id)
"""


@register("text_boilerplate_scrub", oracle=_SCRUB_ORACLE)
def text_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate REMOVAL with reassembly — the
    rewrite half the dedup family lacked (dedup_substring_spans
    detects shared spans; a training pipeline must also SHIP the
    scrubbed corpus, the C4/CCNet line-dedup step). Deterministic
    10-word segments stand in for lines (the synthetic docs
    have no newlines); any segment appearing in >= 2
    documents is boilerplate, surviving segments rejoin in original
    order, and per-doc kept/removed counts ride along for the
    audit trail.

    Plan: segment fan-out stays in whole-stage codegen (split +
    transform + slice + posexplode, no Python); frequency counting
    shuffles (doc_id, md5) digests only — never segment bodies; the
    anti join on the digest is NOT hinted broadcast (the boilerplate
    set is corpus-dependent — AQE broadcasts it when it is small,
    shuffles when it is not, unlike a forced-broadcast that would
    cap scale); reassembly reuses one groupBy(doc_id) shuffle of the
    surviving segments. At 100TB the digest shuffle dominates and is
    linear in corpus size — no pairwise term anywhere.

    Reference parity: beyond-reference (north-star extension); the
    detection half cites the same literature as
    dedup_substring_spans."""
    from innercircle_etl_spark.plans.planting import plant_near_docs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = plant_near_docs(docs)
    segs = (
        corpus.withColumn("w", F.split("text", " "))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0,"
                    f" cast(ceil(size(w)/{_SEG_W}.0) as int) - 1),"
                    f" i -> array_join(slice(w, i*{_SEG_W}+1, {_SEG_W}),"
                    f" ' '))"
                )
            ).alias("idx", "seg"),
        )
        .withColumn("h", F.md5("seg"))
        # THREE consumers (boiler's distinct, the anti-join probe
        # side, and the per-doc totals) — eager localCheckpoint runs
        # the split+posexplode+md5 fan-out once and pins it, same
        # convention as ngram_jaccard_pairs' corpus pin (racing
        # consumers measured ~2x whole-query cost there)
        .localCheckpoint(eager=True)
    )
    boiler = (
        segs.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= _BOILER_N)
        .select("h")
    )
    kept = segs.join(boiler, "h", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "seg"))),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    tot = segs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_total"))
    return tot.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
        (F.col("n_total") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("int")
        .alias("n_removed"),
    )


# ------------------------------------- corpus-LM rarity filter (CCNet)

_LM_KEEP_NUM = 12  # keep while mean_rarity <= 1.2x the corpus mean
_LM_KEEP_DEN = 10  # (integer ratio: mean*DEN <= corpus_mean*NUM)

_LM_RARITY_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
lm AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM lm),
scored AS (
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM((n.n * 1000) // lm.cnt) AS BIGINT) AS rarity_sum
    FROM toks t JOIN lm USING (term) CROSS JOIN n
    GROUP BY t.doc_id
),
g AS (
    SELECT CAST(SUM(rarity_sum) // SUM(n_tokens) AS BIGINT) AS corpus_mean
    FROM scored
)
SELECT s.doc_id,
       s.n_tokens,
       CAST(s.rarity_sum // s.n_tokens AS BIGINT) AS mean_rarity,
       (s.rarity_sum // s.n_tokens) * {_LM_KEEP_DEN}
           <= g.corpus_mean * {_LM_KEEP_NUM} AS keep
FROM scored s CROSS JOIN g
"""


@register("text_lm_rarity_filter", oracle=_LM_RARITY_ORACLE)
def text_lm_rarity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM perplexity filtering, CCNet-style (Wenzek et al.
    2019, public): train a unigram LM on the corpus itself, score
    every document by its mean per-token surprisal, and cull the
    high-perplexity tail (here: mean rarity > 1.2x the corpus mean,
    ~the worst 5% on this fixture) — the quality gate CCNet runs with
    a KenLM model between dedup and language split.

    The floating ``-log p(w)`` surprisal is INTEGER-QUANTIZED to
    ``(N*1000) div count(w)`` — the same exact-BIGINT discipline as
    text_tfidf_terms (engines' last-ulp ``ln`` would make the
    keep-boundary engine-dependent); the statistic is a monotone
    rarity weighting with identical cull semantics, and every value
    here (sums, divisions, the threshold compare) is exact integer
    arithmetic, hash-stable across engines.

    Plan/scale: one vocab-bounded shuffle builds the LM (map-side
    combined groupBy; web-scale vocabs prune to a bounded table) and
    PINS it (eager localCheckpoint — vocab-bounded, so the pin is
    constant-size); the token total AND the corpus mean are both
    vocab-sized aggregates over the pinned table — the mean uses the
    exact-BIGINT identity sum_docs(rarity_sum) = sum_t(cnt *
    ((n*1000) div cnt)), sum_docs(n_tokens) = sum_t(cnt) = n (every
    token joins its LM row exactly once), so neither needs a second
    corpus pass. Scoring joins the token stream to the pinned LM —
    vocab-bounded, AQE broadcasts it — then one doc-keyed shuffle
    sums per document. Before round 16 the final DAG held SIX corpus
    explode passes (scored consumed twice, each holding lm + n_df
    subtrees); now exactly two (LM build at pin time, scoring). No
    per-row Python, no driver collect; at 100 TB the only
    full-corpus shuffle is the per-doc sum, keyed on doc_id
    (uniform — no skew).

    Reference parity: beyond-reference (north-star extension)."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    lm = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    n_df = lm.agg(F.sum("cnt").alias("n"))
    g = lm.crossJoin(F.broadcast(n_df)).agg(
        F.expr(
            "sum(cnt * ((n * 1000) div cnt)) div sum(cnt)"
        ).alias("corpus_mean")
    )
    scored = (
        toks.join(lm, "term")
        .crossJoin(F.broadcast(n_df))
        .withColumn("surprisal", F.expr("(n * 1000) div cnt"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("surprisal").alias("rarity_sum"),
        )
    )
    return (
        scored.crossJoin(F.broadcast(g))
        .select(
            "doc_id",
            "n_tokens",
            F.expr("rarity_sum div n_tokens").alias("mean_rarity"),
            F.expr(
                f"(rarity_sum div n_tokens) * {_LM_KEEP_DEN}"
                f" <= corpus_mean * {_LM_KEEP_NUM}"
            ).alias("keep"),
        )
    )


# --------------------------------------------- chunk windows (RAG prep)

_CHUNK_W = 32  # tokens per chunk
_CHUNK_S = 24  # stride (overlap = _CHUNK_W - _CHUNK_S)

# Shared CTE body (documents -> overlapping chunk windows): ep10's
# retrieval oracle builds on the same chunking — single source here,
# same discipline as planting.py's both-language forms.
CHUNK_CTES_SQL = f"""base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
nch AS (
    SELECT doc_id, w, len(w) AS n,
           1 + GREATEST(0, CAST(ceil((len(w) - {_CHUNK_W}) / {_CHUNK_S}.0)
                                AS BIGINT)) AS nc
    FROM base),
chunks AS (
    SELECT doc_id, i AS chunk_idx,
           i*{_CHUNK_S} + 1 AS tok_start,
           LEAST(i*{_CHUNK_S} + {_CHUNK_W}, n) AS tok_end,
           array_to_string(w[(i*{_CHUNK_S}+1):(i*{_CHUNK_S}+{_CHUNK_W})],
                           ' ') AS chunk_text
    FROM nch, UNNEST(range(nc)) AS t(i))"""

_CHUNK_ORACLE = f"""
WITH {CHUNK_CTES_SQL}
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(tok_start AS INTEGER) AS tok_start,
       CAST(tok_end AS INTEGER) AS tok_end,
       CAST(tok_end - tok_start + 1 AS INTEGER) AS n_tokens,
       chunk_text
FROM chunks
"""


@register("text_chunk_windows", oracle=_CHUNK_ORACLE)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping chunk windows — the context-preparation step every
    RAG / pretraining pipeline runs between cleaning and embedding:
    each document becomes fixed-width token windows (32
    tokens, stride 24, so consecutive chunks overlap by 8) with doc-relative 1-based token offsets,
    the final window clipped to the document end. Composes directly
    with the embedding/ANN family (chunk_text -> embed -> index) and
    with text_pack_shards (chunks are what actually get packed).

    Plan: pure per-row fan-out — split + window arithmetic +
    posexplode, all whole-stage codegen, no shuffle at all (the scan
    IS the plan). At 100TB this is the ideal shape: output partition
    count follows input splits and every chunk carries its
    provenance (doc_id, offsets) for dedup/citation downstream.

    Reference parity: beyond-reference (north-star extension)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    W, S = _CHUNK_W, _CHUNK_S
    chunks = (
        docs.withColumn("w", F.split("text", " "))
        .withColumn("n", F.size("w"))
        .withColumn(
            "nc",
            F.lit(1)
            + F.greatest(
                F.lit(0),
                F.ceil((F.col("n") - W) / F.lit(float(S))).cast("long"),
            ),
        )
        .select(
            "doc_id",
            "n",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, cast(nc - 1 as int)),"
                    f" i -> array_join(slice(w, i*{S}+1, {W}), ' '))"
                )
            ).alias("chunk_idx", "chunk_text"),
        )
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * S + 1).cast("int").alias("tok_start"),
        F.least(F.col("chunk_idx") * S + W, F.col("n"))
        .cast("int")
        .alias("tok_end"),
        (
            F.least(F.col("chunk_idx") * S + W, F.col("n"))
            - (F.col("chunk_idx") * S + 1)
            + 1
        )
        .cast("int")
        .alias("n_tokens"),
        "chunk_text",
    )


# ---------------------------------------- funnel states (seq family)

_FUNNEL_ORACLE = """
WITH f AS (
    SELECT user_id, event_id, ts, event_type FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
),
u AS (SELECT DISTINCT user_id FROM f),
v AS (SELECT user_id, MIN(ts) AS t_view FROM f
      WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT f.user_id, MIN(f.ts) AS t_click
      FROM f JOIN v ON f.user_id = v.user_id
      WHERE f.event_type = 'click' AND f.ts > v.t_view GROUP BY 1),
p AS (SELECT f.user_id, MIN(f.ts) AS t_purchase
      FROM f JOIN c ON f.user_id = c.user_id
      WHERE f.event_type = 'purchase' AND f.ts > c.t_click GROUP BY 1)
SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 WHEN v.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INTEGER) AS steps_completed
FROM u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
"""

_FUNNEL_FOLD = """
aggregate(
  seq,
  named_struct('t1', cast(null as timestamp_ntz),
               't2', cast(null as timestamp_ntz),
               't3', cast(null as timestamp_ntz)),
  (acc, x) -> CASE
    WHEN acc.t1 IS NULL AND x.event_type = 'view'
      THEN named_struct('t1', x.ts, 't2', acc.t2, 't3', acc.t3)
    WHEN acc.t1 IS NOT NULL AND acc.t2 IS NULL
         AND x.event_type = 'click' AND x.ts > acc.t1
      THEN named_struct('t1', acc.t1, 't2', x.ts, 't3', acc.t3)
    WHEN acc.t2 IS NOT NULL AND acc.t3 IS NULL
         AND x.event_type = 'purchase' AND x.ts > acc.t2
      THEN named_struct('t1', acc.t1, 't2', acc.t2, 't3', x.ts)
    ELSE acc END)
"""


@register("seq_funnel_states", oracle=_FUNNEL_ORACLE)
def seq_funnel_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-funnel state machine — per user, the ORDERED step
    progression view -> click -> purchase (each step's timestamp must
    strictly follow the previous step's): the product-analytics
    classic, and the sequence-labeling shape an event-log training
    pipeline runs to tag user timelines with funnel depth.

    The Spark form is ONE user-keyed shuffle: sort each user's
    (ts, event_id, type) structs inside the aggregate (the
    seq_event_assembly determinism discipline), then fold the funnel
    state machine over the array with the `aggregate` higher-order
    function — pure codegen'd column expressions, no UDF, no second
    pass. The oracle computes the same semantics relationally as
    three sequential conditional-min passes (min view; min click
    after it; min purchase after that) — first-match-in-sorted-order
    == conditional min at every step, which is exactly what the
    side-by-side hash check proves. At 100 TB the relational form
    re-shuffles per step; the fold visits each user's timeline once
    (power users: shard by time range first — the
    seq_event_assembly discipline).

    Reference parity: beyond-reference (north-star extension)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    st = per_user.withColumn("st", F.expr(_FUNNEL_FOLD))
    return st.select(
        "user_id",
        F.col("st.t1").alias("t_view"),
        F.col("st.t2").alias("t_click"),
        F.col("st.t3").alias("t_purchase"),
        F.when(F.col("st.t3").isNotNull(), 3)
        .when(F.col("st.t2").isNotNull(), 2)
        .when(F.col("st.t1").isNotNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("steps_completed"),
    )
