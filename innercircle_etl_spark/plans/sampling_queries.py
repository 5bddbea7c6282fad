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

from pyspark.sql import DataFrame, SparkSession
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
