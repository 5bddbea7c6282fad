"""Invariance and determinism properties of the similarity sketches:
sign buckets must be scale-invariant (the lossless-candidate claim
for positive-scalar near-dups), and the Lloyd codebook must be
bit-deterministic across runs (the decimal-exact-means claim).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from innercircle_etl_spark.functions import vectors as V
from innercircle_etl_spark.plans.registry import load
from innercircle_etl_spark.plans.similarity_queries import lloyd_codebook


def test_sign_bucket_positive_scale_invariant(spark, sf_dir):
    """bucket(c * v) == bucket(v) for c > 0 — the property that
    makes single-band sign-LSH lossless for scalar-copy near-dups."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", V.as_double(F.col("embedding")).alias("v"))
    planes = V.hyperplane_weights(16, 64)
    for factor in (1.5, 0.01, 250.0):
        scaled = e.select("vec_id", V.scale(F.col("v"), factor).alias("v"))
        a = e.select(
            "vec_id", V.sign_bucket(F.col("v"), planes).alias("b")
        )
        b = scaled.select(
            "vec_id", V.sign_bucket(F.col("v"), planes).alias("b2")
        )
        diff = a.join(b, "vec_id").filter(F.col("b") != F.col("b2")).count()
        assert diff == 0, f"scale {factor}: {diff} bucket flips"


def test_lloyd_codebook_deterministic(spark, sf_dir):
    """Two independent trainings yield bit-identical centroids —
    required for the rows-only queries built on it to be stable
    across driver runs."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", V.as_double(F.col("embedding")).alias("v"))

    def snapshot():
        return sorted(
            (r["cid"], tuple(r["cv"]))
            for r in lloyd_codebook(e, iters=2).collect()
        )

    first, second = snapshot(), snapshot()
    assert first == second
    assert len(first) > 0


def test_multiprobe_recovers_what_single_bucket_misses(spark, sf_dir):
    """The margin-multiprobe dedup exists because plain sign-bucketing
    is NOT lossless for non-scalar perturbations: on the perturbed
    corpus, at least one planted pair lands in different buckets (the
    perturbation flips a near-plane projection), yet the multiprobe
    query returns every planted pair. Also checks the probe-side
    blowup stays modest (the margin bound is doing its job)."""
    from innercircle_etl_spark.plans.dedup_queries import (
        _EMB_PLANES,
        _EMB_DIM,
        _emb_multiprobe_corpus,
    )
    from innercircle_etl_spark.plans import QUERIES

    emb = load(spark, sf_dir, "embeddings")
    corpus = _emb_multiprobe_corpus(emb)
    planes = V.hyperplane_weights(_EMB_PLANES, _EMB_DIM)
    bkt = corpus.select(
        "vec_id", V.sign_bucket(F.col("v"), planes).alias("bucket")
    )
    buckets = {r["vec_id"]: r["bucket"] for r in bkt.collect()}
    plants = [v for v in buckets if v >= 100000]
    assert plants
    split = [v for v in plants if buckets[v] != buckets[v - 100000]]
    # statistically certain on any fixture generation: each plant
    # flips >= 1 of 16 planes with probability ~0.5
    assert split, "perturbation never flipped a bucket — corpus too easy"

    found = {
        (r["vec_a"], r["vec_b"])
        for r in QUERIES["dedup_embedding_multiprobe"](
            spark, sf_dir
        ).collect()
    }
    for v in plants:
        assert (v - 100000, v) in found, (v, buckets[v], buckets[v - 100000])


def test_simhash_bit_sum_matches_plus_minus_vote(spark):
    """The r16 simhash rewrite rests on one identity: the per-bit
    sum of +1/-1 votes equals 2*sum(bit) - n, so majority (vote > 0)
    is exactly 2*sum_b > n. Pin it by computing the sketch both ways
    on a small adversarial corpus (ties, single-token docs, repeated
    tokens) and requiring bit-identical signatures."""
    from innercircle_etl_spark.functions import sketches as SK

    rows = [
        (1, "a"),                       # single token
        (2, "a a a a"),                 # repeats (weighted votes)
        (3, "a b"),                     # even count -> exact ties
        (4, "x y z w v u t s"),         # wider mix, even count
        (5, "q q r"),                   # odd with multiplicity
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    new = {
        r["doc_id"]: r["simhash"]
        for r in SK.simhash32(df, "doc_id", "text").collect()
    }

    # reference: the pre-r16 +-1 vote form, inlined verbatim
    exploded = df.select(
        "doc_id",
        F.explode(F.split(F.col("text"), " ")).alias("__tok"),
    ).select("doc_id", SK.word_hash32(F.col("__tok")).alias("__h"))
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("__h"), b).bitwiseAND(1) == 1, 1
            ).otherwise(-1)
        ).alias(f"__b{b}")
        for b in range(32)
    ]
    voted = exploded.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(32):
        term = F.when(F.col(f"__b{b}") > 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        )
        sim = term if sim is None else sim + term
    old = {
        r["doc_id"]: r["simhash"]
        for r in voted.select(
            "doc_id", sim.cast("long").alias("simhash")
        ).collect()
    }
    assert new == old
