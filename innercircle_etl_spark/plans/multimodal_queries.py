"""Multimodal-column queries: binary media + typed metadata through
mapInPandas (north-star extension; no reference analog — the
reference's only semi-structured payloads are JSON, SURVEY §1.1).

The media column is fabricated deterministically from the documents
table (utf-8 bytes of ASCII text — verified ASCII, so DuckDB can
mirror every byte-level feature with ascii()/substr on the string),
giving the pandas-UDF plumbing an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from innercircle_etl_spark.functions import multimodal as MM
from innercircle_etl_spark.plans.registry import load, register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media binary, width, height): the typed
    metadata a real ingest would carry alongside the blob."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        (F.col("doc_id") % 64 + 1).alias("width"),
        (F.col("doc_id") % 48 + 1).alias("height"),
    )


_IMG_ORACLE = """
WITH media AS (
    SELECT doc_id, text,
           doc_id % 64 + 1 AS width,
           doc_id % 48 + 1 AS height
    FROM documents
)
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       list_reduce(
           list_transform(
               generate_series(1, (length(text) + 15) // 16),
               i -> ascii(substr(text, (i - 1) * 16 + 1, 1))),
           (x, y) -> x + y) % 2147483647 AS checksum16,
       width * height AS n_pixels,
       greatest(width // 2, 1) AS resize_w,
       greatest(height // 2, 1) AS resize_h
FROM media
"""


@register("mm_image_features", oracle=_IMG_ORACLE)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction over a binary media column:
    mapInPandas (Arrow batches), deterministic fake decode (see
    functions/multimodal.py — real codecs gated by require_codec).
    Repartition by doc_id first: decode CPU spreads across all
    cores, and at 100TB each task holds only its batch of blobs."""
    media = _media(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return media.mapInPandas(
        MM.image_feature_batches, MM.IMAGE_FEATURE_SCHEMA
    )


_FRAME_ORACLE = f"""
WITH frames AS (
    SELECT doc_id, text,
           unnest(generate_series(
               1, greatest((length(text) + {MM.FRAME_BYTES} - 1)
                           // {MM.FRAME_BYTES}, 1))) AS f
    FROM documents
)
SELECT doc_id,
       CAST(f - 1 AS BIGINT) AS frame_idx,
       CAST(length(substr(text, (f - 1) * {MM.FRAME_BYTES} + 1,
                          {MM.FRAME_BYTES})) AS BIGINT) AS frame_len,
       md5(substr(text, (f - 1) * {MM.FRAME_BYTES} + 1,
                  {MM.FRAME_BYTES})) AS frame_md5
FROM frames
"""


@register("mm_av_frame_sample", oracle=_FRAME_ORACLE)
def mm_av_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio/video frame sampling: one output row per fixed-size
    frame of the binary payload (UDTF shape through mapInPandas),
    fingerprint = md5(frame). The binary never crosses a shuffle —
    frames reduce to (id, idx, len, md5) inside the scan stage."""
    media = _media(spark, sf_dir).select("doc_id", "media").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return media.mapInPandas(MM.frame_sample_batches, MM.FRAME_SAMPLE_SCHEMA)


@register("mm_av_frame_sample_udtf", oracle=_FRAME_ORACLE)
def mm_av_frame_sample_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame sampler as a NATIVE Python UDTF (Spark 4
    ``@F.udtf``) — the declared table-function form of the same
    one-row-in / n-frames-out expansion mm_av_frame_sample expresses
    through mapInPandas. Same oracle; the lateral-join plan lets
    Catalyst see the expansion as a table function instead of an
    opaque map stage. Row-at-a-time Python (no Arrow batching), so
    the mapInPandas form stays the hot-path choice — this variant
    documents the §2.10 UDTF surface natively."""
    import hashlib

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    @F.udtf(
        returnType=StructType(
            [
                StructField("frame_idx", LongType()),
                StructField("frame_len", LongType()),
                StructField("frame_md5", StringType()),
            ]
        )
    )
    class FrameSampler:
        def eval(self, media):
            blob = bytes(media) if media is not None else b""
            for k in range(0, max(len(blob), 1), MM.FRAME_BYTES):
                frame = blob[k : k + MM.FRAME_BYTES]
                yield (
                    k // MM.FRAME_BYTES,
                    len(frame),
                    hashlib.md5(frame).hexdigest(),
                )

    media = _media(spark, sf_dir).select("doc_id", "media").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return media.lateralJoin(
        FrameSampler(F.col("media").outer())
    ).select("doc_id", "frame_idx", "frame_len", "frame_md5")


_RESIZE_ORACLE = """
WITH media AS (
    SELECT doc_id, text,
           doc_id % 64 + 1 AS width,
           doc_id % 48 + 1 AS height,
           array_to_string(
               list_transform(
                   generate_series(1, (length(text) + 1) // 2),
                   i -> substr(text, 2 * i - 1, 1)),
               '') AS resized
    FROM documents
)
SELECT doc_id,
       greatest(width // 2, 1) AS resize_w,
       greatest(height // 2, 1) AS resize_h,
       CAST(length(resized) AS BIGINT) AS byte_len,
       md5(resized) AS media_md5
FROM media
"""


@register("mm_image_resize", oracle=_RESIZE_ORACLE)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize with BINARY OUTPUT — the transform (not just
    feature-extract) member of the multimodal family: blob in,
    smaller blob out, new typed dims, integrity md5 (the result
    projects the md5+len instead of the blob itself — binary stays
    executor-side, as it should at 100TB). The transform is the
    deterministic fake (every-other-byte downsample) by design: a
    real-codec upgrade swaps the UDF body, and any environment
    signal like "was a codec present" stays out of the oracle-checked
    schema (it would flip the value hash per host). The blob stays inside the scan
    stage (repartition-then-map: no binary ever crosses a post-UDF
    shuffle) and the output is written-ready for a partitioned
    parquet sink at 100TB."""
    media = _media(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    resized = media.mapInPandas(
        MM.image_resize_batches, MM.IMAGE_RESIZE_SCHEMA
    )
    return resized.drop("media")
