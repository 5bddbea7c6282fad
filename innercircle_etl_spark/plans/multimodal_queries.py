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
from innercircle_etl_spark.plans.planting import DOC_MUT_CORPUS_SQL
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


# --------------------------------------------- perceptual-hash dedup

_PHASH_T = 3  # max Hamming distance (64-bit signature)

# CTE body shared by the phash-pair oracle and ep14's composite
# oracle (corpus -> byte stats -> 64 block sums -> 4x16-bit quarters).
_PHASH_SIG_CTES = f"""corpus AS ({DOC_MUT_CORPUS_SQL}
),
base AS (
    SELECT doc_id, text, length(text) AS L,
           list_reduce(list_transform(generate_series(1, length(text)),
               p -> ascii(substr(text, p, 1))), (x, y) -> x + y) AS total
    FROM corpus
    WHERE length(text) >= 64 AND strlen(text) = length(text)
),
blocks AS (
    SELECT doc_id, total,
           list_transform(generate_series(0, 63), i ->
               list_reduce(list_transform(
                   generate_series((i * L) // 64 + 1, ((i + 1) * L) // 64),
                   p -> ascii(substr(text, p, 1))), (x, y) -> x + y)) AS bs
    FROM base
),
sig AS (
    SELECT doc_id,
           list_transform(generate_series(0, 3), q ->
               list_reduce(list_transform(generate_series(0, 15), k ->
                   CASE WHEN 64 * bs[q * 16 + k + 1] > total
                        THEN (1 << k) ELSE 0 END), (x, y) -> x + y)) AS qs
    FROM blocks
)"""

_PHASH_PAIRS_SELECT = f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.qs[1], b.qs[1]))
          + bit_count(xor(a.qs[2], b.qs[2]))
          + bit_count(xor(a.qs[3], b.qs[3]))
          + bit_count(xor(a.qs[4], b.qs[4])) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.qs[1], b.qs[1]))
    + bit_count(xor(a.qs[2], b.qs[2]))
    + bit_count(xor(a.qs[3], b.qs[3]))
    + bit_count(xor(a.qs[4], b.qs[4])) <= {_PHASH_T}
"""

_PHASH_ORACLE = f"WITH {_PHASH_SIG_CTES}{_PHASH_PAIRS_SELECT}"


@register("mm_dedup_phash", oracle=_PHASH_ORACLE)
def mm_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup — the multimodal member of the
    dedup family: a 64-bit BLOCKHASH signature per blob (64 equal
    byte-blocks; bit i = block i's mean byte > the global mean —
    integer-exact as 64*block_sum > total_sum), pairs within Hamming
    distance 3 (_PHASH_T). Robust to small byte edits (the planted
    same-length mutations land at Hamming 0-1) but, like any
    blockhash, NOT to length changes — real pipelines normalize
    (resize) first, which is mm_image_resize's role.

    Scale shape is dedup_simhash's pigeonhole transplanted to the
    multimodal family: the 64-bit signature splits into 4 x 16-bit
    quarters; any pair within Hamming <= 3 must agree on at least
    one quarter, so a 4-way union of equi-joins on (quarter index,
    quarter value) finds ALL qualifying pairs with no O(n^2) scan.
    Signatures come from ONE Arrow pass over the binary column
    (numpy cumsum over each blob; the blob never crosses a shuffle,
    only the 4 smallint-sized quarters do). Verify is bit_count in
    whole-stage codegen. The oracle brute-forces all pairs — the
    pigeonhole condition is implied by Hamming <= 3, so both sides
    compute the same set."""
    import numpy as np
    import pandas as pd

    from innercircle_etl_spark.plans.planting import plant_mutated_docs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = plant_mutated_docs(docs).filter(
        (F.length("text") >= 64)
        # ASCII-only gate, enforced on BOTH engines: the plan hashes
        # UTF-8 BYTES while the DuckDB oracle walks CHARACTERS via
        # ascii()/length() — equivalent only when every char is one
        # byte. Without the gate the oracle would hold incidentally
        # (current fixtures are ASCII) and diverge silently on a
        # non-ASCII fixture regen; with it the equivalence is a
        # checked precondition on both sides (oracle mirrors it as
        # strlen(text) = length(text)).
        & (F.octet_length("text") == F.length("text"))
    )
    media = corpus.select(
        "doc_id", F.encode("text", "utf-8").alias("media")
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")

    def sig_batches(batches):
        # Whole-batch vectorization (round 16, guide §4.2): the old
        # body looped per DOCUMENT with a fresh numpy cumsum each —
        # ~20 small allocations per row. Now ONE concatenated buffer
        # and ONE int64 cumsum serve the whole Arrow batch; each
        # doc's 64 block sums come from fancy-indexing the shared
        # prefix-sum at bounds off_i + (j*L_i)//64 — the identical
        # integers ((a+b)-prefix differencing is associative), so
        # signatures are bit-identical to the per-doc form.
        weights = 1 << np.arange(16, dtype=np.int64)
        j = np.arange(65, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            blobs = [
                np.frombuffer(bytes(b), np.uint8) for b in pdf["media"]
            ]
            lens = np.fromiter(
                (b.size for b in blobs), np.int64, len(blobs)
            )
            csum = np.empty(int(lens.sum()) + 1, np.int64)
            csum[0] = 0
            np.cumsum(np.concatenate(blobs), dtype=np.int64, out=csum[1:])
            offs = np.concatenate(([0], np.cumsum(lens)))
            bounds = offs[:-1, None] + (j[None, :] * lens[:, None]) // 64
            bvals = csum[bounds]  # (n, 65) shared-prefix-sum reads
            bsums = bvals[:, 1:] - bvals[:, :-1]
            totals = bvals[:, -1] - bvals[:, 0]
            bits = (64 * bsums) > totals[:, None]
            out = {"doc_id": pdf["doc_id"].to_numpy()}
            for q in range(4):
                out[f"q{q}"] = bits[:, q * 16 : (q + 1) * 16] @ weights
            yield pd.DataFrame(out)

    # eager checkpoint: both sides of the quarter self-join consume
    # the signature table (the simhash lesson — without the boundary
    # each side re-runs the Arrow pass)
    sig = media.mapInPandas(
        sig_batches, "doc_id long, q0 int, q1 int, q2 int, q3 int"
    ).localCheckpoint(eager=True)

    blocked = sig.select(
        "doc_id",
        "q0",
        "q1",
        "q2",
        "q3",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{q}:"), F.col(f"q{q}").cast("string")
                    )
                    for q in range(4)
                ]
            )
        ).alias("blk"),
    )
    a = blocked.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"q{q}").alias(f"a{q}") for q in range(4)],
        "blk",
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"q{q}").alias(f"b{q}") for q in range(4)],
        "blk",
    )
    ham = sum(
        F.bit_count(
            F.col(f"a{q}").bitwiseXOR(F.col(f"b{q}"))
        ).cast("int")
        for q in range(4)
    )
    return (
        a.join(b, ["blk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= _PHASH_T)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


# ----------------------- ep14: image-text training-pair composite

_EP14_MIN_CAPTION = 16  # caption-quality floor (whitespace tokens)

_EP14_ORACLE = f"""
WITH {_PHASH_SIG_CTES},
pairs AS ({_PHASH_PAIRS_SELECT}),
dups AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
caps AS (
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS image_bytes,
           CAST(len(string_split(text, ' ')) AS INTEGER)
             AS n_caption_tokens
    FROM corpus
    WHERE length(text) >= 64 AND strlen(text) = length(text)
)
SELECT c.doc_id, c.image_bytes, c.n_caption_tokens,
       CASE WHEN d.doc_id IS NOT NULL THEN 'image_dup'
            WHEN c.n_caption_tokens < {_EP14_MIN_CAPTION}
              THEN 'bad_caption'
            ELSE 'paired' END AS verdict
FROM caps c LEFT JOIN dups d ON c.doc_id = d.doc_id
"""


@register("ep14_multimodal_pairs", oracle=_EP14_ORACLE)
def ep14_multimodal_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text TRAINING-PAIR build (the CLIP/LAION-style curation
    recipe, public): every (image blob, caption) pair is gated in
    production order — perceptual-hash near-dup removal keeps the
    canonical (minimum-id) image of each near-identical group, then
    a caption-quality floor drops pairs whose text is too short to
    supervise — and every pair leaves labeled image_dup /
    bad_caption / paired (the ep11/ep12 verdict discipline applied
    to the multimodal family). Composes the registered
    mm_dedup_phash (pigeonhole-blocked signature pairs, blobs never
    shuffled) with the standard media fabrication.

    Scale shape: the phash stage is ONE Arrow pass + quarter
    equi-joins (no O(n²) anything); the dup-id set is id-only and
    pinned (it feeds the verdict join while the caption stats come
    from an independent corpus pass); caption stats are pure column
    work. LAION-scale curation is exactly this DAG with real codecs
    behind the same signature contract.

    Reference parity: beyond-reference (north-star extension)."""
    from innercircle_etl_spark.functions import text as TX
    from innercircle_etl_spark.plans.planting import plant_mutated_docs

    pairs = mm_dedup_phash(spark, sf_dir)
    dups = (
        pairs.select(F.col("doc_b").alias("doc_id"))
        .distinct()
        # id-only; pinned so the phash subtree runs exactly once
        # even though the verdict join and any audit both read it
        .localCheckpoint(eager=True)
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = plant_mutated_docs(docs).filter(
        (F.length("text") >= 64)
        & (F.octet_length("text") == F.length("text"))
    )
    caps = corpus.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("image_bytes"),
        TX.token_count(F.col("text")).alias("n_caption_tokens"),
    )
    return caps.join(
        dups.withColumn("is_dup", F.lit(True)), "doc_id", "left"
    ).select(
        "doc_id",
        "image_bytes",
        "n_caption_tokens",
        F.when(F.col("is_dup"), F.lit("image_dup"))
        .when(
            F.col("n_caption_tokens") < _EP14_MIN_CAPTION,
            F.lit("bad_caption"),
        )
        .otherwise(F.lit("paired"))
        .alias("verdict"),
    )
