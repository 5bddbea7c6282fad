"""Multimodal (image/audio/video) column plumbing.

North-star extension (BASELINE.json: multimodal columns for a
training-data pipeline): media travels as an opaque ``binary`` column
plus a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas UDFs over ``mapInPandas``.

The actual codec libraries (Pillow, torchaudio, pyav, ...) are NOT in
this container, so the codec call is stubbed: ``require_codec`` raises
a clearly-marked NotImplementedError, and the shipped operators use
deterministic byte-level fakes (checksums, fixed-size frame slicing)
so the Spark-side plumbing — schema, partitioning, UDF signature,
Arrow batch shape — is real and oracle-tested. Swapping a fake for a
real codec changes only the body of the per-batch function.

At 100TB: binary payloads dominate row size, so these operators
repartition by id before the UDF (spread decode CPU), never collect,
and emit compact feature rows — the binary never crosses a shuffle
after the decode stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

_CODECS: dict[str, bool] = {}
for _lib in ("PIL", "soundfile", "av"):
    try:  # pragma: no cover - container has none of these
        __import__(_lib)
        _CODECS[_lib] = True
    except ImportError:
        _CODECS[_lib] = False


def require_codec(lib: str) -> None:
    """Gate for real media decoding. The test container ships no
    codec libs, so operators fall back to deterministic fakes."""
    if not _CODECS.get(lib, False):
        raise NotImplementedError(
            f"real media decode needs '{lib}', which is not installed "
            "in this environment; use the deterministic fake operators "
            "(fake_image_features / frame_sample) instead"
        )


# ------------------------------------------------ codec registry
# kind → decode(blob: bytes) -> dict of typed fields. Decoders
# self-register iff their library imports, so the SAME pipeline code
# runs real decodes where codecs exist and falls back to the
# deterministic fakes here. register_decoder lets a deployment plug
# in torchaudio/pyav/... without touching the operators.

_DECODERS: dict[str, object] = {}


def register_decoder(kind: str, fn) -> None:
    _DECODERS[kind] = fn


def get_decoder(kind: str):
    """The registered decoder for `kind`, or None (caller falls back
    to the deterministic fake — never a crash on a codec-less box)."""
    return _DECODERS.get(kind)


if _CODECS.get("PIL", False):  # pragma: no cover - not in container
    import io

    def _pil_image_decoder(blob: bytes) -> dict:
        from PIL import Image

        with Image.open(io.BytesIO(blob)) as im:
            return {
                "width": im.width,
                "height": im.height,
                "mode": im.mode,
            }

    register_decoder("image", _pil_image_decoder)


FRAME_BYTES = 128  # fixed frame size for the A/V frame sampler


def image_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, media binary, width, height) →
    per-image feature row. Deterministic fake decode: byte length,
    a strided checksum (every 16th byte), pixel count from the typed
    metadata, and the resize-target dims a real pipeline would emit.
    """
    for pdf in batches:
        if not len(pdf):
            continue
        blobs = pdf["media"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": blobs.map(len).astype("int64"),
                "checksum16": blobs.map(
                    lambda b: sum(b[::16]) % 2147483647
                ).astype("int64"),
                "n_pixels": (pdf["width"] * pdf["height"]).astype("int64"),
                "resize_w": (pdf["width"] // 2).clip(lower=1).astype("int64"),
                "resize_h": (pdf["height"] // 2).clip(lower=1).astype("int64"),
            }
        )


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, byte_len long, checksum16 long, n_pixels long, "
    "resize_w long, resize_h long"
)


def frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, media binary) → one row per
    FRAME_BYTES-sized frame (UDTF shape: n input rows → sum(frames)
    output rows). Frame fingerprint = md5 of the frame bytes —
    the deterministic stand-in for a real frame decode + phash."""
    for pdf in batches:
        if not len(pdf):
            continue
        ids, idxs, lens, digests = [], [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            for k in range(0, max(len(blob), 1), FRAME_BYTES):
                frame = blob[k : k + FRAME_BYTES]
                ids.append(doc_id)
                idxs.append(k // FRAME_BYTES)
                lens.append(len(frame))
                digests.append(hashlib.md5(frame).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_len": pd.Series(lens, dtype="int64"),
                "frame_md5": pd.Series(digests, dtype="object"),
            }
        )


FRAME_SAMPLE_SCHEMA = (
    "doc_id long, frame_idx long, frame_len long, frame_md5 string"
)


def image_resize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, media binary, width, height) →
    resized media (binary OUT, not just features). UNCONDITIONALLY
    the deterministic fake resize = drop every other byte (the 2x
    downsample a real codec would do per pixel row) — a real codec
    upgrade is a separate UDF body, kept OUT of this oracle-checked
    schema on purpose (round-4 advice: an environment-dependent
    column flips the value hash the day Pillow appears on the host).
    Emits the new blob + its md5 so downstream stages can verify
    integrity without re-reading the payload."""
    for pdf in batches:
        if not len(pdf):
            continue
        resized = pdf["media"].map(lambda b: bytes(b)[::2])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media": resized,
                "resize_w": (pdf["width"] // 2).clip(lower=1).astype("int64"),
                "resize_h": (pdf["height"] // 2).clip(lower=1).astype("int64"),
                "byte_len": resized.map(len).astype("int64"),
                "media_md5": resized.map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
            }
        )


IMAGE_RESIZE_SCHEMA = (
    "doc_id long, media binary, resize_w long, resize_h long, "
    "byte_len long, media_md5 string"
)
