"""Codec-registry behavior on a codec-less box: gates raise the
documented error, lookups degrade to None (fake fallback), and the
fake operators stay deterministic.
"""

from __future__ import annotations

import pytest

from innercircle_etl_spark.functions import multimodal as MM


def test_require_codec_raises_documented_error():
    with pytest.raises(NotImplementedError, match="not installed"):
        MM.require_codec("PIL")


def test_get_decoder_returns_none_without_lib():
    # this container has no PIL/soundfile/av — lookups must degrade,
    # not crash
    assert MM.get_decoder("image") is None or MM._CODECS.get("PIL")
    assert MM.get_decoder("no_such_kind") is None


def test_register_decoder_roundtrip():
    MM.register_decoder("test_kind", lambda b: {"n": len(b)})
    try:
        assert MM.get_decoder("test_kind")(b"abc") == {"n": 3}
    finally:
        MM._DECODERS.pop("test_kind", None)


def test_fake_image_features_deterministic():
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "media": [bytes(range(64))],
            "width": [10],
            "height": [4],
        }
    )
    out1 = next(MM.image_feature_batches(iter([pdf])))
    out2 = next(MM.image_feature_batches(iter([pdf])))
    pd.testing.assert_frame_equal(out1, out2)
    assert out1["n_pixels"][0] == 40
