import numpy as np
import pytest
from pyspark.sql import functions as F

from klio_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(f"asset-{i}", bytes([i]) * (100 + i)) for i in range(5)]
    return spark.createDataFrame(rows, "element string, blob binary")


def test_attach_media_meta(spark, media_df):
    out = mm.attach_media_meta(media_df, "blob", "image/png").collect()
    for r in out:
        assert r.media_meta.mime == "image/png"
        assert r.media_meta.size_bytes == len(r.blob)


def test_extract_features_drops_binary_and_is_deterministic(spark, media_df):
    out = mm.extract_features(media_df, "blob")
    assert "blob" not in out.columns  # raw media never re-shuffled
    rows1 = {r.element: r.features for r in out.collect()}
    rows2 = {r.element: r.features for r in mm.extract_features(media_df, "blob").collect()}
    assert rows1 == rows2
    assert all(len(v) == 64 for v in rows1.values())  # 8x8 fake decode


def test_fake_decoders_deterministic():
    img1 = mm.fake_image_decode(b"payload")
    img2 = mm.fake_image_decode(b"payload")
    np.testing.assert_array_equal(img1, img2)
    assert img1.shape == (8, 8)
    a1 = mm.fake_audio_decode(b"payload")
    assert a1.shape == (16000,)
    assert not np.array_equal(img1, mm.fake_image_decode(b"other"))


def test_real_decoders_are_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"x")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"x")


def test_frame_sample_flatmap_shape(spark, media_df):
    out = mm.frame_sample(media_df, "blob", every_n=5)
    rows = out.collect()
    assert len(rows) == 15  # 3 fake frames per asset
    assert {r.frame_idx for r in rows} == {0, 5, 10}
    assert all(len(r.frame) == 64 for r in rows)
