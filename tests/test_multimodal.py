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


def test_compressed_formats_are_gated():
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="PGM/PPM"):
            mm.decode_image(b"\x89PNG\r\n\x1a\nxxxx")
    with pytest.raises(NotImplementedError, match="WAV"):
        mm.decode_audio(b"ID3\x03not-a-wav")


def test_ppm_decode_roundtrip():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    out = mm.decode_image(mm.encode_ppm(rgb))
    assert out.shape == (5, 7, 3)
    np.testing.assert_allclose(out * 255.0, rgb.astype(np.float32), atol=0.5)
    gray = rng.integers(0, 256, (4, 6), dtype=np.uint8)
    out2 = mm.decode_image(mm.encode_ppm(gray))
    assert out2.shape == (4, 6)


def test_pgm_decode_with_comment():
    raw = b"P5\n# a comment line\n3 2\n255\n" + bytes(range(6))
    out = mm.decode_image(raw)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out.ravel() * 255.0, np.arange(6), atol=0.5)


def test_wav_decode_real():
    from klio_spark.audio import dsp

    raw = dsp.synth_wav([440.0], duration_s=0.25, sr=8000)
    y = mm.decode_audio(raw)
    assert y.shape == (2000,)
    assert np.abs(y).max() <= 1.0


def test_resize_nearest():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    small = mm.resize_nearest(img, (2, 2))
    assert small.shape == (2, 2)
    np.testing.assert_array_equal(small, [[0, 2], [8, 10]])
    big = mm.resize_nearest(img, (8, 8))
    assert big.shape == (8, 8)


def test_extract_features_real_decoder_with_resize(spark):
    rng = np.random.default_rng(9)
    rows = [
        (f"img{i}", mm.encode_ppm(rng.integers(0, 256, (6 + i, 9, 3), dtype=np.uint8)))
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "element string, blob binary")
    out = mm.extract_features(
        df, "blob", decoder=mm.decode_image, resize=(4, 4)
    ).collect()
    # resize normalizes variable source resolutions to a fixed dim
    assert all(len(r.features) == 4 * 4 * 3 for r in out)
    assert "blob" not in out[0].asDict()


def test_frame_sample_flatmap_shape(spark, media_df):
    out = mm.frame_sample(media_df, "blob", every_n=5)
    rows = out.collect()
    assert len(rows) == 15  # 3 fake frames per asset
    assert {r.frame_idx for r in rows} == {0, 5, 10}
    assert all(len(r.frame) == 64 for r in rows)
