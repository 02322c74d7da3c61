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
            mm.decode_image(b"\xff\xd8\xff\xe0fake-jpeg")  # JPEG magic
    # a truncated PNG is a hard error, not a silent fake decode
    with pytest.raises(ValueError, match="IHDR"):
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


def test_png_decode_roundtrip_with_repo_encoder():
    """The decoder is the exact inverse of the repo's numpy+zlib PNG
    encoder (klio_spark.audio._matrix_to_png): encode a feature matrix,
    decode the bytes, and recover the LUT-colored pixels exactly."""
    from klio_spark.audio import _magma_lut, _matrix_to_png

    rng = np.random.default_rng(11)
    m = rng.standard_normal((9, 13)).astype(np.float64)
    png = _matrix_to_png(m)
    out = mm.decode_image(png)
    assert out.shape == (9, 13, 3)
    # reproduce the encoder's normalize+LUT+flip to get expected pixels
    lo, hi = float(m.min()), float(m.max())
    idx = np.clip(((m - lo) / (hi - lo) * 255).astype(np.int64), 0, 255)
    want = _magma_lut()[idx][::-1]
    np.testing.assert_array_equal(
        (out * 255.0).round().astype(np.uint8), want
    )
    # grayscale color map → still RGB bytes, still exact
    png_g = _matrix_to_png(m, cmap="gray")
    assert mm.decode_image(png_g).shape == (9, 13, 3)


def _encode_png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Tiny reference encoder applying a CHOSEN filter per scanline —
    exercises the decoder's Sub/Up/Average/Paeth reconstruction, which
    the repo encoder (always filter 0) never emits."""
    import struct
    import zlib

    h, w = img.shape[:2]
    channels = 1 if img.ndim == 2 else img.shape[2]
    px = img.reshape(h, w * channels).astype(np.int64)
    bpp = channels
    raw = b""
    for r, ft in zip(range(h), filters):
        line = px[r]
        prior = px[r - 1] if r else np.zeros_like(line)
        enc = np.zeros_like(line)
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([ft]) + enc.astype(np.uint8).tobytes()

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_decode_all_filters_and_color_types(channels):
    """Foreign PNGs use every scanline filter; decode must reconstruct
    Sub/Up/Average/Paeth rows exactly for gray, gray+alpha, RGB, RGBA."""
    rng = np.random.default_rng(channels)
    shape = (5, 6) if channels == 1 else (5, 6, channels)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    png = _encode_png_with_filters(img, [0, 1, 2, 3, 4])
    out = mm.decode_image(png)
    assert out.shape == shape
    np.testing.assert_array_equal(
        (out * 255.0).round().astype(np.uint8), img
    )


def test_png_decode_rejects_unsupported_variants():
    import struct
    import zlib

    def mk(depth=8, ctype=2, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace)
        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + chunk(b"IEND", b"")
        )

    with pytest.raises(NotImplementedError, match="bit depth"):
        mm.decode_image(mk(depth=16))
    with pytest.raises(NotImplementedError, match="interlaced"):
        mm.decode_image(mk(interlace=1))
    with pytest.raises(NotImplementedError, match="color type"):
        mm.decode_image(mk(ctype=3))  # palette
    # corrupted CRC is a hard error, never a wrong image
    good = mk()
    bad = good[:20] + bytes([good[20] ^ 0xFF]) + good[21:]
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_image(bad)
    # a chunk cut mid-body is a clean ValueError, not a struct.error
    # (drop IEND and the tail of IDAT so IDAT's declared length overruns)
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_image(good[: len(good) - 20])
    # nonzero IHDR compression/filter method would be silently
    # misdecoded if accepted — reject explicitly
    import struct as _s
    import zlib as _z

    def mk_method(comp=0, filt=0):
        ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, comp, filt, 0)
        def chunk(tag, body):
            return (
                _s.pack(">I", len(body)) + tag + body
                + _s.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
            )
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(b"\x00" * 14))
            + chunk(b"IEND", b"")
        )

    for kw in ({"comp": 1}, {"filt": 1}):
        with pytest.raises(ValueError, match="method"):
            mm.decode_image(mk_method(**kw))


def test_extract_features_e2e_on_png_bytes(spark):
    """The multimodal pipeline end-to-end on REAL PNG bytes: binary
    column → mapInPandas decode (stdlib PNG path) → resize → fixed-dim
    feature vectors; the raw bytes never leave the decode stage."""
    rng = np.random.default_rng(21)
    rows = [
        (
            f"img{i}",
            _encode_png_with_filters(
                rng.integers(0, 256, (6 + i, 8, 3), dtype=np.uint8),
                [(r % 5) for r in range(6 + i)],
            ),
        )
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "element string, blob binary")
    out = mm.extract_features(
        df, "blob", decoder=mm.decode_image, resize=(4, 4)
    ).collect()
    assert all(len(r.features) == 4 * 4 * 3 for r in out)
    assert "blob" not in out[0].asDict()
