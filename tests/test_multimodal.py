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
    # a CORRUPT JPEG is a hard error from the real baseline decoder
    # (round 9), never a silent fake decode
    with pytest.raises(ValueError):
        mm.decode_image(b"\xff\xd8\xff\xe0fake-jpeg")
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


# ---------------------------------------------------------------- JPEG
# Coefficient-level baseline JPEG packer (test reference encoder): the
# tests hand it QUANTIZED ZIGZAG coefficients per block, so expected
# pixels are computable independently (flat blocks and single-AC
# cosine ramps have closed forms) — exercising the decoder's Huffman,
# zigzag, dequant, IDCT, MCU layout, subsampling, and restart paths.


class _JpegBW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.buf.append(b)
                if b == 0xFF:
                    self.buf.append(0)  # stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec


def _jsize(v):
    t, a = 0, abs(int(v))
    while a:
        t += 1
        a >>= 1
    return t


def _jpeg_block_symbols(coef, pred):
    """-> (dc_sym, dc_bits, [(ac_sym, ac_bits)...], new_pred)."""
    diff = int(coef[0]) - pred
    t = _jsize(diff)
    dc_bits = (diff if diff >= 0 else diff + (1 << t) - 1, t)
    acs = []
    run = 0
    for k in range(1, 64):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))  # ZRL
            run -= 16
        s = _jsize(v)
        acs.append(((run << 4) | s, (v if v >= 0 else v + (1 << s) - 1, s)))
        run = 0
    if run:
        acs.append((0x00, (0, 0)))  # EOB
    return t, dc_bits, acs, int(coef[0])


def _mk_canonical(symbols):
    syms = sorted(set(symbols))
    L = 1
    while (1 << L) < len(syms) + 1:
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    codes = {s: (i, L) for i, s in enumerate(syms)}
    return counts, syms, codes


def _pack_jpeg(w, h, comps, qtables, restart=0):
    """comps: [{id, h, v, tq, blocks}] where blocks[row][col] is a
    64-int QUANTIZED ZIGZAG coefficient list covering the component
    plane in block raster order (mcuy*v rows, mcux*h cols).
    qtables: {tq: 64 ints, zigzag order}."""
    import struct

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # pass 1: collect symbols in MCU order
    def walk(emit_dc, emit_ac, emit_restart):
        preds = [0] * len(comps)
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and n_mcu and n_mcu % restart == 0:
                    emit_restart(n_mcu // restart - 1)
                    preds = [0] * len(comps)
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = c["blocks"][my * c["v"] + by][
                                mx * c["h"] + bx
                            ]
                            t, dcb, acs, preds[ci] = _jpeg_block_symbols(
                                coef, preds[ci]
                            )
                            emit_dc(t, dcb)
                            for sym, bits in acs:
                                emit_ac(sym, bits)
                n_mcu += 1

    dc_syms, ac_syms = [], []
    walk(
        lambda t, b: dc_syms.append(t),
        lambda s, b: ac_syms.append(s),
        lambda i: None,
    )
    dc_counts, dc_list, dc_codes = _mk_canonical(dc_syms)
    ac_counts, ac_list, ac_codes = _mk_canonical(ac_syms)

    bw = _JpegBW()

    def emit_dc(t, bits):
        code, L = dc_codes[t]
        bw.put(code, L)
        if bits[1]:
            bw.put(bits[0], bits[1])

    def emit_ac(sym, bits):
        code, L = ac_codes[sym]
        bw.put(code, L)
        if bits[1]:
            bw.put(bits[0], bits[1])

    def emit_restart(i):
        bw.flush()
        bw.buf += bytes([0xFF, 0xD0 + (i % 8)])

    walk(emit_dc, emit_ac, emit_restart)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq, q in sorted(qtables.items()):
        out += seg(0xDB, bytes([tq]) + bytes(int(x) for x in q))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00] + dc_counts) + bytes(dc_list))
    out += seg(0xC4, bytes([0x10] + ac_counts) + bytes(ac_list))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def _flat_block(dc):
    return [int(dc)] + [0] * 63


def test_jpeg_flat_gray_exact():
    """A flat block has a closed form the test computes independently:
    pixel = DC*q/8 + 128 (only the DC basis term is nonzero). Four
    blocks with DC-diff coding across them; quant table of ones."""
    q = {0: [1] * 64}
    dc = 8 * (200 - 128)  # -> exactly 200
    blocks = [[_flat_block(dc), _flat_block(dc)],
              [_flat_block(dc), _flat_block(dc)]]
    raw = _pack_jpeg(
        16, 16,
        [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}],
        q,
    )
    img = mm.decode_image(raw)
    assert img.shape == (16, 16)
    np.testing.assert_allclose(img, 200.0 / 255.0, atol=1e-6)


def test_jpeg_single_ac_cosine_ramp():
    """One AC coefficient (zigzag k=1 -> F[0,1]) decodes to a cosine
    ramp with an independent closed form: spatial[x,y] =
    v * (1/(2*sqrt(2))) * cos((2y+1)pi/16)/2 + 128."""
    v = 100
    coef = [0] * 64
    coef[1] = v
    raw = _pack_jpeg(
        8, 8, [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": [[coef]]}],
        {0: [1] * 64},
    )
    img = mm.decode_image(raw) * 255.0
    y = np.arange(8)
    want = (
        v / (2.0 * np.sqrt(2.0)) * np.cos((2 * y + 1) * np.pi / 16.0) / 2.0
        + 128.0
    )
    np.testing.assert_allclose(img, np.tile(want, (8, 1)), atol=1e-3)


def test_jpeg_random_coeffs_match_reference_idct():
    """Random quantized coefficients through the full pipeline equal a
    test-side IDCT built from its own basis (exercises Huffman ACs,
    runs/ZRL/EOB, dequant with a non-trivial table, multi-block DC
    chaining)."""
    rng = np.random.default_rng(9)
    qtab = rng.integers(1, 5, 64).tolist()
    rows, cols = 2, 3  # 24x16
    blocks = [
        [rng.integers(-20, 21, 64).tolist() for _ in range(cols)]
        for _ in range(rows)
    ]
    raw = _pack_jpeg(
        24, 16,
        [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}],
        {0: qtab},
    )
    img = mm.decode_image(raw) * 255.0

    # independent reference IDCT
    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0) / 2.0
    a[0, :] *= 1.0 / np.sqrt(2.0)
    zz = mm._JPEG_ZIGZAG
    want = np.zeros((16, 24))
    for r in range(rows):
        for c in range(cols):
            f = np.zeros(64)
            f[zz] = np.array(blocks[r][c], dtype=np.float64) * np.array(
                qtab, dtype=np.float64
            )
            want[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = (
                a.T @ f.reshape(8, 8) @ a + 128.0
            )
    np.testing.assert_allclose(img, np.clip(want, 0, 255), atol=1e-3)


def test_jpeg_color_444_and_420_flat():
    """Solid-color JPEGs decode exactly under both 4:4:4 and 4:2:0
    (the 2x2-subsampled chroma of a flat image is lossless), checking
    MCU interleave, per-component planes, upsampling, and YCbCr->RGB
    against the JFIF closed form computed here."""
    yv, cbv, crv = 120, 90, 160
    exp_r = yv + 1.402 * (crv - 128.0)
    exp_g = yv - 0.344136 * (cbv - 128.0) - 0.714136 * (crv - 128.0)
    exp_b = yv + 1.772 * (cbv - 128.0)
    want = np.clip(np.array([exp_r, exp_g, exp_b]), 0, 255)

    def flat(v, rows, cols):
        return [[_flat_block(8 * (v - 128)) for _ in range(cols)]
                for _ in range(rows)]

    # 4:4:4, 8x8
    raw = _pack_jpeg(
        8, 8,
        [
            {"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": flat(yv, 1, 1)},
            {"id": 2, "h": 1, "v": 1, "tq": 0, "blocks": flat(cbv, 1, 1)},
            {"id": 3, "h": 1, "v": 1, "tq": 0, "blocks": flat(crv, 1, 1)},
        ],
        {0: [1] * 64},
    )
    img = mm.decode_image(raw) * 255.0
    assert img.shape == (8, 8, 3)
    np.testing.assert_allclose(img, np.tile(want, (8, 8, 1)), atol=1e-3)

    # 4:2:0, 16x16: Y is 2x2 blocks per MCU, chroma 1
    raw = _pack_jpeg(
        16, 16,
        [
            {"id": 1, "h": 2, "v": 2, "tq": 0, "blocks": flat(yv, 2, 2)},
            {"id": 2, "h": 1, "v": 1, "tq": 0, "blocks": flat(cbv, 1, 1)},
            {"id": 3, "h": 1, "v": 1, "tq": 0, "blocks": flat(crv, 1, 1)},
        ],
        {0: [1] * 64},
    )
    img = mm.decode_image(raw) * 255.0
    assert img.shape == (16, 16, 3)
    np.testing.assert_allclose(img, np.tile(want, (16, 16, 1)), atol=1e-3)


def test_jpeg_restart_markers():
    """DRI=2 inserts RSTn every two MCUs; the decoder must byte-align,
    consume the marker, and reset DC predictors exactly where the
    encoder did."""
    vals = [64, 128, 192, 255]
    blocks = [[_flat_block(8 * (v - 128)) for v in vals]]
    raw = _pack_jpeg(
        32, 8,
        [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}],
        {0: [1] * 64},
        restart=2,
    )
    assert any(
        raw[i] == 0xFF and 0xD0 <= raw[i + 1] <= 0xD7
        for i in range(len(raw) - 1)
    ), "encoder emitted no RSTn — the test would prove nothing"
    img = mm.decode_image(raw) * 255.0
    for i, v in enumerate(vals):
        np.testing.assert_allclose(
            img[:, i * 8 : i * 8 + 8], float(v), atol=1e-3
        )


def test_jpeg_rejects_progressive_and_truncation():
    blocks = [[_flat_block(0)]]
    raw = _pack_jpeg(
        8, 8, [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}],
        {0: [1] * 64},
    )
    # flip SOF0 -> SOF2 (progressive): honest gate, PIL's territory
    prog = raw.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        mm.decode_image(prog)
    # truncated entropy stream is a clean ValueError
    with pytest.raises(ValueError):
        mm._decode_jpeg(raw[: len(raw) - 4])
    # bad SOI
    with pytest.raises(ValueError, match="SOI"):
        mm._decode_jpeg(b"\x00\x01\x02")


def test_extract_features_e2e_on_jpeg_bytes(spark):
    """The multimodal pipeline end-to-end on REAL JPEG bytes: binary
    column → mapInPandas decode (builtin baseline-JPEG path) → resize →
    fixed-dim features. Assets mix grayscale and 4:2:0 color; the raw
    bytes never leave the decode stage."""
    rng = np.random.default_rng(33)

    def gray_jpeg(rows_b, cols_b):
        blocks = [
            [rng.integers(-12, 13, 64).tolist() for _ in range(cols_b)]
            for _ in range(rows_b)
        ]
        return _pack_jpeg(
            cols_b * 8, rows_b * 8,
            [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}],
            {0: [2] * 64},
        )

    def color_jpeg():
        flat = lambda v, r, c: [  # noqa: E731
            [_flat_block(8 * (v - 128)) for _ in range(c)] for _ in range(r)
        ]
        return _pack_jpeg(
            16, 16,
            [
                {"id": 1, "h": 2, "v": 2, "tq": 0, "blocks": flat(150, 2, 2)},
                {"id": 2, "h": 1, "v": 1, "tq": 0, "blocks": flat(100, 1, 1)},
                {"id": 3, "h": 1, "v": 1, "tq": 0, "blocks": flat(140, 1, 1)},
            ],
            {0: [1] * 64},
        )

    rows = [
        ("g1", gray_jpeg(1, 2)),
        ("g2", gray_jpeg(2, 1)),
        ("c1", color_jpeg()),
    ]
    df = spark.createDataFrame(rows, "element string, blob binary")
    out = mm.extract_features(
        df, "blob", decoder=mm.decode_image, resize=(4, 4)
    ).collect()
    got = {r.element: len(r.features) for r in out}
    assert got == {"g1": 16, "g2": 16, "c1": 48}  # gray 4x4, color 4x4x3
    assert "blob" not in out[0].asDict()
