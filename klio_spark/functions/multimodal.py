"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, batch shapes, partition-aware
mapInPandas UDFs — and decode is real for formats that need no codec
library: binary netpbm images (PGM/PPM, pure numpy), 8-bit
non-interlaced PNG (stdlib zlib inflate + per-spec un-filtering — the
inverse of klio_spark.audio's numpy+zlib encoder), BASELINE JPEG
(SOF0/SOF1: canonical Huffman entropy decode, dequant, float IDCT,
chroma upsampling, YCbCr→RGB — pure stdlib+numpy), and WAV audio
(stdlib). Remaining compressed formats (progressive JPEG, mp3/ogg)
gate on PIL/librosa with an honest NotImplementedError, mirroring how
klio_audio gates on librosa (audio/src/klio_audio/transforms/
audio.py:26-73); fake_image_decode/fake_audio_decode remain for
plumbing tests.

Design rule (SURVEY §7 rule 2): heavy bytes stay OUT of shuffles. The
canonical flow is: envelope rows carry paths → repartition by element →
fetch+decode inside ONE mapInPandas stage → emit features (small arrays),
never re-shuffled raw media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed metadata accompanying an opaque media column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def attach_media_meta(df: DataFrame, binary_col: str, mime: str) -> DataFrame:
    """Cheap metadata that needs no decode (size, mime)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(F.col(binary_col)).cast("long").alias("size_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def fake_image_decode(raw: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: bytes → fake 8x8
    grayscale derived from a digest. Replace with PIL/cv2 in prod."""
    dig = hashlib.sha256(raw).digest()
    arr = np.frombuffer((dig * 2)[:64], dtype=np.uint8).reshape(8, 8)
    return arr.astype(np.float32) / 255.0


def fake_audio_decode(raw: bytes, sr: int = 16000) -> np.ndarray:
    """Deterministic PCM stand-in: 1 s sine whose frequency derives from a
    digest of the bytes."""
    f0 = 110.0 + (int.from_bytes(hashlib.sha256(raw).digest()[:2], "big") % 880)
    t = np.arange(sr, dtype=np.float32) / sr
    return np.sin(2 * np.pi * f0 * t).astype(np.float32)


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 image (H,W) gray or (H,W,3) RGB → binary PPM/PGM bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        header = f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode()
    elif img.ndim == 3 and img.shape[2] == 3:
        header = f"P6\n{img.shape[1]} {img.shape[0]}\n255\n".encode()
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {img.shape}")
    return header + img.tobytes()


def _decode_pnm(raw: bytes) -> np.ndarray:
    """Binary PGM (P5, grayscale) / PPM (P6, RGB) decode, pure numpy —
    netpbm is a public spec and needs no codec library."""
    fields: list[bytes] = []
    i = 2  # past magic
    while len(fields) < 3:
        while i < len(raw) and raw[i : i + 1].isspace():
            i += 1
        if raw[i : i + 1] == b"#":  # comment to EOL
            while i < len(raw) and raw[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < len(raw) and not raw[i : i + 1].isspace():
            i += 1
        fields.append(raw[start:i])
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    channels = 3 if raw[:2] == b"P6" else 1
    data = np.frombuffer(raw, dtype=np.uint8, count=w * h * channels, offset=i)
    img = data.reshape((h, w, 3) if channels == 3 else (h, w))
    return img.astype(np.float32) / float(maxval)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(raw: bytes) -> np.ndarray:
    """Pure stdlib+numpy PNG decoder — the exact inverse of the repo's
    numpy+zlib encoder (klio_spark.audio._matrix_to_png): parse chunks
    (CRC-checked), inflate the IDAT stream, un-filter scanlines per the
    PNG spec, reshape. Supports the mainstream still-image subset:
    8-bit non-interlaced grayscale (color type 0), RGB (2), gray+alpha
    (4) and RGBA (6) — alpha is returned as-is in the last channel;
    palette (3), 16-bit, sub-byte depths, and Adam7 interlace raise.
    All five scanline filters decode (the encoder emits only filter 0,
    but foreign PNGs routinely use Sub/Up/Average/Paeth): Up/None are
    vectorized; Sub/Average/Paeth walk the row because each byte needs
    the RECONSTRUCTED left neighbor. Returns float32 in [0,1], (H,W)
    for grayscale or (H,W,C) otherwise."""
    import struct
    import zlib

    if raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        tag = raw[pos + 4 : pos + 8]
        if pos + 12 + length > len(raw):
            raise ValueError(
                f"PNG chunk {tag!r} declares {length} bytes but the "
                "stream is truncated"
            )
        body = raw[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", raw[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        # the spec defines only method 0 for both; anything else would
        # be silently misdecoded if we carried on
        raise ValueError(
            f"PNG compression/filter method {comp}/{filt} (only 0/0)"
        )
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"PNG color type {ctype}")
    stride = w * channels
    data = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(data) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    data = data.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for r in range(h):
        ft, line = int(data[r, 0]), data[r, 1:].astype(np.int64)
        prior = out[r - 1].astype(np.int64) if r else np.zeros(stride, np.int64)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prior) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: left-sequential
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                if ft == 1:
                    rec[i] = (line[i] + a) & 0xFF
                elif ft == 3:
                    rec[i] = (line[i] + ((a + prior[i]) >> 1)) & 0xFF
                else:
                    b = prior[i]
                    c = prior[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                    rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ft}")
        out[r] = rec.astype(np.uint8)
    img = out.reshape((h, w) if channels == 1 else (h, w, channels))
    return img.astype(np.float32) / 255.0


# ---------------------------------------------------------------- JPEG
# Baseline sequential JPEG (SOF0/SOF1), pure stdlib+numpy — the same
# dependency-free philosophy as _decode_png. Progressive (SOF2),
# arithmetic coding, 12-bit precision, and hierarchical modes raise
# NotImplementedError and fall through to PIL when installed.

# zigzag index k -> natural (row-major) flat index in the 8x8 block
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _jpeg_idct_basis() -> np.ndarray:
    """A[u, x] = c(u)/2 * cos((2x+1) u pi / 16): spatial = A.T @ F @ A."""
    x = np.arange(8, dtype=np.float64)
    u = np.arange(8, dtype=np.float64)
    a = np.cos((2.0 * x[None, :] + 1.0) * u[:, None] * np.pi / 16.0) / 2.0
    a[0, :] *= 1.0 / np.sqrt(2.0)
    return a


def _jpeg_huff_table(counts, symbols) -> dict:
    """Canonical Huffman per JPEG C.2: {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00,
    stops (hard error) on a real marker mid-symbol, and consumes RSTn
    markers at restart boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.d, self.pos, self.cur, self.nleft = data, pos, 0, 0

    def bit(self) -> int:
        if self.nleft == 0:
            if self.pos >= len(self.d):
                raise ValueError("JPEG entropy stream truncated")
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos] if self.pos < len(self.d) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    self.pos -= 1
                    raise ValueError("JPEG hit a marker inside a symbol")
            self.cur, self.nleft = b, 8
        self.nleft -= 1
        return (self.cur >> self.nleft) & 1

    def restart(self) -> None:
        self.nleft = 0  # byte-align
        if (
            self.pos + 1 >= len(self.d)
            or self.d[self.pos] != 0xFF
            or not (0xD0 <= self.d[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("JPEG expected RSTn at restart interval")
        self.pos += 2


def _jpeg_decode_symbol(br: _JpegBits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_receive_extend(br: _JpegBits, t: int) -> int:
    if t == 0:
        return 0
    v = 0
    for _ in range(t):
        v = (v << 1) | br.bit()
    if v < (1 << (t - 1)):
        v -= (1 << t) - 1
    return v


def _jpeg_decode_block(br, dc_tab, ac_tab, pred):
    coef = np.zeros(64, dtype=np.int64)
    t = _jpeg_decode_symbol(br, dc_tab)
    pred += _jpeg_receive_extend(br, t)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _jpeg_decode_symbol(br, ac_tab)
        r, size = rs >> 4, rs & 15
        if size == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient index overflow")
        coef[k] = _jpeg_receive_extend(br, size)
        k += 1
    return coef, pred


def _decode_jpeg(raw: bytes) -> np.ndarray:
    """Pure stdlib+numpy BASELINE JPEG decoder: marker parse (DQT/SOF0/
    SOF1/DHT/DRI/SOS, APPn/COM skipped), canonical Huffman entropy
    decode with 0xFF00 un-stuffing and RSTn restart handling, dequant +
    de-zigzag, exact float IDCT (8x8 basis matmul), nearest-neighbor
    chroma upsampling for subsampled scans, JFIF YCbCr->RGB. Returns
    float32 in [0,1], (H,W) gray or (H,W,3) color. Progressive (SOF2+)
    and non-8-bit precision raise NotImplementedError (PIL decodes
    them when installed — decode_image falls through)."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, dict] = {}
    hac: dict[int, dict] = {}
    restart = 0
    frame = None
    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        m = raw[pos + 1]
        if m == 0xD8:
            pos += 2
            continue
        if m == 0xD9:
            break
        if pos + 4 > len(raw):
            raise ValueError("truncated JPEG segment header")
        ln = int.from_bytes(raw[pos + 2 : pos + 4], "big")
        if ln < 2 or pos + 2 + ln > len(raw):
            raise ValueError("truncated JPEG segment")
        seg = raw[pos + 4 : pos + 2 + ln]
        if m == 0xDB:  # DQT (one or more tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(
                        seg[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                else:
                    qt[tq] = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
        elif m in (0xC0, 0xC1):  # baseline / extended sequential
            if seg[0] != 8:
                raise NotImplementedError(
                    f"JPEG sample precision {seg[0]} (only 8)"
                )
            fh = int.from_bytes(seg[1:3], "big")
            fw = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                comps.append(
                    {
                        "id": seg[6 + 3 * c],
                        "h": seg[7 + 3 * c] >> 4,
                        "v": seg[7 + 3 * c] & 15,
                        "tq": seg[8 + 3 * c],
                    }
                )
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG with {nc} components")
            frame = (fh, fw, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-baseline JPEG (progressive/arithmetic/lossless)"
            )
        elif m == 0xC4:  # DHT (one or more tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                i += 1
                counts = list(seg[i : i + 16])
                i += 16
                n = sum(counts)
                symbols = list(seg[i : i + n])
                i += n
                tab = _jpeg_huff_table(counts, symbols)
                (hdc if tc == 0 else hac)[th] = tab
        elif m == 0xDD:  # DRI
            restart = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:  # SOS — baseline: single scan, decode and return
            ns = seg[0]
            scomp = {}
            for c in range(ns):
                scomp[seg[1 + 2 * c]] = (seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
            return _jpeg_decode_scan(
                raw, pos + 2 + ln, frame, scomp, qt, hdc, hac, restart
            )
        pos += 2 + ln
    raise ValueError("JPEG missing SOS scan")


def _jpeg_decode_scan(raw, pos, frame, scomp, qt, hdc, hac, restart):
    if frame is None:
        raise ValueError("JPEG SOS before SOF")
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    a = _jpeg_idct_basis()
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    ]
    br = _JpegBits(raw, pos)
    preds = [0] * len(comps)
    f8 = np.zeros(64, dtype=np.float64)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                br.restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = hdc[scomp[c["id"]][0]]
                ac_tab = hac[scomp[c["id"]][1]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef, preds[ci] = _jpeg_decode_block(
                            br, dc_tab, ac_tab, preds[ci]
                        )
                        f8[:] = 0.0
                        f8[_JPEG_ZIGZAG] = (coef * q).astype(np.float64)
                        blk = f8.reshape(8, 8)
                        spatial = a.T @ blk @ a + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            n_mcu += 1
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:fh, :fw])
    if len(out) == 1:
        return (np.clip(out[0], 0.0, 255.0) / 255.0).astype(np.float32)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return (np.clip(rgb, 0.0, 255.0) / 255.0).astype(np.float32)


def decode_image(raw: bytes) -> np.ndarray:
    """Real decode for formats needing no codec library: binary PGM/PPM
    (pure numpy), PNG (stdlib zlib inflate + un-filter — the inverse
    of the repo's own encoder; 8-bit non-interlaced gray/RGB/alpha
    variants), and BASELINE JPEG (SOF0/SOF1 — marker parse, canonical
    Huffman, dequant, float IDCT, chroma upsampling, YCbCr→RGB).
    Out-of-subset variants (palette/16-bit/interlaced PNG, progressive
    JPEG) fall through to PIL when installed, else raise honestly —
    mirroring how klio_audio gates on librosa. Returns float32 in
    [0,1], (H,W) gray or (H,W,C) otherwise."""
    if raw[:2] in (b"P5", b"P6"):
        return _decode_pnm(raw)
    builtin_gap = None
    if raw[:8] == _PNG_SIG:
        try:
            return _decode_png(raw)
        except NotImplementedError as exc:
            # palette / 16-bit / interlaced: outside the builtin subset,
            # but PIL (when installed) decodes them — fall through and
            # only re-raise if the import path is also unavailable
            builtin_gap = exc
    if raw[:2] == b"\xff\xd8":
        try:
            return _decode_jpeg(raw)
        except NotImplementedError as exc:
            # progressive / 12-bit / arithmetic: PIL's territory
            builtin_gap = exc
    try:  # pragma: no cover - exercised only when PIL exists
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(raw)), dtype=np.float32) / 255.0
    except ImportError:
        pass
    if builtin_gap is not None:
        raise NotImplementedError(
            f"image variant outside the builtin decoders ({builtin_gap}) "
            "and PIL is not installed — use fake_image_decode for "
            "plumbing tests"
        ) from builtin_gap
    raise NotImplementedError(
        "only netpbm (PGM/PPM), 8-bit non-interlaced PNG, and baseline "
        "JPEG decode without a codec library; other formats need "
        "PIL/cv2 — use fake_image_decode for plumbing tests"
    )


def decode_audio(raw: bytes) -> np.ndarray:
    """Real decode for WAV (stdlib, via klio_spark.audio.dsp); compressed
    formats gate on librosa/soundfile. Returns float32 PCM in [-1,1]."""
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        from klio_spark.audio.dsp import decode_wav

        y, _sr = decode_wav(raw)
        return np.asarray(y, dtype=np.float32)
    raise NotImplementedError(
        "only WAV decodes without a codec library; mp3/ogg/flac need "
        "librosa/soundfile — use fake_audio_decode for plumbing tests"
    )


def resize_nearest(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (H, W), pure numpy — the standard
    thumbnail/normalization step before feature extraction."""
    h, w = size
    src_h, src_w = img.shape[:2]
    rows = (np.arange(h) * (src_h / h)).astype(np.int64).clip(0, src_h - 1)
    cols = (np.arange(w) * (src_w / w)).astype(np.int64).clip(0, src_w - 1)
    return img[rows][:, cols]


def extract_features(
    df: DataFrame,
    binary_col: str,
    *,
    decoder: Callable[[bytes], np.ndarray] = fake_image_decode,
    resize: tuple[int, int] | None = None,
    feature_dim: int | None = None,
) -> DataFrame:
    """binary column → flat float feature vector, via mapInPandas.

    ``resize=(H, W)`` applies nearest-neighbor normalization after decode
    (fixed feature_dim regardless of source resolution). The batch shape
    is the contract: each Arrow batch holds ≤
    spark.sql.execution.arrow.maxRecordsPerBatch rows; with multi-MB media
    keep that small (session.py sets 4096 default — override per job).
    Output keeps ALL input columns except the binary payload (dropped so
    downstream shuffles never carry raw media) plus `features`.
    """
    out_fields = [f for f in df.schema.fields if f.name != binary_col]
    schema = T.StructType(
        out_fields + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )
    keep = [f.name for f in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[binary_col]:
                if b is None:
                    feats.append(None)
                    continue
                arr = decoder(bytes(b))
                if resize is not None:
                    arr = resize_nearest(arr, resize)
                feats.append(arr.ravel().tolist())
            out = pdf[keep].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(run, schema=schema)


def frame_sample(
    df: DataFrame,
    binary_col: str,
    *,
    every_n: int = 10,
    decoder: Callable[[bytes], np.ndarray] = fake_image_decode,
) -> DataFrame:
    """Video-style frame sampling plumbing: one input row → N frame rows.

    With a real codec `decoder` would yield frames; the fake emits 3
    deterministic pseudo-frames. Output: input minus binary + (frame_idx,
    frame) — a flatMap-shaped mapInPandas.
    """
    out_fields = [f for f in df.schema.fields if f.name != binary_col]
    schema = T.StructType(
        out_fields
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.ArrayType(T.FloatType())),
        ]
    )
    keep = [f.name for f in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                raw = row[binary_col]
                if raw is None:
                    continue
                base = decoder(bytes(raw)).ravel()
                for i in range(3):  # fake: 3 frames per asset
                    rec = {k: row[k] for k in keep}
                    rec["frame_idx"] = i * every_n
                    rec["frame"] = np.roll(base, i).tolist()
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=keep + ["frame_idx", "frame"])

    return df.mapInPandas(run, schema=schema)
