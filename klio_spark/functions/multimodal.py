"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, batch shapes, partition-aware
mapInPandas UDFs — and decode is real for formats that need no codec
library: binary netpbm images (PGM/PPM, pure numpy) and WAV audio
(stdlib). Compressed formats (PNG/JPEG, mp3/ogg) gate on PIL/librosa
with an honest NotImplementedError, mirroring how klio_audio gates on
librosa (audio/src/klio_audio/transforms/audio.py:26-73);
fake_image_decode/fake_audio_decode remain for plumbing tests.

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


def decode_image(raw: bytes) -> np.ndarray:
    """Real decode for formats needing no codec library (binary PGM/PPM);
    PNG/JPEG and friends still gate on PIL/cv2 with an honest error —
    mirroring how klio_audio gates on librosa. Returns float32 in [0,1],
    (H,W) gray or (H,W,3) RGB."""
    if raw[:2] in (b"P5", b"P6"):
        return _decode_pnm(raw)
    try:  # pragma: no cover - exercised only when PIL exists
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(raw)), dtype=np.float32) / 255.0
    except ImportError:
        pass
    raise NotImplementedError(
        "only netpbm (PGM/PPM) decodes without a codec library; PNG/JPEG "
        "need PIL/cv2 — use fake_image_decode for plumbing tests"
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
