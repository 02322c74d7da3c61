"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, batch shapes, partition-aware
mapInPandas UDFs — while the actual media decode is stubbed (image/audio
libs are not in this container): decode_image/decode_audio raise unless
handed the deterministic fake codec, mirroring how klio_audio gates on
librosa (audio/src/klio_audio/transforms/audio.py:26-73).

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


def decode_image(raw: bytes) -> np.ndarray:  # pragma: no cover - stub
    raise NotImplementedError(
        "real image decode needs PIL/cv2 (not in this container); "
        "use fake_image_decode for the plumbing path"
    )


def decode_audio(raw: bytes) -> np.ndarray:  # pragma: no cover - stub
    raise NotImplementedError(
        "real audio decode needs librosa/soundfile (not in this container); "
        "use fake_audio_decode for the plumbing path"
    )


def extract_features(
    df: DataFrame,
    binary_col: str,
    *,
    decoder: Callable[[bytes], np.ndarray] = fake_image_decode,
    feature_dim: int | None = None,
) -> DataFrame:
    """binary column → flat float feature vector, via mapInPandas.

    The batch shape is the contract: each Arrow batch holds ≤
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
            feats = [
                decoder(bytes(b)).ravel().tolist() if b is not None else None
                for b in pdf[binary_col]
            ]
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
