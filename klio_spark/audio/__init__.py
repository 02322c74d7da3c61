"""Audio transforms over envelope DataFrames (reference: klio_audio).

Operator parity (audio/src/klio_audio/transforms/):
  load_binary   ~ GcsLoadBinary (io.py:28-111): path join against a
                  binaryFile scan — bytes enter the plan HERE, as late as
                  possible, and stay out of shuffles
  load_audio    ~ LoadAudio (audio.py:26-73)
  get_stft      ~ GetSTFT (audio.py:76-132) — magnitude+phase split (the
                  complex matrix has no Arrow type; SURVEY §7 known-hard)
  get_spec      ~ GetSpec (audio.py:135-187)
  get_mel_spec  ~ GetMelSpec (audio.py:190-244)
  get_mfcc      ~ GetMFCC (audio.py:247-305)
  render_plot   ~ SpecToPlot/... (audio.py:308-515): PNG bytes via
                  matplotlib when available, else gated (import-try)

DSP kernels are numpy (klio_spark.audio.dsp) — librosa-compatible
parameters, swapped for librosa when installed. 2-D features are stored
as ARRAY<ARRAY<FLOAT>> columns (rows = frequency bins, librosa layout).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from klio_spark.audio import dsp
from klio_spark.config import DataIOConfig
from klio_spark.operators.existence import path_for

try:  # pragma: no cover - not in this container
    import librosa  # noqa: F401

    HAS_LIBROSA = True
except ImportError:
    HAS_LIBROSA = False

MAT = "array<array<float>>"


def load_binary(
    df: DataFrame, cfg: DataIOConfig, spark: SparkSession | None = None
) -> DataFrame:
    """Attach blob bytes by joining the element stream against a
    binaryFile scan of the data-input location (GcsLoadBinary parity).

    One distributed scan of the store instead of per-element downloads;
    bytes appear in the LAST stage before the consuming UDF. The blob
    side is the big one — Spark shuffles it by path only once, and AQE
    picks sort-merge vs broadcast by observed size.
    """
    spark = spark or df.sparkSession
    reader = spark.read.format("binaryFile")
    if cfg.file_suffix:
        reader = reader.option("pathGlobFilter", f"*{cfg.file_suffix}")
    blobs = reader.load(cfg.location).select(
        F.regexp_replace("path", "^file:/*", "/").alias("_path"),
        F.col("content").alias("_blob"),
    )
    keyed = df.withColumn("_path", path_for(cfg))
    joined = keyed.join(blobs, "_path", "left").drop("_path")
    if "payload" in df.columns:
        # the blob becomes the payload channel (replacing any envelope state)
        joined = joined.drop("payload")
    return joined.withColumnRenamed("_blob", "payload")


def _matrix_udf(fn, out_type: str = MAT):
    """Wrap waveform→matrix numpy fn as a mapInPandas stage preserving all
    input columns except the consumed one."""

    def apply(df: DataFrame, in_col: str, out_col: str, **kw) -> DataFrame:
        keep = [f for f in df.schema.fields if f.name != in_col]
        schema_str = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in keep]
            + [f"`{out_col}` {out_type}"]
        )
        keep_names = [f.name for f in keep]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = pdf[keep_names].copy()
                out[out_col] = [
                    fn(row, pdf.iloc[i], **kw) if row is not None else None
                    for i, row in enumerate(pdf[in_col])
                ]
                yield out

        return df.mapInPandas(run, schema=schema_str)

    return apply


def load_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """payload WAV bytes → waveform ARRAY<FLOAT> + sr (LoadAudio parity)."""
    keep = [f for f in df.schema.fields if f.name != payload_col]
    schema_str = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in keep]
        + ["waveform array<float>", "sr int"]
    )
    keep_names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep_names].copy()
            waves, srs = [], []
            for raw in pdf[payload_col]:
                if raw is None:
                    waves.append(None)
                    srs.append(None)
                    continue
                y, sr = dsp.decode_wav(bytes(raw))
                waves.append(y.tolist())
                srs.append(sr)
            out["waveform"] = waves
            out["sr"] = srs
            yield out

    return df.mapInPandas(run, schema=schema_str)


def get_stft(
    df: DataFrame,
    waveform_col: str = "waveform",
    n_fft: int = 2048,
    hop_length: int = 512,
) -> DataFrame:
    """waveform → stft_mag + stft_phase matrices (GetSTFT parity; complex
    split into magnitude/phase because Arrow has no complex type)."""
    keep = [f for f in df.schema.fields]
    schema_str = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in keep]
        + [f"stft_mag {MAT}", f"stft_phase {MAT}"]
    )
    keep_names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep_names].copy()
            mags, phases = [], []
            for wv in pdf[waveform_col]:
                if wv is None:
                    mags.append(None)
                    phases.append(None)
                    continue
                s = dsp.stft(np.asarray(wv, dtype=np.float32), n_fft, hop_length)
                mags.append([r.tolist() for r in np.abs(s).astype(np.float32)])
                phases.append([r.tolist() for r in np.angle(s).astype(np.float32)])
            out["stft_mag"] = mags
            out["stft_phase"] = phases
            yield out

    return df.mapInPandas(run, schema=schema_str)


def get_spec(df: DataFrame, mag_col: str = "stft_mag") -> DataFrame:
    """|STFT| → dB spectrogram ref=max (GetSpec parity)."""
    # Arrow hands nested arrays as object-dtype rows; stack to a 2-D matrix
    fn = lambda mag, _row: [
        r.tolist()
        for r in dsp.amplitude_to_db(
            np.stack([np.asarray(m, dtype=np.float64) for m in mag])
        ).astype(np.float32)
    ]
    return _matrix_udf(fn)(df, mag_col, "spec")


def get_mel_spec(
    df: DataFrame,
    waveform_col: str = "waveform",
    sr_col: str = "sr",
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
) -> DataFrame:
    """waveform → mel power spectrogram (GetMelSpec parity)."""
    fn = lambda wv, row: [
        r.tolist()
        for r in dsp.melspectrogram(
            np.asarray(wv, dtype=np.float32), int(row[sr_col]), n_fft, hop_length, n_mels
        ).astype(np.float32)
    ]
    return _matrix_udf(fn)(df, waveform_col, "mel_spec")


def get_mfcc(
    df: DataFrame,
    waveform_col: str = "waveform",
    sr_col: str = "sr",
    n_mfcc: int = 20,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
) -> DataFrame:
    """waveform → MFCC matrix (GetMFCC parity)."""
    fn = lambda wv, row: [
        r.tolist()
        for r in dsp.mfcc(
            np.asarray(wv, dtype=np.float32),
            int(row[sr_col]),
            n_mfcc,
            n_fft,
            hop_length,
            n_mels,
        ).astype(np.float32)
    ]
    return _matrix_udf(fn)(df, waveform_col, "mfcc")


def render_plot(
    df: DataFrame,
    matrix_col: str,
    out_col: str = "plot_png",
    *,
    cmap: str = "magma",
    dpi: int = 72,
) -> DataFrame:
    """Feature matrix → PNG bytes column (SpecToPlot/MelSpecToPlot/
    MFCCToPlot parity, reference audio.py:308-515).

    Two render paths, both real:
      * matplotlib importable on executors → Agg figure with axes/labels
        (the reference's rendering).
      * otherwise → a pure numpy+zlib encoder (_matrix_to_png): the
        matrix normalizes to 0-1, maps through a magma-like 256-color
        LUT, and encodes as a true RGB PNG, one pixel per cell. No
        external deps, deterministic bytes — plotting works in minimal
        containers instead of gating on the library."""
    keep = [f for f in df.schema.fields]
    schema_str = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in keep]
        + [f"{out_col} binary"]
    )
    keep_names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io

        # probe matplotlib HERE, on the executor: a driver-side check
        # would bake the driver's environment into the closure and fail
        # the task in mixed driver/executor images instead of falling
        # back to the built-in encoder
        try:
            import matplotlib

            matplotlib.use("Agg")  # headless executors
            import matplotlib.pyplot as plt

            have_mpl = True
        except ImportError:
            have_mpl = False

        for pdf in batches:
            out = pdf[keep_names].copy()
            pngs = []
            for mat in pdf[matrix_col]:
                if mat is None:
                    pngs.append(None)
                    continue
                m = np.stack([np.asarray(r, dtype=np.float64) for r in mat])
                if not have_mpl:
                    pngs.append(_matrix_to_png(m, cmap=cmap))
                    continue
                fig, ax = plt.subplots(figsize=(6, 4), dpi=dpi)
                ax.imshow(m, aspect="auto", origin="lower", cmap=cmap)
                ax.set_xlabel("frames")
                ax.set_ylabel("bins")
                buf = _io.BytesIO()
                fig.savefig(buf, format="png", bbox_inches="tight")
                plt.close(fig)
                pngs.append(buf.getvalue())
            out[out_col] = pngs
            yield out

    return df.mapInPandas(run, schema=schema_str)


def _magma_lut() -> np.ndarray:
    """256×3 uint8 approximation of the magma colormap: piecewise-linear
    through its anchor colors — close enough for spectrogram inspection,
    zero dependencies."""
    anchors = np.array(
        [
            (0.000, (0, 0, 4)),
            (0.250, (81, 18, 124)),
            (0.500, (183, 55, 121)),
            (0.750, (251, 136, 97)),
            (1.000, (252, 253, 191)),
        ],
        dtype=object,
    )
    xs = np.array([a[0] for a in anchors], dtype=np.float64)
    cs = np.array([a[1] for a in anchors], dtype=np.float64)  # (5, 3)
    t = np.linspace(0.0, 1.0, 256)
    lut = np.stack(
        [np.interp(t, xs, cs[:, ch]) for ch in range(3)], axis=1
    )
    return np.clip(np.round(lut), 0, 255).astype(np.uint8)


def _matrix_to_png(m: np.ndarray, *, cmap: str = "magma") -> bytes:
    """Feature matrix → RGB PNG bytes with no imaging library: normalize,
    color through the LUT (origin='lower' row order like imshow), encode
    scanlines with zlib per the PNG spec (filter 0). `cmap` accepts
    'gray' for a luminance ramp; anything else uses the magma LUT."""
    import struct
    import zlib

    lo, hi = float(np.min(m)), float(np.max(m))
    norm = (m - lo) / (hi - lo) if hi > lo else np.zeros_like(m)
    idx = np.clip((norm * 255).astype(np.int64), 0, 255)
    if cmap == "gray":
        lut = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    else:
        lut = _magma_lut()
    rgb = lut[idx][::-1]  # (rows, cols, 3); flip → origin lower
    h, w = rgb.shape[:2]
    raw = b"".join(b"\x00" + rgb[r].tobytes() for r in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def upload_plots(
    df: DataFrame,
    location: str,
    png_col: str = "plot_png",
    element_col: str = "element",
) -> None:
    """Write rendered PNGs as `{location}/{element}.png` (GcsUploadPlot
    parity, reference audio.py:470-515) — executor-side writes, one file
    per element, driver never sees the bytes."""
    import os

    os.makedirs(location, exist_ok=True)

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = 0
            for el, png in zip(pdf[element_col], pdf[png_col]):
                if png is None:
                    continue
                with open(os.path.join(location, f"{el}.png"), "wb") as f:
                    f.write(bytes(png))
                n += 1
            yield pd.DataFrame({"n": [n]})

    df.select(element_col, png_col).mapInPandas(
        write_part, schema="n long"
    ).write.mode("overwrite").format("noop").save()
