"""Audio feature job: track ids in, mel/MFCC features out.

Mirrors the reference's integration/audio-spectrograms pipeline (run.py:
46-120) minus the matplotlib plots: existence-checked ids → load bytes →
decode → mel spectrogram + MFCC → features parquet next to the event
output. The prologue (cli `job run`) already dropped ids whose .wav is
missing and pass-through'd ping messages.
"""

from pyspark.sql import functions as F

from klio_spark.audio import get_mel_spec, get_mfcc, load_audio, load_binary


def run(df, config):
    cfg = config.data_inputs[0]
    audio = load_audio(load_binary(df, cfg))
    # each feature op consumes the waveform column (bytes stay out of
    # shuffles); combining features is a join on element — the reference's
    # CoGroupByKey dance (integration/audio-spectrograms/run.py:76-91)
    mel = get_mel_spec(audio, n_fft=512, hop_length=256, n_mels=32)
    mf = get_mfcc(audio, n_mfcc=8, n_fft=512, hop_length=256, n_mels=32)
    feats = mel.select("element", "sr", "mel_spec").join(
        mf.select("element", "mfcc"), "element"
    )
    out_dir = config.event_outputs[0].location + "_features"
    feats.write.mode("overwrite").parquet(out_dir)
    return df
