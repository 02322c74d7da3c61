"""Property-based tests (hypothesis) for the pure numpy/python kernels —
no SparkSession needed, so these run wide input ranges cheaply."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from klio_spark.audio import dsp
from klio_spark.functions.similarity import _hyperplanes, _kmeans_centroids
from klio_spark.functions.dedup import _minhash_params
from klio_spark.udf import _with_retry


@given(
    freqs=st.lists(st.floats(50, 3000), min_size=1, max_size=4),
    dur=st.floats(0.05, 0.4),
    sr=st.sampled_from([8000, 16000, 22050]),
)
@settings(max_examples=25, deadline=None)
def test_wav_roundtrip_properties(freqs, dur, sr):
    raw = dsp.synth_wav(freqs, dur, sr)
    y, sr2 = dsp.decode_wav(raw)
    assert sr2 == sr
    assert len(y) == int(dur * sr)
    assert np.abs(y).max() <= 1.0


@given(n=st.integers(4, 128))
@settings(max_examples=20, deadline=None)
def test_dct_orthonormality(n):
    d = dsp.dct_ortho(n, n)
    np.testing.assert_allclose(d @ d.T, np.eye(n), atol=1e-9)


@given(
    sr=st.sampled_from([8000, 22050, 44100]),
    n_fft=st.sampled_from([256, 512, 1024]),
    n_mels=st.integers(10, 64),
)
@settings(max_examples=20, deadline=None)
def test_mel_filterbank_properties(sr, n_fft, n_mels):
    fb = dsp.mel_filterbank(sr, n_fft, n_mels)
    assert fb.shape == (n_mels, 1 + n_fft // 2)
    assert (fb >= 0).all() and np.isfinite(fb).all()
    # a filter can only be empty when its triangle is narrower than one
    # FFT bin (true of librosa too — it warns "Empty filters detected");
    # any filter wider than 2 bins must have support
    mel_pts = dsp.mel_to_hz(
        np.linspace(dsp.hz_to_mel(0.0), dsp.hz_to_mel(sr / 2.0), n_mels + 2)
    )
    bin_hz = sr / n_fft
    wide = (mel_pts[2:] - mel_pts[:-2]) > 2 * bin_hz
    assert (fb.sum(axis=1)[wide] > 0).all()


@given(f=st.floats(1.0, 20000.0))
@settings(max_examples=50, deadline=None)
def test_mel_scale_inverts(f):
    back = dsp.mel_to_hz(dsp.hz_to_mel(np.array([f])))[0]
    assert abs(back - f) < max(1e-6 * f, 1e-6)


@given(n=st.integers(1, 256))
@settings(max_examples=20, deadline=None)
def test_minhash_params_are_odd_multipliers(n):
    a, b = _minhash_params(n)
    assert len(a) == len(b) == n
    assert (a % 2 == 1).all()  # odd -> bijective mod 2^64
    a2, _ = _minhash_params(n)
    assert (a == a2).all()  # deterministic


@given(
    rows=st.integers(10, 200),
    dim=st.integers(2, 32),
    k=st.integers(2, 8),
)
@settings(max_examples=15, deadline=None)
def test_kmeans_centroids_unit_norm(rows, dim, k):
    rng = np.random.default_rng(0)
    m = rng.standard_normal((rows, dim))
    c = _kmeans_centroids(m, k, iters=3)
    assert c.shape == (min(k, rows), dim)
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-9)


@given(dim=st.integers(2, 64), bits=st.integers(1, 16), tables=st.integers(1, 8))
@settings(max_examples=15, deadline=None)
def test_hyperplanes_deterministic(dim, bits, tables):
    p1 = _hyperplanes(dim, bits, tables)
    p2 = _hyperplanes(dim, bits, tables)
    assert p1.shape == (tables, bits, dim)
    assert (p1 == p2).all()


@given(fail_times=st.integers(0, 5), tries=st.integers(1, 6))
@settings(max_examples=40, deadline=None)
def test_retry_semantics(fail_times, tries):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= fail_times:
            raise ValueError("boom")
        return "ok"

    wrapped = _with_retry(flaky, tries, 0.0, ValueError)
    if fail_times < tries:
        assert wrapped() == "ok"
        assert calls["n"] == fail_times + 1
    else:
        try:
            wrapped()
            raised = False
        except ValueError:
            raised = True
        assert raised
        assert calls["n"] == tries
