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


def _sig_np(hashes, num_hashes=32):
    """Reference signature via the same multiply-shift params the Spark
    kernel uses (dedup._signature_from_hash_col's math, minus Arrow)."""
    a, b = _minhash_params(num_hashes)
    hv = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        perm = hv[:, None] * a[None, :] + b[None, :]
    return perm.min(axis=0).astype(np.int64)


@given(
    h1=st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=40),
    h2=st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=40),
)
@settings(max_examples=40, deadline=None)
def test_minhash_union_is_elementwise_min(h1, h2):
    """THE property that makes MinHash distributable: the signature of a
    union is the element-wise min of the parts' signatures — partial
    signatures computed per partition merge exactly (map-side combine is
    lossless)."""
    su = _sig_np(h1 + h2)
    # the kernel takes the min in UNSIGNED space (perm.min precedes the
    # int64 reinterpretation), so the merge law lives there too — an
    # int64-space min over the reinterpreted signatures would be wrong
    merged = np.minimum(
        _sig_np(h1).astype(np.uint64), _sig_np(h2).astype(np.uint64)
    ).astype(np.int64)
    np.testing.assert_array_equal(su, merged)


@given(
    h=st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=60),
)
@settings(max_examples=40, deadline=None)
def test_minhash_order_and_duplicate_invariance(h):
    """Signatures are set functions: shuffle order, duplicate elements —
    the signature must not move (shingle multiplicity and partition
    layout cannot change near-dup verdicts)."""
    rng = np.random.default_rng(7)
    shuffled = list(np.array(h)[rng.permutation(len(h))])
    np.testing.assert_array_equal(_sig_np(h), _sig_np(shuffled))
    np.testing.assert_array_equal(_sig_np(h), _sig_np(h + h))


@given(
    same=st.lists(st.integers(-(2**63), 2**63 - 1), min_size=4, max_size=40)
)
@settings(max_examples=25, deadline=None)
def test_identical_sets_always_collide_every_band(same):
    """j=1 pairs must be recalled by EVERY band (the S-curve's right
    edge is exactly 1) — identical signatures slice into identical
    bands."""
    s1, s2 = _sig_np(same), _sig_np(list(reversed(same)))
    bands, rows = 8, 4
    for bnd in range(bands):
        np.testing.assert_array_equal(
            s1[bnd * rows : (bnd + 1) * rows],
            s2[bnd * rows : (bnd + 1) * rows],
        )


@given(
    stream=st.lists(st.integers(0, 30), min_size=1, max_size=400),
    cuts=st.lists(st.integers(1, 399), max_size=6),
    capacity=st.integers(2, 12),
)
@settings(max_examples=60, deadline=None)
def test_misra_gries_fold_invariants(stream, cuts, capacity):
    """mg_fold over ANY batching of ANY stream: summary size stays
    <= capacity; every estimate satisfies est <= true <= est + d; every
    key with true count > d is present; and d is batching-independent
    only in its GUARANTEE, not its value — so the invariants are
    asserted per-fold, not vs a canonical run."""
    from collections import Counter

    from klio_spark.streaming import mg_fold

    bounds = sorted({c for c in cuts if c < len(stream)})
    batches, prev = [], 0
    for b in bounds + [len(stream)]:
        if b > prev:
            batches.append(stream[prev:b])
            prev = b
    summary, d = {}, 0
    seen = []
    for batch in batches:
        seen += batch
        passed_in = summary
        snapshot = dict(summary)
        summary, d = mg_fold(summary, Counter(batch), capacity, d)
        # purity: the passed-in summary is copied, never mutated
        # (ADVICE r4 — a caller retaining the old dict must see it intact)
        assert passed_in == snapshot
        true = Counter(seen)
        assert len(summary) <= capacity
        for k, est in summary.items():
            assert est >= 1
            assert est <= true[k] <= est + d, (k, est, true[k], d)
        for k, t in true.items():
            if t > d:
                assert k in summary, (k, t, d)
