"""DSP frontend fidelity tests (SURVEY.md §4.2.1) — the spine of the
contract: "output fidelity to within STFT numerical tolerance"
(BASELINE.json:5), validated against dual oracles (tf.signal and numpy FFT).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gan_sass_tf_tpu import dsp

tf = pytest.importorskip("tensorflow")

CONFIGS = [
    # (n_fft, hop, T) spanning the contract presets' STFT grids
    (256, 64, 8000),     # 2src_toy_cpu (BASELINE.json:7)
    (512, 128, 16384),   # wsj0_logmel / 3src_pit / stream (BASELINE.json:8,9,11)
    (2048, 512, 44100),  # music_complex_44k (BASELINE.json:10)
]


def _rand_wav(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT vs tf.signal
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_fft,hop,t", CONFIGS)
def test_stft_matches_tf_signal(rng, n_fft, hop, t):
    x = _rand_wav(rng, 2, t)
    ours = np.asarray(dsp.stft(jnp.asarray(x), n_fft, hop))
    ref = tf.signal.stft(x, n_fft, hop, fft_length=n_fft).numpy()
    assert ours.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=2e-4 * scale, rtol=1e-4)


def test_frame_matches_tf_signal(rng):
    x = _rand_wav(rng, 3, 1000)
    ours = np.asarray(dsp.frame_signal(jnp.asarray(x), 256, 64))
    ref = tf.signal.frame(x, 256, 64).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_overlap_add_matches_tf_signal(rng):
    frames = _rand_wav(rng, 2, 10, 256)
    ours = np.asarray(dsp.overlap_add(jnp.asarray(frames), 64))
    ref = tf.signal.overlap_and_add(frames, 64).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("n_fft,hop,t", CONFIGS)
def test_istft_matches_tf_signal(rng, n_fft, hop, t):
    x = _rand_wav(rng, 2, t)
    spec = tf.signal.stft(x, n_fft, hop, fft_length=n_fft).numpy()
    ours = np.asarray(
        dsp.istft(jnp.asarray(spec), n_fft, hop, norm="tf")
    )
    ref = tf.signal.inverse_stft(
        spec, n_fft, hop, fft_length=n_fft,
        window_fn=tf.signal.inverse_stft_window_fn(hop),
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Round-trip property (COLA): istft(stft(x)) == x with global LS norm
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_fft,hop,t", CONFIGS)
def test_roundtrip_exact(rng, n_fft, hop, t):
    """Least-squares iSTFT reconstructs exactly wherever the squared-window
    envelope is well-conditioned.  The first/last `hop` samples are excluded:
    the periodic Hann window is ~0 there (w[0] == 0 exactly), so those samples
    are unrecoverable/ill-conditioned by construction, not an implementation
    artifact."""
    x = _rand_wav(rng, 2, t)
    f = dsp.num_frames(t, n_fft, hop)
    t_grid = (f - 1) * hop + n_fft  # samples covered by the frame grid
    spec = dsp.stft(jnp.asarray(x), n_fft, hop)
    y = np.asarray(dsp.istft(spec, n_fft, hop, length=t_grid, norm="global"))
    np.testing.assert_allclose(
        y[:, hop : t_grid - hop], x[:, hop : t_grid - hop], atol=1e-4
    )


# ---------------------------------------------------------------------------
# Mel filterbank vs tf.signal.linear_to_mel_weight_matrix
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n_mels,n_bins,sr,lo,hi",
    [(80, 257, 8000, 20.0, 4000.0), (20, 129, 16000, 125.0, 3800.0)],
)
def test_mel_matrix_matches_tf(n_mels, n_bins, sr, lo, hi):
    ours = dsp.mel_filterbank(n_mels, n_bins, sr, lo, hi)
    ref = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=n_mels, num_spectrogram_bins=n_bins, sample_rate=sr,
        lower_edge_hertz=lo, upper_edge_hertz=hi,
    ).numpy()
    # tf computes the triangles in float32; we use float64 → ~1e-5 jitter.
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_logmel_shape(rng):
    x = _rand_wav(rng, 2, 8000)
    spec = dsp.stft(jnp.asarray(x), 512, 128)
    m = jnp.asarray(dsp.mel_filterbank(80, 257, 8000))
    feats = dsp.logmel(spec, m)
    assert feats.shape == spec.shape[:-1] + (80,)
    assert np.isfinite(np.asarray(feats)).all()


# ---------------------------------------------------------------------------
# Masks
# ---------------------------------------------------------------------------


def test_magnitude_mask_identity(rng):
    x = _rand_wav(rng, 2, 4096)
    spec = dsp.stft(jnp.asarray(x), 256, 64)
    ones = jnp.ones((2, 2) + spec.shape[-2:])  # S=2 all-pass masks
    out = dsp.apply_mask(spec, ones, "magnitude")
    assert out.shape == (2, 2) + spec.shape[-2:]
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(spec), atol=1e-6)


def test_complex_mask_matches_manual(rng):
    x = _rand_wav(rng, 1, 4096)
    spec = dsp.stft(jnp.asarray(x), 256, 64)
    m = rng.standard_normal((1, 2) + spec.shape[-2:] + (2,)).astype(np.float32)
    out = np.asarray(dsp.apply_mask(spec, jnp.asarray(m), "complex"))
    manual = np.asarray(spec)[:, None] * (m[..., 0] + 1j * m[..., 1])
    np.testing.assert_allclose(out, manual, atol=1e-5)


def test_mask_separation_recovers_sources(rng):
    """Ideal-ratio-mask sanity: disjoint-band sources are exactly recovered."""
    sr, t = 8000, 8000
    n = np.arange(t) / sr
    s1 = np.sin(2 * np.pi * 400 * n).astype(np.float32)
    s2 = np.sin(2 * np.pi * 1900 * n).astype(np.float32)
    mix = jnp.asarray((s1 + s2)[None])
    spec = dsp.stft(mix, 256, 64)
    freqs = np.fft.rfftfreq(256, 1 / sr)
    m1 = (freqs < 1000).astype(np.float32)[None, None, None, :]
    m2 = (freqs >= 1000).astype(np.float32)[None, None, None, :]
    masks = jnp.asarray(np.concatenate([m1, m2], axis=1) * np.ones((1, 2, spec.shape[-2], 1), np.float32))
    sep = dsp.apply_mask(spec, masks, "magnitude")
    wavs = np.asarray(dsp.istft(sep, 256, 64, norm="global"))
    t_grid = wavs.shape[-1]
    margin = 256  # ignore frame-grid edges
    err1 = np.abs(wavs[0, 0, margin:-margin] - s1[margin : t_grid - margin]).max()
    err2 = np.abs(wavs[0, 1, margin:-margin] - s2[margin : t_grid - margin]).max()
    assert err1 < 5e-2 and err2 < 5e-2


# ---------------------------------------------------------------------------
# win_length < n_fft (tf.signal frame_length < fft_length; VERDICT r1 item 3)
# ---------------------------------------------------------------------------

WIN_CONFIGS = [
    # (n_fft, win_length, hop, T)
    (256, 200, 64, 8000),
    (512, 400, 128, 16384),
]


@pytest.mark.parametrize("n_fft,win,hop,t", WIN_CONFIGS)
def test_stft_win_length_matches_tf_signal(rng, n_fft, win, hop, t):
    x = _rand_wav(rng, 2, t)
    ours = np.asarray(
        dsp.stft(jnp.asarray(x), n_fft, hop, win_length=win)
    )
    ref = tf.signal.stft(x, win, hop, fft_length=n_fft).numpy()
    assert ours.shape == ref.shape      # tf frame count: 1 + (T - win)//hop
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=2e-4 * scale, rtol=1e-4)


@pytest.mark.parametrize("n_fft,win,hop,t", WIN_CONFIGS)
def test_istft_win_length_matches_tf_signal(rng, n_fft, win, hop, t):
    x = _rand_wav(rng, 2, t)
    spec = tf.signal.stft(x, win, hop, fft_length=n_fft).numpy()
    ours = np.asarray(
        dsp.istft(jnp.asarray(spec), n_fft, hop, norm="tf", win_length=win)
    )
    ref = tf.signal.inverse_stft(
        spec, win, hop, fft_length=n_fft,
        window_fn=tf.signal.inverse_stft_window_fn(hop),
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_roundtrip_win_length_interior_exact(rng):
    n_fft, win, hop = 512, 400, 128
    x = _rand_wav(rng, 2, 8192)
    spec = dsp.stft(jnp.asarray(x), n_fft, hop, win_length=win)
    y = np.asarray(dsp.istft(spec, n_fft, hop, win_length=win))
    t_out = y.shape[-1]
    assert t_out == (spec.shape[-2] - 1) * hop + win
    np.testing.assert_allclose(
        y[:, n_fft:t_out - n_fft], x[:, n_fft:t_out - n_fft], atol=1e-4
    )


def test_dispatch_win_length_matches_tf(rng):
    """The ops dispatch layer (stft_features / istft) honors win_length."""
    from gan_sass_tf_tpu.config import DSPConfig
    from gan_sass_tf_tpu.ops import dispatch as ops

    n_fft, win, hop, t = 512, 400, 128, 8192
    dcfg = DSPConfig(sample_rate=8000, n_fft=n_fft, hop_length=hop,
                     win_length=win)
    x = _rand_wav(rng, 2, t)
    out = ops.stft_features(jnp.asarray(x), dcfg, emit=("spec", "logmag"))
    ref = tf.signal.stft(x, win, hop, fft_length=n_fft).numpy()
    assert out["spec"].shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out["spec"]), ref,
                               atol=2e-4 * scale, rtol=1e-4)
    y = np.asarray(ops.istft(out["spec"], n_fft, hop, win_length=win))
    assert y.shape[-1] == (ref.shape[-2] - 1) * hop + win


def test_win_length_larger_than_nfft_raises():
    from gan_sass_tf_tpu.config import DSPConfig

    with pytest.raises(ValueError):
        DSPConfig(n_fft=256, win_length=512)
