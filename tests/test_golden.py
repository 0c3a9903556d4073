"""Golden equivalence tests (SURVEY.md §4.2.6): freeze tiny weights, run the
same separation pipeline through TensorFlow (tf.signal + tf.nn — the
reference's substrate) and through this framework, and compare masks and
resynthesized waveforms.  This operationalizes the contract's
"bit-comparable separation masks vs the TF reference … within STFT numerical
tolerance" (BASELINE.json:5) despite the reference repo being unmountable
(SURVEY.md §0)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gan_sass_tf_tpu import dsp

tf = pytest.importorskip("tensorflow")

N_FFT, HOP, SR, T, S = 256, 64, 8000, 8000, 2
EPS = 1e-8


def _fixed_weights(rng):
    w = rng.standard_normal((3, 3, 1, S)).astype(np.float32) * 0.3
    b = rng.standard_normal((S,)).astype(np.float32) * 0.1
    return w, b


def _tf_pipeline(x, w, b):
    """The TF-reference-style pipeline: stft → logmag → conv mask → mask·X."""
    spec = tf.signal.stft(x, N_FFT, HOP, fft_length=N_FFT)
    feats = tf.math.log(tf.abs(spec) + EPS)[..., None]          # (B,T,K,1)
    masks = tf.sigmoid(
        tf.nn.conv2d(feats, w, strides=1, padding="SAME") + b
    )                                                            # (B,T,K,S)
    masks = tf.transpose(masks, [0, 3, 1, 2])                    # (B,S,T,K)
    est = tf.cast(masks, tf.complex64) * spec[:, None]
    wavs = tf.signal.inverse_stft(
        est, N_FFT, HOP, fft_length=N_FFT,
        window_fn=tf.signal.inverse_stft_window_fn(HOP),
    )
    return masks.numpy(), est.numpy(), wavs.numpy()


def _jax_pipeline(x, w, b):
    """Same math through this framework's DSP layer + an identical conv."""
    spec = dsp.stft(jnp.asarray(x), N_FFT, HOP)
    feats = dsp.logmag(spec, EPS)[..., None]
    out = jax.lax.conv_general_dilated(
        feats, jnp.asarray(w), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b)
    masks = jax.nn.sigmoid(out)
    masks = jnp.moveaxis(masks, 3, 1)                            # (B,S,T,K)
    est = dsp.apply_mask(spec, masks, "magnitude")
    wavs = dsp.istft(est, N_FFT, HOP, norm="tf")
    return np.asarray(masks), np.asarray(est), np.asarray(wavs)


def test_masks_bit_comparable_to_tf(rng):
    x = rng.standard_normal((2, T)).astype(np.float32)
    w, b = _fixed_weights(rng)
    m_tf, est_tf, wav_tf = _tf_pipeline(tf.constant(x), w, b)
    m_jx, est_jx, wav_jx = _jax_pipeline(x, w, b)
    assert m_jx.shape == m_tf.shape
    # Masks: sigmoid squashes STFT-level jitter to ~1e-6-level agreement.
    np.testing.assert_allclose(m_jx, m_tf, atol=1e-5)
    # Masked complex spectra to STFT tolerance.
    scale = np.abs(est_tf).max()
    np.testing.assert_allclose(est_jx, est_tf, atol=3e-4 * scale)
    # Resynthesized waveforms (same tf-style synthesis normalization).
    np.testing.assert_allclose(wav_jx, wav_tf, atol=1e-4)


def test_golden_on_speechlike_mixture(rng):
    """Same pipeline on a harmonic mixture (speech-like spectra rather than
    white noise) — guards against error cancellation on flat spectra."""
    n = np.arange(T) / SR
    x = sum(
        a * np.sin(2 * np.pi * f * n + p)
        for a, f, p in [(0.5, 220, 0.1), (0.3, 440, 1.2), (0.2, 1320, 2.0),
                        (0.4, 554, 0.7), (0.2, 1108, 1.9)]
    ).astype(np.float32)[None]
    w, b = _fixed_weights(rng)
    m_tf, _, wav_tf = _tf_pipeline(tf.constant(x), w, b)
    m_jx, _, wav_jx = _jax_pipeline(x, w, b)
    # Harmonic spectra have near-silent bins where log(|X|+eps) amplifies
    # float32 STFT jitter unboundedly (d log = d|X|/(|X|+eps)); the contract
    # tolerance is only meaningful where there is signal.  Compare masks on
    # bins with energy ≥ 1e-3 of peak (the 3x3 conv also smears silent-bin
    # jitter onto direct neighbors); the silent-bin masks gate ~zero
    # magnitude, so the waveforms still agree tightly everywhere.
    spec = np.abs(tf.signal.stft(tf.constant(x), N_FFT, HOP).numpy())
    energetic = (spec > 1e-3 * spec.max())[:, None]   # (B,1,T,K)
    diff = np.abs(m_jx - m_tf)
    assert diff[np.broadcast_to(energetic, diff.shape)].max() < 1e-5
    np.testing.assert_allclose(wav_jx, wav_tf, atol=1e-4)
