"""Spectrogram features: log-magnitude and log-mel (reference layer L3).

The mel filterbank reproduces tf.signal.linear_to_mel_weight_matrix
(HTK mel scale, zeroth spectrogram bin excluded) so the log-mel frontend of
the wsj0_logmel workload (BASELINE.json:8) is bit-comparable to the TF
oracle.  The filterbank is a compile-time numpy constant; on device it is a
single (n_bins, n_mels) matmul — MXU-friendly and fused into the Pallas
frontend on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _hertz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_filterbank(
    num_mel_bins: int,
    num_spectrogram_bins: int,
    sample_rate: float,
    lower_edge_hertz: float = 20.0,
    upper_edge_hertz: Optional[float] = None,
    dtype=np.float32,
) -> np.ndarray:
    """(num_spectrogram_bins, num_mel_bins) triangular mel weight matrix,
    numerically matching tf.signal.linear_to_mel_weight_matrix."""
    if upper_edge_hertz is None:
        upper_edge_hertz = sample_rate / 2.0
    nyquist = sample_rate / 2.0
    # tf.signal excludes the DC bin from the triangle computation.
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)[1:]
    spec_mel = _hertz_to_mel(linear_freqs)[:, None]
    edges = np.linspace(
        _hertz_to_mel(lower_edge_hertz),
        _hertz_to_mel(upper_edge_hertz),
        num_mel_bins + 2,
    )
    lower, center, upper = edges[:-2][None, :], edges[1:-1][None, :], edges[2:][None, :]
    lower_slope = (spec_mel - lower) / (center - lower)
    upper_slope = (upper - spec_mel) / (upper - center)
    weights = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    return np.pad(weights, [[1, 0], [0, 0]]).astype(dtype)


def mel_interp_matrix(
    num_mel_bins: int,
    num_spectrogram_bins: int,
    sample_rate: float,
    lower_edge_hertz: float = 20.0,
    upper_edge_hertz: Optional[float] = None,
    dtype=np.float32,
) -> np.ndarray:
    """(num_spectrogram_bins, num_mel_bins) FIXED 2-tap linear-interpolation
    matrix that resamples mel-grid features back onto the linear STFT-bin
    grid: linear bin k reads the (fractional) mel-center index of its own
    center frequency.  Rows sum to 1; bins outside [first, last] mel center
    clamp to the edge channel.  Being a compile-time constant (not learned),
    a mask head built on it cannot memorize absolute bin positions — the
    fix for the round-3 measured 12.5 dB held-out generalization gap of the
    Dense mel head (mel centers match mel_filterbank / tf.signal)."""
    if upper_edge_hertz is None:
        upper_edge_hertz = sample_rate / 2.0
    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)
    edges = np.linspace(
        _hertz_to_mel(lower_edge_hertz),
        _hertz_to_mel(upper_edge_hertz),
        num_mel_bins + 2,
    )
    centers = edges[1:-1]                       # (num_mel_bins,) mel units
    pos = np.interp(_hertz_to_mel(linear_freqs), centers,
                    np.arange(num_mel_bins, dtype=np.float64))
    lo = np.clip(np.floor(pos).astype(np.int64), 0, num_mel_bins - 1)
    hi = np.minimum(lo + 1, num_mel_bins - 1)
    frac = pos - lo
    w = np.zeros((num_spectrogram_bins, num_mel_bins), np.float64)
    rows = np.arange(num_spectrogram_bins)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w.astype(dtype)


def logmag(spec: jax.Array, eps: float = 1e-8) -> jax.Array:
    """log(|STFT| + eps) on complex spectra, (..., F, K) -> same shape f32."""
    return jnp.log(jnp.abs(spec) + eps).astype(jnp.float32)


def logmel(
    spec: jax.Array,
    mel_matrix: jax.Array,
    eps: float = 1e-8,
) -> jax.Array:
    """log-mel from complex STFT: log(|X| @ M + eps), (..., F, K) -> (..., F, n_mels)."""
    mag = jnp.abs(spec).astype(jnp.float32)
    return jnp.log(mag @ mel_matrix + eps)


def spec_features(spec: jax.Array, dsp_cfg) -> jax.Array:
    """Generator input features per DSPConfig.feature ('logmag' | 'logmel')."""
    if dsp_cfg.feature == "logmag":
        return logmag(spec, dsp_cfg.eps)
    if dsp_cfg.feature == "logmel":
        m = jnp.asarray(
            mel_filterbank(dsp_cfg.n_mels, dsp_cfg.n_bins, dsp_cfg.sample_rate)
        )
        return logmel(spec, m, dsp_cfg.eps)
    raise ValueError(f"unknown feature {dsp_cfg.feature!r}")
