"""Shared hard-material streaming scenario (tests/test_infer.py): two tones
with a long pause (tiny noise floor inside it) + an order-UNSTABLE band-split
'separator' — a deterministic stand-in for PIT output-order arbitrariness.
Used both for the positive regression (default hysteresis keeps the stream
swap-free) and the negative control (hysteresis=0 flips mid-gap)."""

from __future__ import annotations

import numpy as np


def make_scenario(cfg, seconds: float = 4.0, noise: float = 1e-5):
    sr = cfg.dsp.sample_rate
    t = int(seconds * sr)
    tt = np.arange(t) / sr
    low = np.sin(2 * np.pi * 300 * tt).astype(np.float32)
    high = 0.5 * np.sin(2 * np.pi * 2500 * tt).astype(np.float32)
    # Silent middle: both sources pause for ~1.2 s (many chunk boundaries
    # at the toy chunk_seconds; the pauses-in-noise failure mode).  A tiny
    # noise floor inside the gap gives the chaining L2 something to
    # mis-rank — pure zeros tie every permutation and cannot flip.
    gate = np.ones(t, np.float32)
    gate[int(1.4 * sr):int(2.6 * sr)] = 0.0
    low *= gate
    high *= gate
    rng = np.random.default_rng(3)
    mixture = (low + high
               + noise * (1.0 - gate)
               * rng.standard_normal(t).astype(np.float32))
    return mixture, low, high, t, sr


def make_stub_separate(sr: int):
    """Band-split 'separator' whose OUTPUT ORDER depends on chunk content
    parity (per-chunk pseudo-arbitrary, like an unconstrained PIT net)."""
    import jax.numpy as jnp

    def stub_separate(g_params, chunks):
        spec = jnp.fft.rfft(chunks, axis=-1)
        k = spec.shape[-1]
        cut = int(k * 1200 / (sr / 2)) // 2
        lo = jnp.fft.irfft(spec.at[:, cut:].set(0), chunks.shape[-1],
                           axis=-1).astype(jnp.float32)
        hi = (chunks - lo).astype(jnp.float32)
        flip = (jnp.sum(jnp.abs(chunks), axis=-1) * 1e3) % 2.0 > 1.0
        a = jnp.where(flip[:, None], hi, lo)
        b = jnp.where(flip[:, None], lo, hi)
        return jnp.stack([a, b], axis=1)

    return stub_separate


def gap_assignment(out: np.ndarray, low: np.ndarray, high: np.ndarray,
                   sr: int, require_clean: bool = True):
    """Which output index is the low tone, per loud segment (before/after
    the gap).  Equal indices <=> swap-free stream."""
    idxs = []
    for seg in (slice(int(0.2 * sr), int(1.2 * sr)),
                slice(int(2.8 * sr), int(3.8 * sr))):
        c = np.corrcoef(np.vstack([out[:, seg], low[None, seg],
                                   high[None, seg]]))
        i_low = int(np.argmax([abs(c[0, 2]), abs(c[1, 2])]))
        if require_clean:
            assert np.abs(c[i_low, 2]) > 0.9, c
            assert np.abs(c[1 - i_low, 3]) > 0.9, c
        idxs.append(i_low)
    return idxs


def run_scan_path(cfg, mixture: np.ndarray, t: int) -> np.ndarray:
    """Drive build_streaming_scan_fn the way separate_streaming_scan does
    (callers patch streaming.build_separate_fn first)."""
    import jax.numpy as jnp

    from gan_sass_tf_tpu.infer.streaming import (
        _chunk_geometry, build_streaming_scan_fn)

    scan_fn = build_streaming_scan_fn(cfg, g=None)
    chunk, stride, overlap, n_chunks, padded, ext = _chunk_geometry(cfg, t)
    idx = (np.arange(n_chunks)[:, None] * stride
           + np.arange(chunk + ext)[None, :])
    wav = np.pad(mixture, (0, padded - t))
    segs, tail = scan_fn(None, jnp.asarray(wav[idx]))
    full = np.moveaxis(np.asarray(segs), 1, 0).reshape(2, -1)
    full = np.concatenate([full, np.asarray(tail)], axis=-1)
    return full[:, :t]
