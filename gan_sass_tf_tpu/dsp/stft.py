"""Framing, STFT, iSTFT, overlap-add — pure-JAX (XLA) oracle path.

TPU-first design notes (SURVEY.md §7.3):
  * Framing and overlap-add avoid gather/scatter entirely when
    n_fft % hop == 0 (true for every contract preset): both are expressed as
    r = n_fft // hop static shifted reshapes, which XLA lowers to cheap
    pad/concat/add — fully fusable, static shapes, MXU/VPU friendly.
  * All functions are batched over arbitrary leading dims and jit-safe.
  * Conventions match tf.signal (the fidelity oracle, BASELINE.json:5):
    periodic Hann, no centering, n_frames = 1 + (T - n_fft)//hop.

The fused Pallas kernels in gan_sass_tf_tpu/ops implement the same math for
TPU; this module is their numerical oracle (tested to STFT tolerance).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gan_sass_tf_tpu.dsp.windows import cola_norm, encode_win_length, get_window


def num_frames(n_samples: int, n_fft: int, hop: int) -> int:
    if n_samples < n_fft:
        raise ValueError(f"signal ({n_samples}) shorter than n_fft ({n_fft})")
    return 1 + (n_samples - n_fft) // hop


def frame_signal(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """(..., T) -> (..., F, n_fft) overlapping frames, tf.signal.frame
    convention (no padding; trailing samples beyond the frame grid dropped).
    """
    t = x.shape[-1]
    f = num_frames(t, n_fft, hop)
    if n_fft % hop == 0:
        # Shift-reshape framing: no gather.  chunks[c] = x[c*hop:(c+1)*hop];
        # frame f = concat(chunks[f : f + r]).
        r = n_fft // hop
        n_chunks = f + r - 1
        chunks = x[..., : n_chunks * hop].reshape(*x.shape[:-1], n_chunks, hop)
        parts = [chunks[..., j : j + f, :] for j in range(r)]
        return jnp.concatenate(parts, axis=-1)
    # General fallback: gather (used only for non-divisible hop).
    idx = np.arange(f)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """(..., F, N) -> (..., (F-1)*hop + N) overlap-add (tf.signal.overlap_add
    semantics).  Scatter-free when N % hop == 0: each frame is split into
    r = N//hop hop-chunks, and chunk j of frame f lands at output row f + j;
    the r diagonals are summed as statically padded arrays.
    """
    *batch, f, n = frames.shape
    out_len = (f - 1) * hop + n
    if n % hop == 0:
        r = n // hop
        chunked = frames.reshape(*batch, f, r, hop)
        nrows = f + r - 1
        acc = None
        for j in range(r):
            pad = [(0, 0)] * len(batch) + [(j, nrows - f - j), (0, 0)]
            shifted = jnp.pad(chunked[..., :, j, :], pad)
            acc = shifted if acc is None else acc + shifted
        return acc.reshape(*batch, nrows * hop)[..., :out_len]
    # General fallback: segment scatter-add.
    out = jnp.zeros((*batch, out_len), frames.dtype)
    for fr in range(f):  # static unroll; non-divisible hop is a rare path
        out = out.at[..., fr * hop : fr * hop + n].add(frames[..., fr, :])
    return out


@partial(jax.jit,
         static_argnames=("n_fft", "hop", "window", "win_length"))
def stft(x: jax.Array, n_fft: int, hop: int, window: str = "hann",
         win_length: Optional[int] = None) -> jax.Array:
    """(..., T) float -> (..., F, n_fft//2 + 1) complex64 STFT.

    Matches tf.signal.stft(x, frame_length, hop, fft_length=n_fft,
    window_fn=hann(periodic)) to float32 numerical tolerance.

    win_length < n_fft (tf's frame_length < fft_length): frames of
    win_length samples are windowed and zero-padded to n_fft before the
    FFT.  Implemented by end-padding the window to n_fft (zeros kill the
    extra samples) and end-padding the signal by n_fft - win_length so the
    frame count is tf-exact: n_frames = 1 + (T - win_length)//hop.
    """
    window, pad = encode_win_length(window, n_fft, win_length)
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    w = jnp.asarray(get_window(window, n_fft))
    frames = frame_signal(x, n_fft, hop) * w
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


@partial(jax.jit, static_argnames=("n_fft", "hop", "window", "length",
                                   "norm", "win_length"))
def istft(
    spec: jax.Array,
    n_fft: int,
    hop: int,
    window: str = "hann",
    length: Optional[int] = None,
    norm: str = "global",
    win_length: Optional[int] = None,
) -> jax.Array:
    """(..., F, n_bins) complex -> (..., T) float32 inverse STFT.

    norm="global": least-squares inverse — overlap-add of windowed frames
      divided by the full overlap-added squared-window envelope; exact
      reconstruction everywhere, including signal edges (used by the
      framework).
    norm="tf": per-frame synthesis window w / Σ_k w²[n+k·hop] (periodic),
      bit-matching tf.signal.inverse_stft with inverse_stft_window_fn —
      exact in the COLA interior, attenuated at the edges (used by the
      fidelity oracle tests).

    win_length < n_fft: the irFFT frames are n_fft long but only the first
    win_length samples belong to the signal (tf truncates to frame_length
    before windowing) — the end-padded window zeros them instead, and the
    output is cut to the tf length (f-1)*hop + win_length when `length` is
    not given.
    """
    f = spec.shape[-2]
    window, pad = encode_win_length(window, n_fft, win_length)
    if pad and length is None:
        length = (f - 1) * hop + win_length
    w = get_window(window, n_fft)
    frames_t = jnp.fft.irfft(spec, n=n_fft, axis=-1).astype(jnp.float32)
    if norm == "tf":
        d = np.zeros(hop, dtype=np.float64)
        w64 = w.astype(np.float64)
        for j in range(n_fft // hop):
            d += w64[j * hop : (j + 1) * hop] ** 2
        d_full = np.tile(d, n_fft // hop)
        w_syn = (w64 / np.where(d_full <= 1e-30, 1.0, d_full)).astype(np.float32)
        y = overlap_add(frames_t * jnp.asarray(w_syn), hop)
    elif norm == "global":
        from gan_sass_tf_tpu.dsp.windows import safe_inv_env

        inv_env = safe_inv_env(cola_norm(w, hop, f))
        y = overlap_add(frames_t * jnp.asarray(w), hop) * jnp.asarray(inv_env)
    else:
        raise ValueError(f"unknown istft norm {norm!r}")
    if length is not None:
        y = y[..., :length]
    return y
