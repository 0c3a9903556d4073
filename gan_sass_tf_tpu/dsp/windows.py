"""Analysis/synthesis windows and COLA normalization.

Matches tf.signal conventions: periodic windows (denominator N, not N-1),
which satisfy constant-overlap-add for hop = N / 2^k.
"""

from __future__ import annotations

import numpy as np


def get_window(name: str, win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic window of length `win_length`.  Computed host-side with
    numpy (windows are compile-time constants baked into the jitted graph)."""
    n = np.arange(win_length, dtype=np.float64)
    if name == "hann":
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    elif name == "hamming":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_length)
    elif name in ("rect", "boxcar", "ones"):
        w = np.ones(win_length, dtype=np.float64)
    else:
        raise ValueError(f"unknown window {name!r}")
    return w.astype(dtype)


def cola_norm(window: np.ndarray, hop: int, n_frames: int) -> np.ndarray:
    """Overlap-added squared-window envelope for least-squares iSTFT
    normalization (the denominator of tf.signal.inverse_stft_window_fn,
    evaluated over the whole signal rather than per-frame).

    Returns an array of length (n_frames - 1) * hop + len(window) giving, at
    each output sample, the sum of w²[k] over all frames covering it.
    """
    win_length = len(window)
    out_len = (n_frames - 1) * hop + win_length
    env = np.zeros(out_len, dtype=np.float64)
    w2 = window.astype(np.float64) ** 2
    for f in range(n_frames):
        env[f * hop : f * hop + win_length] += w2
    return env.astype(window.dtype)
