"""Synthetic source generator — the test/CI stand-in for speech corpora
(SURVEY.md §4.2.4: "fixtures must be synthetic"; no network in this env).

Each virtual speaker s is a harmonic stack with a speaker-specific f0 range
plus band-limited noise, amplitude-modulated by a slow random envelope —
enough spectral structure that band-separation is learnable, cheap enough to
generate on the host at line rate.
"""

from __future__ import annotations

import numpy as np


class SyntheticDataset:
    """Iterator of (B, S, T) float32 source batches.

    Generation cost model: synthesizing fresh harmonic stacks per batch is
    O(B·S·T·harmonics) host sin() work (~200 ms/step at realistic sizes —
    it throttled the 10 ms device step).  Like a real corpus, utterances are
    therefore synthesized ONCE into a per-source-slot bank; `batch()` only
    samples bank entries with random circular shifts and gains — pure
    memory traffic, ~1 ms.
    """

    BANK_PER_SLOT = 64

    def __init__(self, cfg, seed: int = 0):
        self.cfg = cfg
        self.batch_size = cfg.train.batch_size
        self.num_sources = cfg.data.num_sources
        self.segment = cfg.segment_samples
        self.sample_rate = cfg.dsp.sample_rate
        self._rng = np.random.default_rng(seed)
        # Disjoint f0 bands per source slot so sources are separable.
        nyq = self.sample_rate / 2
        lo, hi = 80.0, min(1000.0, nyq / 4)
        edges = np.geomspace(lo, hi, self.num_sources + 1)
        self._f0_bands = list(zip(edges[:-1], edges[1:]))
        self._bank = None  # lazily built (S, BANK, T)

    def _build_bank(self) -> np.ndarray:
        s, t, sr, nb = self.num_sources, self.segment, self.sample_rate, self.BANK_PER_SLOT
        rng = self._rng
        n = np.arange(t, dtype=np.float64) / sr
        bank = np.zeros((s, nb, t), np.float32)
        h = np.arange(1, 5, dtype=np.float64)                    # 4 harmonics
        for si in range(s):
            f0 = rng.uniform(*self._f0_bands[si], size=(nb, 1, 1))
            amp = rng.uniform(0.2, 1.0, size=(nb, 4, 1)) / h[None, :, None]
            phase = rng.uniform(0, 2 * np.pi, size=(nb, 4, 1))
            sig = np.sum(
                amp * np.sin(2 * np.pi * f0 * h[None, :, None] * n + phase),
                axis=1,
            )                                                    # (nb, t)
            env_f = rng.uniform(2.0, 5.0, size=(nb, 1))
            env_p = rng.uniform(0, 2 * np.pi, size=(nb, 1))
            env = 0.6 + 0.4 * np.sin(2 * np.pi * env_f * n + env_p)
            sig = sig * env + 0.01 * rng.standard_normal((nb, t))
            bank[si] = (
                sig / (np.abs(sig).max(axis=-1, keepdims=True) + 1e-6)
            ).astype(np.float32)
        return bank

    def batch(self, batch_size: int | None = None) -> np.ndarray:
        if self._bank is None:
            self._bank = self._build_bank()
        b = batch_size or self.batch_size
        s, t = self.num_sources, self.segment
        rng = self._rng
        picks = rng.integers(self.BANK_PER_SLOT, size=(b, s))
        shifts = rng.integers(t, size=(b, s))
        out = np.empty((b, s, t), np.float32)
        for si in range(s):  # S ≤ 3: cheap loop; inner ops are vectorized
            rows = self._bank[si, picks[:, si]]                  # (b, t)
            # random circular shift per example (cheap "random crop")
            idx = (shifts[:, si, None] + np.arange(t)[None, :]) % t
            out[:, si] = np.take_along_axis(rows, idx, axis=1)
        return out

    def __iter__(self):
        while True:
            yield self.batch()
