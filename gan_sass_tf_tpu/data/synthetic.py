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
    """Iterator of (B, S, T) float32 source batches."""

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

    def batch(self, batch_size: int | None = None) -> np.ndarray:
        b = batch_size or self.batch_size
        s, t, sr = self.num_sources, self.segment, self.sample_rate
        rng = self._rng
        n = np.arange(t) / sr
        out = np.zeros((b, s, t), np.float32)
        for bi in range(b):
            for si in range(s):
                f0 = rng.uniform(*self._f0_bands[si])
                sig = np.zeros(t)
                for h in range(1, 5):  # 4 harmonics
                    amp = rng.uniform(0.2, 1.0) / h
                    phase = rng.uniform(0, 2 * np.pi)
                    sig += amp * np.sin(2 * np.pi * f0 * h * n + phase)
                # slow amplitude envelope (2-5 Hz "syllabic" modulation)
                env_f = rng.uniform(2.0, 5.0)
                env = 0.6 + 0.4 * np.sin(2 * np.pi * env_f * n + rng.uniform(0, 6.28))
                sig = sig * env + 0.01 * rng.standard_normal(t)
                out[bi, si] = (sig / (np.abs(sig).max() + 1e-6)).astype(np.float32)
        return out

    def __iter__(self):
        while True:
            yield self.batch()
