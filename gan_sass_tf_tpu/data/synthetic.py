"""Synthetic source generator — the test/CI stand-in for speech corpora
(SURVEY.md §4.2.4: "fixtures must be synthetic"; no network in this env).

Slot signal classes (DataConfig.slot_profiles; default "harmonic"):

  * "harmonic" — a harmonic stack with a slot-specific f0 range plus
    band-limited noise, amplitude-modulated by a slow random envelope.
    With DataConfig.f0_mode="disjoint" (default) the slots occupy disjoint
    f0 bands — separable by frequency alone (the round-1/2 protocol, whose
    oracle-IRM bound training reaches).  With f0_mode="shared" every slot
    draws f0 from ONE overlapped range and slots differ only by timbre
    (harmonic rolloff) and modulation rate — the HARD quality protocol
    (VERDICT r2 item 2): T-F overlap keeps the oracle bound finite and
    training well below it, so quality stays a live optimization axis.
  * "vocal"  — vibrato harmonic stack with a formant-like spectral envelope
    (music "vocals" stand-in for the complex-mask workload,
    BASELINE.json:10).
  * "accomp" — chord tones + low-passed broadband bed + periodic decaying
    transients (music "accompaniment": inharmonic + broadband energy).
"""

from __future__ import annotations

import numpy as np

# Held-out eval split of the latent pitch ranges (VERDICT r2 weak item 5:
# "held-out eval was the training distribution at a different seed").  Every
# identity-bearing latent range (harmonic/vocal f0, accomp chord root) is cut
# into N_SPLIT_BINS equal bins; eval owns the INTERIOR bins in EVAL_BINS
# (interpolation, never extrapolation), train owns the rest — so eval pitches
# are genuinely unseen during training, the synthetic analogue of held-out
# speakers.
N_SPLIT_BINS = 10
EVAL_BINS = (3, 7)


def split_uniform(rng, lo, hi, size, split):
    """Uniform sample from the train/eval partition of [lo, hi)."""
    if split == "all":
        return rng.uniform(lo, hi, size=size)
    if split not in ("train", "eval"):
        raise ValueError(f"unknown split {split!r}")
    bins = np.asarray([i for i in range(N_SPLIT_BINS)
                       if (i in EVAL_BINS) == (split == "eval")])
    w = (hi - lo) / N_SPLIT_BINS
    k = bins[rng.integers(len(bins), size=size)]
    return lo + (k + rng.uniform(0.0, 1.0, size=size)) * w


def _harmonic_slot(rng, nb, n, f0_lo, f0_hi, rolloff, env_lo, env_hi, split):
    """(nb, T) harmonic-stack utterances: 4 harmonics with amplitude
    rolloff ~ 1/h**rolloff, slow sinusoidal amplitude envelope."""
    h = np.arange(1, 5, dtype=np.float64)
    f0 = split_uniform(rng, f0_lo, f0_hi, (nb, 1, 1), split)
    amp = rng.uniform(0.2, 1.0, size=(nb, 4, 1)) / (h[None, :, None] ** rolloff)
    phase = rng.uniform(0, 2 * np.pi, size=(nb, 4, 1))
    sig = np.sum(
        amp * np.sin(2 * np.pi * f0 * h[None, :, None] * n + phase), axis=1
    )
    env_f = rng.uniform(env_lo, env_hi, size=(nb, 1))
    env_p = rng.uniform(0, 2 * np.pi, size=(nb, 1))
    env = 0.6 + 0.4 * np.sin(2 * np.pi * env_f * n + env_p)
    return sig * env + 0.01 * rng.standard_normal(sig.shape)


def _vocal_slot(rng, nb, n, sr, split):
    """(nb, T) vocals stand-in: 8-harmonic stack with ~5.5 Hz vibrato and a
    formant-like double-resonance spectral weighting, syllabic envelope."""
    nh = 8
    h = np.arange(1, nh + 1, dtype=np.float64)
    f0 = split_uniform(rng, 180.0, 330.0, (nb, 1, 1), split)
    vib_rate = rng.uniform(4.5, 6.5, size=(nb, 1, 1))
    vib_depth = rng.uniform(0.005, 0.02, size=(nb, 1, 1))
    vib = 1.0 + vib_depth * np.sin(2 * np.pi * vib_rate * n)
    # instantaneous phase of harmonic k = 2π k ∫ f0·vib dt
    dt = 1.0 / sr
    inst = np.cumsum(f0 * vib, axis=-1) * dt          # (nb, 1, T)
    phase0 = rng.uniform(0, 2 * np.pi, size=(nb, nh, 1))
    # formant-ish envelope: two resonances at random centers
    fmt1 = rng.uniform(400.0, 900.0, size=(nb, 1, 1))
    fmt2 = rng.uniform(1200.0, 2600.0, size=(nb, 1, 1))
    freqs = f0 * h[None, :, None]                     # (nb, nh, 1)
    w = (np.exp(-0.5 * ((freqs - fmt1) / 300.0) ** 2)
         + 0.7 * np.exp(-0.5 * ((freqs - fmt2) / 500.0) ** 2)
         + 0.15) / h[None, :, None] ** 0.5
    sig = np.sum(w * np.sin(2 * np.pi * h[None, :, None] * inst + phase0),
                 axis=1)
    # syllabic on/off envelope (~3-5 Hz raised sine, floored)
    env_f = rng.uniform(2.5, 5.0, size=(nb, 1))
    env_p = rng.uniform(0, 2 * np.pi, size=(nb, 1))
    env = np.clip(np.sin(2 * np.pi * env_f * n + env_p) + 0.4, 0.05, 1.0)
    return sig * env + 0.005 * rng.standard_normal(sig.shape)


def _accomp_slot(rng, nb, n, sr, split):
    """(nb, T) accompaniment stand-in: 3-note chords (each with 3 harmonics),
    a low-passed noise bed, and 2-4 Hz periodic decaying noise transients."""
    t_len = n.shape[-1]
    # chord: root from a low register, intervals of a third/fifth
    root = split_uniform(rng, 80.0, 220.0, (nb, 1, 1), split)
    ratios = np.asarray([1.0, 1.26, 1.5])[None, :, None]  # major-ish triad
    notes = root * ratios                                 # (nb, 3, 1)
    sig = np.zeros((nb, t_len))
    for k in range(1, 4):  # 3 harmonics per note
        amp = rng.uniform(0.3, 1.0, size=(nb, 3, 1)) / k
        ph = rng.uniform(0, 2 * np.pi, size=(nb, 3, 1))
        sig += np.sum(amp * np.sin(2 * np.pi * notes * k * n + ph), axis=1)
    # low-passed noise bed (one-pole smoothing of white noise)
    bed = rng.standard_normal((nb, t_len))
    alpha = np.exp(-2 * np.pi * 800.0 / sr)  # ~800 Hz one-pole lowpass
    from scipy.signal import lfilter

    bed = lfilter([1 - alpha], [1, -alpha], bed, axis=-1)
    sig += 2.0 * bed
    # periodic transients: decaying noise bursts at 2-4 Hz ("percussion")
    rate = rng.uniform(2.0, 4.0, size=(nb,))
    for bi in range(nb):
        period = int(sr / rate[bi])
        burst_len = int(0.05 * sr)
        decay = np.exp(-np.arange(burst_len) / (0.01 * sr))
        offs = rng.integers(period)
        for start in range(offs, t_len - burst_len, period):
            sig[bi, start:start + burst_len] += (
                1.5 * decay * rng.standard_normal(burst_len)
            )
    return sig


class SyntheticDataset:
    """Iterator of (B, S, T) float32 source batches.

    Generation cost model: synthesizing fresh stacks per batch is
    O(B·S·T·harmonics) host sin() work (~200 ms/step at realistic sizes —
    it throttled the 10 ms device step).  Like a real corpus, utterances are
    therefore synthesized ONCE into a per-source-slot bank; `batch()` only
    samples bank entries with random circular shifts and gains — pure
    memory traffic, ~1 ms.
    """

    BANK_PER_SLOT = 64

    def __init__(self, cfg, seed: int = 0, split: str = "train"):
        self.cfg = cfg
        self.split = split
        self.batch_size = cfg.train.batch_size
        self.num_sources = cfg.data.num_sources
        self.segment = cfg.segment_samples
        self.sample_rate = cfg.dsp.sample_rate
        self._rng = np.random.default_rng(seed)
        self._f0_mode = getattr(cfg.data, "f0_mode", "disjoint")
        profiles = tuple(getattr(cfg.data, "slot_profiles", ()) or ())
        if profiles and len(profiles) != self.num_sources:
            raise ValueError(
                f"slot_profiles has {len(profiles)} entries for "
                f"num_sources={self.num_sources}"
            )
        self._profiles = profiles or ("harmonic",) * self.num_sources
        # Disjoint f0 bands per source slot so sources are separable.
        nyq = self.sample_rate / 2
        lo, hi = 80.0, min(1000.0, nyq / 4)
        edges = np.geomspace(lo, hi, self.num_sources + 1)
        self._f0_bands = list(zip(edges[:-1], edges[1:]))
        self._shared_band = (100.0, min(420.0, nyq / 4))
        self._bank = None  # lazily built (S, BANK, T)

    def _build_bank(self) -> np.ndarray:
        s, t, sr, nb = self.num_sources, self.segment, self.sample_rate, self.BANK_PER_SLOT
        rng = self._rng
        n = np.arange(t, dtype=np.float64)[None, :] / sr
        bank = np.zeros((s, nb, t), np.float32)
        for si in range(s):
            prof = self._profiles[si]
            if prof == "harmonic":
                if self._f0_mode == "shared":
                    # Hard protocol: every slot draws f0 from the SAME range;
                    # identity lives in timbre (harmonic rolloff) and
                    # modulation rate only.
                    f0_lo, f0_hi = self._shared_band
                    rolloff = 0.6 + 0.5 * si          # slot timbre
                    env_lo, env_hi = 1.5 + 2.5 * si, 3.0 + 2.5 * si
                else:
                    f0_lo, f0_hi = self._f0_bands[si]
                    rolloff, env_lo, env_hi = 1.0, 2.0, 5.0
                sig = _harmonic_slot(rng, nb, n, f0_lo, f0_hi,
                                     rolloff, env_lo, env_hi, self.split)
            elif prof == "vocal":
                sig = _vocal_slot(rng, nb, n, sr, self.split)
            elif prof == "accomp":
                sig = _accomp_slot(rng, nb, n[0], sr, self.split)
            else:
                raise ValueError(f"unknown slot profile {prof!r}")
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
