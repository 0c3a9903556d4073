"""Data layer (reference layer L2, SURVEY.md §3.3).

Split of responsibilities (the north-star's "no host round-trips",
BASELINE.json:5): the host only decodes/samples raw source waveforms into
fixed-shape (B, S, T) float32 batches; trim/pad/gain-jitter/mixing all happen
on device inside the fused train step (`mixer.mix_sources`).

Datasets:
    "synthetic" — deterministic synthetic speakers (harmonic stacks + noise);
                  no corpus download needed (zero-egress environment,
                  SURVEY.md §7.3)
    "wav_dir"   — LibriSpeech/WSJ0-style corpus tree: root/<speaker>/*.wav
"""

from gan_sass_tf_tpu.data.synthetic import SyntheticDataset
from gan_sass_tf_tpu.data.corpus import WavDirDataset
from gan_sass_tf_tpu.data.mixer import mix_sources


def make_dataset(cfg, seed: int = 0, split: str = "train"):
    """split: "train" / "eval" are latent-disjoint (synthetic: held-out f0 /
    chord-root bins; wav_dir: held-out speakers); "all" disables the split."""
    if cfg.data.dataset == "synthetic":
        return SyntheticDataset(cfg, seed=seed, split=split)
    if cfg.data.dataset == "wav_dir":
        return WavDirDataset(cfg, seed=seed, split=split)
    raise ValueError(f"unknown dataset {cfg.data.dataset!r}")


__all__ = ["SyntheticDataset", "WavDirDataset", "mix_sources", "make_dataset"]
