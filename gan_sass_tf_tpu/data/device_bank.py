"""Device-resident utterance bank + in-graph batch sampling.

The reference streams every batch host→device (`feed_dict` per step,
SURVEY.md §3.1); through this environment's TPU relay one (B,S,T) float32
batch costs ~200 ms — 30× the 7 ms step.  The TPU-native fix implements the
north star literally ("no host round-trips", BASELINE.json:5): the utterance
bank (S, N_bank, T) is uploaded to HBM ONCE, and each train step samples
utterances + circular shifts in-graph from the threaded PRNG key.

Sampling keys are derived per GLOBAL example index, so results are
bit-identical across mesh sizes (same contract as data/mixer.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_bank(cfg, seed: int = 0) -> np.ndarray:
    """(S, N_bank, T) float32 source bank on the host.

    synthetic → the SyntheticDataset harmonic bank;
    wav_dir   → N_bank decoded random segments per source slot.
    """
    from gan_sass_tf_tpu.data import make_dataset

    ds = make_dataset(cfg, seed=seed)
    s, t = cfg.data.num_sources, cfg.segment_samples
    nb = cfg.data.bank_utterances
    if hasattr(ds, "_build_bank"):
        ds.BANK_PER_SLOT = nb
        return ds._build_bank()
    bank = np.zeros((s, nb, t), np.float32)
    for i in range(nb):  # corpus: decode nb random utterances per slot
        bank[:, i] = ds.batch(1)[0]
    return bank


def sample_bank(
    bank: jax.Array, rng: jax.Array, local_batch: int, example_offset=0
) -> jax.Array:
    """In-graph batch sampling: (S, N_bank, T) bank -> (B_local, S, T)
    sources via per-example random utterance pick + circular shift."""
    s, nb, t = bank.shape
    ids = example_offset + jnp.arange(local_batch)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(rng, ids)

    def _one(key):
        k_pick, k_shift = jax.random.split(key)
        picks = jax.random.randint(k_pick, (s,), 0, nb)
        shifts = jax.random.randint(k_shift, (s,), 0, t)
        rows = jax.vmap(lambda si, pi: bank[si, pi])(jnp.arange(s), picks)
        return jax.vmap(jnp.roll)(rows, -shifts)

    return jax.vmap(_one)(keys)
