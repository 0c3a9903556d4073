"""On-device mixing (reference mixes host-side; here it is part of the fused
step per the north star's "no host round-trips", BASELINE.json:5).

Given raw source waveforms (B, S, T), applies per-source random gain jitter,
sums into the mixture, and optionally adds Gaussian noise at a configured
SNR.  Runs under jit; randomness from threaded PRNG keys (never time-seeded,
SURVEY.md §5.2).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mix_sources(
    sources: jax.Array, rng: jax.Array, data_cfg, example_offset=0
) -> Tuple[jax.Array, jax.Array]:
    """-> (mixture (B, T), gain-scaled sources (B, S, T)).

    Targets are the *scaled* sources (what is actually present in the mix).

    Randomness is derived PER GLOBAL EXAMPLE: key_i = fold_in(rng,
    example_offset + i).  Under shard_map data parallelism the caller passes
    example_offset = shard_id · local_batch, so the mixing is bit-identical
    for any mesh size (the DP-equivalence tests rely on this).
    """
    b, s, _ = sources.shape
    ids = example_offset + jnp.arange(b)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(rng, ids)

    def _per_example(src, key):
        k_gain, k_noise = jax.random.split(key)
        gains_db = jax.random.uniform(
            k_gain, (s, 1),
            minval=-data_cfg.gain_jitter_db, maxval=data_cfg.gain_jitter_db,
        )
        scaled = src * 10.0 ** (gains_db / 20.0)
        mixture = scaled.sum(axis=0)
        if data_cfg.num_noise > 0:
            sig_pow = jnp.mean(mixture**2)
            noise_pow = sig_pow / 10.0 ** (data_cfg.snr_db / 10.0)
            noise = jax.random.normal(k_noise, mixture.shape) * jnp.sqrt(noise_pow)
            mixture = mixture + noise
        return mixture, scaled

    return jax.vmap(_per_example)(sources, keys)
