"""Evaluation metrics — SI-SDR, the contract quality metric
(BASELINE.json:2: "SI-SDR on 2-speaker mixes")."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_sass_tf_tpu.losses.pit import permutations_for

import numpy as np


def si_sdr(est: jax.Array, tgt: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Scale-invariant SDR in dB over the last axis; leading dims broadcast.

    si_sdr = 10 log10(||s_target||² / ||e||²) with s_target the projection of
    the estimate onto the reference (zero-mean convention).
    """
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    tgt = tgt - jnp.mean(tgt, axis=-1, keepdims=True)
    dot = jnp.sum(est * tgt, axis=-1, keepdims=True)
    energy = jnp.sum(tgt * tgt, axis=-1, keepdims=True)
    s_target = dot / (energy + eps) * tgt
    e_noise = est - s_target
    ratio = jnp.sum(s_target**2, axis=-1) / (jnp.sum(e_noise**2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


def pit_si_sdr(est: jax.Array, tgt: jax.Array) -> jax.Array:
    """(B, S, T) est/tgt -> (B,) best-permutation mean SI-SDR (dB).

    The standard separation eval: match estimates to references by the
    permutation maximizing mean SI-SDR (SURVEY.md §3.5)."""
    s = est.shape[1]
    # pairwise (B, S, S) SI-SDR
    pw = si_sdr(est[:, :, None], tgt[:, None, :])
    perms = permutations_for(s)
    per_perm = jnp.stack(
        [pw[:, np.arange(s), perms[p]].mean(axis=-1) for p in range(len(perms))],
        axis=-1,
    )
    return jnp.max(per_perm, axis=-1)
