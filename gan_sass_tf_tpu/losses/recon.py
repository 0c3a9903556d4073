"""Reconstruction losses (reference layer L4): L1 / MSE on magnitude
spectrograms or waveforms (BASELINE.json:5,9)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def elem_loss(est: jax.Array, tgt: jax.Array, kind: str, batch_dims: int = 1) -> jax.Array:
    """Elementwise loss reduced over all but the leading `batch_dims` axes."""
    axes = tuple(range(batch_dims, est.ndim))
    if kind == "l1":
        return jnp.mean(jnp.abs(est - tgt), axis=axes)
    if kind == "mse":
        return jnp.mean((est - tgt) ** 2, axis=axes)
    raise ValueError(f"unknown recon loss {kind!r}")


def recon_loss(est: jax.Array, tgt: jax.Array, kind: str) -> jax.Array:
    """Scalar reconstruction loss (mean over everything)."""
    return jnp.mean(elem_loss(est, tgt, kind, batch_dims=0))
