"""Adversarial losses for the alternating G/D step (BASELINE.json:5).

Three standard variants behind one string key:
    "ns"    — non-saturating logistic (BCE): the original GAN formulation
    "lsgan" — least-squares GAN (default: stable for spectrogram D stacks)
    "hinge" — hinge loss

All functions take raw logits and return scalars (mean over the batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _softplus(x):
    return jax.nn.softplus(x)


def gan_d_loss(real_logits: jax.Array, fake_logits: jax.Array, kind: str) -> jax.Array:
    if kind == "ns":
        return jnp.mean(_softplus(-real_logits)) + jnp.mean(_softplus(fake_logits))
    if kind == "lsgan":
        return 0.5 * (
            jnp.mean((real_logits - 1.0) ** 2) + jnp.mean(fake_logits**2)
        )
    if kind == "hinge":
        return jnp.mean(jax.nn.relu(1.0 - real_logits)) + jnp.mean(
            jax.nn.relu(1.0 + fake_logits)
        )
    raise ValueError(f"unknown gan loss {kind!r}")


def gan_g_loss(fake_logits: jax.Array, kind: str) -> jax.Array:
    if kind == "ns":
        return jnp.mean(_softplus(-fake_logits))
    if kind == "lsgan":
        return 0.5 * jnp.mean((fake_logits - 1.0) ** 2)
    if kind == "hinge":
        return -jnp.mean(fake_logits)
    raise ValueError(f"unknown gan loss {kind!r}")
