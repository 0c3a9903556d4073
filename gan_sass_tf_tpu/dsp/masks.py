"""Time-frequency mask application (reference layer L3, BASELINE.json:5,10).

Two mask families:
  * "magnitude": real mask in [0, 1] per source, multiplies the complex
    mixture STFT (phase passed through) — the classic spectral-masking
    formulation of the reference's generator.
  * "complex": complex ratio mask (real, imag) per source — the
    music_complex_44k workload (BASELINE.json:10).

Layouts:
  spec:  (..., F, K) complex       — mixture STFT
  masks: (..., S, F, K)            for magnitude
         (..., S, F, K, 2)         for complex (last axis = re, im)
  out:   (..., S, F, K) complex    — per-source separated STFTs
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_channels(mask_type: str) -> int:
    """Output channels per (source, T-F cell) the generator must emit."""
    if mask_type == "magnitude":
        return 1
    if mask_type == "complex":
        return 2
    raise ValueError(f"unknown mask_type {mask_type!r}")


def apply_mask(spec: jax.Array, masks: jax.Array, mask_type: str) -> jax.Array:
    """Apply per-source masks to the mixture STFT (broadcast over sources)."""
    spec_b = spec[..., None, :, :]  # (..., 1, F, K)
    if mask_type == "magnitude":
        return spec_b * masks.astype(spec.real.dtype)
    if mask_type == "complex":
        m = jax.lax.complex(
            masks[..., 0].astype(jnp.float32), masks[..., 1].astype(jnp.float32)
        )
        return spec_b * m
    raise ValueError(f"unknown mask_type {mask_type!r}")
