"""Permutation-invariant training (PIT) matching (BASELINE.json:9).

Source separation has no canonical output ordering: estimate s may correspond
to any target t.  PIT evaluates the loss under every source permutation and
takes the per-example minimum; the winning permutation also aligns targets to
estimates for the adversarial term ("permutation-invariant adversarial + L1
loss", BASELINE.json:9).

TPU-first formulation: instead of S! full loss evaluations, compute the
(B, S, S) pairwise loss matrix once (vectorized, no python loops over the
batch), then contract it against the S! static permutations — S ∈ {2, 3}
per the contract, so S! ≤ 6 and the permutation enumeration is a tiny static
unroll; everything stays jit-compatible with static shapes.
"""

from __future__ import annotations

import itertools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gan_sass_tf_tpu.losses.recon import elem_loss


def permutations_for(num_sources: int) -> np.ndarray:
    """(S!, S) int array of all source permutations (static)."""
    return np.asarray(list(itertools.permutations(range(num_sources))), np.int32)


def pairwise_losses(
    est: jax.Array, tgt: jax.Array, kind: str
) -> jax.Array:
    """est, tgt: (B, S, ...) -> (B, S_est, S_tgt) mean loss per pair."""
    e = est[:, :, None]   # (B, S, 1, ...)
    t = tgt[:, None, :]   # (B, 1, S, ...)
    return elem_loss(e, t, kind, batch_dims=3)


def pit_loss(
    est: jax.Array,
    tgt: jax.Array,
    kind: str = "l1",
    pair_loss: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (loss (B,), perm (B, S)) where perm[b, s] is the target index
    matched to estimate s under the best permutation.  `pair_loss` may be
    passed to reuse a precomputed (B, S, S) matrix."""
    s = est.shape[1]
    pl_mat = pairwise_losses(est, tgt, kind) if pair_loss is None else pair_loss
    perms = permutations_for(s)                       # (P, S) static
    # loss under perm p: mean_s pl[b, s, perms[p, s]]
    per_perm = jnp.stack(
        [pl_mat[:, np.arange(s), perms[p]].mean(axis=-1) for p in range(len(perms))],
        axis=-1,
    )                                                  # (B, P)
    best = jnp.argmin(per_perm, axis=-1)               # (B,)
    loss = jnp.min(per_perm, axis=-1)                  # (B,)
    perm = jnp.asarray(perms)[best]                    # (B, S)
    return loss, perm


def pool4(x: jax.Array) -> jax.Array:
    """4x4 average-pool the trailing (T, K) grid of a (B, S, T, K) tensor.
    Tiny debug grids (T or K < 4) pass through unchanged: truncating to
    (t//4)*4 would yield an empty tensor whose mean() is NaN, silently
    collapsing the PIT argmin to permutation 0."""
    b_, s_, t_, k_ = x.shape
    if t_ < 4 or k_ < 4:
        return x
    t4, k4 = (t_ // 4) * 4, (k_ // 4) * 4
    x = x[:, :, :t4, :k4].reshape(b_, s_, t4 // 4, 4, k4 // 4, 4)
    return x.mean(axis=(3, 5))


def pooled_match_perm(est: jax.Array, tgt: jax.Array,
                      kind: str = "l1") -> jax.Array:
    """The train step's cheap PIT matching: best permutation argmin'd on a
    bf16, 4x4-average-pooled (T, K) grid — ~32x less matching traffic than
    the full-resolution f32 pairwise tensor, with unchanged permutation
    decisions (the matching statistic is a mean over the grid anyway;
    guarded by tests/test_losses.py pooled-vs-unpooled equivalence)."""
    _, perm = pit_loss(pool4(est).astype(jnp.bfloat16),
                       pool4(tgt).astype(jnp.bfloat16), kind)
    return perm


def align_to_perm(tgt: jax.Array, perm: jax.Array) -> jax.Array:
    """Reorder targets (B, S, ...) so tgt_aligned[b, s] = tgt[b, perm[b, s]]
    — i.e. target s now corresponds to estimate s."""
    return jnp.take_along_axis(
        tgt, perm.reshape(perm.shape + (1,) * (tgt.ndim - 2)), axis=1
    )
