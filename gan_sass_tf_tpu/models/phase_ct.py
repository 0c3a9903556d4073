"""Phase-decomposed transposed convolution (round-5 HBM/vector-unit lever).

``flax.linen.ConvTranspose(features, (kt, kf), strides=(st, sf), 'SAME')``
lowers to ``lax.conv_general_dilated(..., lhs_dilation=strides)``.  On TPU,
XLA computes that op's KERNEL-gradient by materializing ``pad`` then
``reverse`` of the full-grid output-cotangent — at the music geometry these
are 268 MB bf16 tensors per decoder level, and the round-5 bytes ledger +
profile attribute ~1.5 GB/step of pure data movement and ~10M vector-unit
cycles to them (scripts/bytes_ledger.py; BASELINE.md round 5).

``PhaseConvTranspose`` computes the SAME function from the SAME
``(kt, kf, cin, cout)`` parameter by regrouping kernel taps per output
phase:

    y[s·t + p] = sum_d  x[t + d] · W[s·d − p + pad_a]      (per dim)

i.e. ONE stride-1 convolution whose assembled kernel holds each phase's
sub-taps in ``st·sf·cout`` output channels (absent taps zero-filled),
followed by a depth-to-space interleave.  Autodiff of this form produces
only stride-1 conv gradients — no lhs-dilation, hence no materialized
pad+reverse of activation-sized tensors in the backward.

Function-class EXACT vs. flax ConvTranspose: same parameter shape, same
init distribution, same math (tests/test_models.py asserts numerical
equality of outputs and of input/kernel gradients).  The zero-filled taps
add MACs (e.g. 16/9 per dim-pair at k=3, s=2) — a good trade while the MXU
idles at ~23% on the presets this targets.

`pad_a` follows ``jax.lax.conv_transpose``'s SAME-padding rule so the phase
alignment matches flax exactly.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _same_pad_a(k: int, s: int) -> int:
    """Left padding lax.conv_transpose applies to the dilated input for
    padding='SAME' (output length = input length * stride)."""
    pad_len = k + s - 2
    if s > k - 1:
        return k - 1
    return int(math.ceil(pad_len / 2))


def _phase_plan(k: int, s: int):
    """Per-dim tap plan: for each phase p and kernel tap k_idx, the input
    offset d with k_idx = s*d - p + pad_a.  Returns (d_min, n_taps,
    [(p, j, k_idx)]) with j = d - d_min the assembled-kernel position."""
    pad_a = _same_pad_a(k, s)
    entries = []
    d_lo, d_hi = None, None
    for p in range(s):
        d_min_p = math.ceil((p - pad_a) / s)
        d_max_p = math.floor((k - 1 + p - pad_a) / s)
        for d in range(d_min_p, d_max_p + 1):
            k_idx = s * d - p + pad_a
            assert 0 <= k_idx < k
            entries.append((p, d, k_idx))
            d_lo = d if d_lo is None else min(d_lo, d)
            d_hi = d if d_hi is None else max(d_hi, d)
    n_taps = d_hi - d_lo + 1
    return d_lo, n_taps, [(p, d - d_lo, k_idx) for p, d, k_idx in entries]


class PhaseConvTranspose(nn.Module):
    """Drop-in for nn.ConvTranspose(features, kernel_size, strides, 'SAME')
    with NHWC inputs — same parameters, phase-decomposed compute."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (2, 2)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kf = self.kernel_size
        st, sf = self.strides
        cin, cout = x.shape[-1], self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kf, cin, cout), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (cout,),
                           jnp.float32) if self.use_bias else None)

        dt_lo, jt, t_plan = _phase_plan(kt, st)
        df_lo, jf, f_plan = _phase_plan(kf, sf)

        # Assemble the phase kernel (jt, jf, cin, st*sf*cout).  Static
        # Python loops over <= (kt+s)·(kf+s) tiny slice-assignments; XLA
        # folds them — the assembled kernel is built once per step from the
        # canonical (kt, kf, cin, cout) parameter, so optimizer state and
        # checkpoints stay in ConvTranspose form.
        big = jnp.zeros((jt, jf, cin, st * sf * cout), kernel.dtype)
        for pt, jt_i, kt_i in t_plan:
            for pf, jf_i, kf_i in f_plan:
                ch0 = (pt * sf + pf) * cout
                big = big.at[jt_i, jf_i, :, ch0:ch0 + cout].set(
                    kernel[kt_i, kf_i])

        x = x.astype(self.dtype)
        big = big.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, big, window_strides=(1, 1),
            padding=((-dt_lo, jt - 1 + dt_lo), (-df_lo, jf - 1 + df_lo)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, t, f, _ = y.shape
        y = y.reshape(b, t, f, st, sf, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, t * st, f * sf, cout)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y
