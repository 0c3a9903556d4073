"""Fused Pallas iSTFT kernel: inverse rDFT (matmul) + synthesis window +
scatter-free overlap-add + least-squares normalization in one pass
(BASELINE.json:5 "fused mask-apply + irFFT + windowed overlap-add";
SURVEY.md §7.3 names overlap-add tiling as a hard part — solved here by the
diagonal-sum formulation: frames reshape to (F, r, hop) hop-chunks and the r
diagonals accumulate into (F+r-1, hop) rows with static shifted adds, no
scatter).

Differentiation: wav-domain reconstruction losses backprop through iSTFT, so
the op carries a custom VJP (real-in/real-out on (re, im) planes to sidestep
complex-cotangent conventions).  The backward pass is the adjoint — frame
the (env-normalized) cotangent waveform, window it, multiply by the same DFT
matrices transposed — and runs as plain XLA (matmuls on MXU anyway).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gan_sass_tf_tpu.dsp.stft import frame_signal
from gan_sass_tf_tpu.dsp.windows import cola_norm, get_window, safe_inv_env


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=16)
def _idft_matrices(n_fft: int, window: str, k_pad: int) -> Tuple[np.ndarray, np.ndarray]:
    """(k_pad, n_fft) windowed inverse-rDFT matrices: frames_t = re@Ci + im@Si
    reproduces irfft (with hermitian bin weighting) times the synthesis
    window (folded in along the n axis)."""
    n_bins = n_fft // 2 + 1
    w = get_window(window, n_fft).astype(np.float64)
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    a = np.full((n_bins, 1), 2.0 / n_fft)
    a[0, 0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        a[-1, 0] = 1.0 / n_fft
    ci = np.zeros((k_pad, n_fft), np.float64)
    si = np.zeros((k_pad, n_fft), np.float64)
    ci[:n_bins] = a * np.cos(ang) * w[None, :]
    si[:n_bins] = -a * np.sin(ang) * w[None, :]
    return ci.astype(np.float32), si.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _idft_matrices_split(n_fft: int, hop: int, window: str, k_pad: int) -> Tuple[np.ndarray, np.ndarray]:
    """Kernel form: (r, k_pad, hop) column-blocks of Ci/Si so the per-j
    hop-chunk matmul needs no misaligned lane slices in Mosaic."""
    ci, si = _idft_matrices(n_fft, window, k_pad)
    r = n_fft // hop
    ci3 = np.ascontiguousarray(
        ci.reshape(k_pad, r, hop).transpose(1, 0, 2)
    )
    si3 = np.ascontiguousarray(
        si.reshape(k_pad, r, hop).transpose(1, 0, 2)
    )
    return ci3, si3


def _istft_kernel(re_ref, im_ref, ci_ref, si_ref, env_ref, out_ref,
                  *, n_frames: int, hop: int, n_fft: int):
    r = n_fft // hop
    # Per-hop-chunk matmuls (pre-split matrices) + diagonal overlap-add into
    # (F + r - 1, hop) rows.  Row shifts = trailing zero-pad + pltpu.roll —
    # Mosaic cannot lay out leading-offset pads/concats on the sublane axis,
    # and lane slices must be 128-aligned (hop may be 64).
    re = re_ref[0]
    im = im_ref[0]
    acc = None
    for j in range(r):
        # f32 matmul precision — see pallas_stft._stft_kernel.
        cj = jnp.dot(re, ci_ref[j], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        cj += jnp.dot(im, si_ref[j], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        cj = jnp.pad(cj, ((0, r - 1), (0, 0)))             # (nrows, hop)
        cj = pltpu.roll(cj, shift=j, axis=0) if j else cj
        acc = cj if acc is None else acc + cj
    out_ref[0] = acc * env_ref[:]        # env holds 1 / Σ w² (precomputed)


def _istft_ri_fwd_impl(re: jax.Array, im: jax.Array, n_fft: int, hop: int,
                       window: str, env: str = "full") -> jax.Array:
    """(B, F, K_pad-unpadded K) real/imag planes -> (B, out_len) waveforms.

    env="full": least-squares normalization by the overlap-added squared
    window (the default).  env="none": raw windowed overlap-add — used by
    the phased sub-128-hop decomposition in ops.dispatch, which combines
    several phase outputs first and applies the TRUE hop-level envelope
    once at the end."""
    b, f, n_bins = re.shape
    k_pad = _round_up(n_bins, 128)
    re_p = jnp.pad(re, ((0, 0), (0, 0), (0, k_pad - n_bins)))
    im_p = jnp.pad(im, ((0, 0), (0, 0), (0, k_pad - n_bins)))
    ci, si = _idft_matrices_split(n_fft, hop, window, k_pad)
    w = get_window(window, n_fft)
    r = n_fft // hop
    nrows = f + r - 1
    if env == "none":
        inv_env = np.ones((nrows, hop), np.float32)
    else:
        inv_env = safe_inv_env(cola_norm(w, hop, f)).reshape(nrows, hop)
    kernel = functools.partial(_istft_kernel, n_frames=f, hop=hop, n_fft=n_fft)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, f, k_pad), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, k_pad), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k_pad, hop), lambda b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k_pad, hop), lambda b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrows, hop), lambda b_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nrows, hop), lambda b_: (b_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nrows, hop), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * f * k_pad * n_fft,
            bytes_accessed=2 * b * f * k_pad * 4 + b * nrows * hop * 4,
            transcendentals=0,
        ),
    )(re_p, im_p, jnp.asarray(ci), jnp.asarray(si), jnp.asarray(inv_env))
    return out.reshape(b, nrows * hop)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _istft_ri(re, im, n_fft, hop, window, env="full"):
    return _istft_ri_fwd_impl(re, im, n_fft, hop, window, env)


def _istft_ri_fwd(re, im, n_fft, hop, window, env="full"):
    return _istft_ri_fwd_impl(re, im, n_fft, hop, window, env), re.shape


def _istft_ri_bwd(n_fft, hop, window, env, res, dy):
    """Adjoint of y = OLA(w · irdft(re, im)) / env:
    dframes = frame(dy / env) · w;  dre = dframes @ Ciᵀ, dim = dframes @ Siᵀ
    (window already folded into Ci/Si).  Runs as XLA — matmuls hit the MXU."""
    shape = res
    b, f, n_bins = shape
    k_pad = _round_up(n_bins, 128)
    w = get_window(window, n_fft)
    if env == "none":
        dy_n = dy
    else:
        dy_n = dy * jnp.asarray(safe_inv_env(cola_norm(w, hop, f)))
    dframes = frame_signal(dy_n, n_fft, hop)          # (B, F, n_fft)
    ci, si = _idft_matrices(n_fft, window, k_pad)
    dre = jnp.matmul(dframes, jnp.asarray(ci.T),
                     precision=jax.lax.Precision.HIGHEST)
    dim = jnp.matmul(dframes, jnp.asarray(si.T),
                     precision=jax.lax.Precision.HIGHEST)
    return dre[..., :n_bins], dim[..., :n_bins]


_istft_ri.defvjp(_istft_ri_fwd, _istft_ri_bwd)


def _masked_istft_kernel(re_ref, im_ref, m_ref, ci_ref, si_ref, env_ref,
                         out_ref, *, n_frames: int, hop: int, n_fft: int,
                         num_sources: int, complex_mask: bool):
    """Fused mask-apply + inverse rDFT + windowed overlap-add
    (BASELINE.json:5).  Grid runs over (batch·source); the mixture spectrum
    block is shared across the source axis via the index map."""
    r = n_fft // hop
    re, im = re_ref[0], im_ref[0]
    if complex_mask:
        mr, mi = m_ref[0, 0, ..., 0], m_ref[0, 0, ..., 1]
        mre = mr * re - mi * im
        mim = mr * im + mi * re
    else:
        m = m_ref[0, 0]
        mre = m * re
        mim = m * im
    acc = None
    for j in range(r):
        cj = jnp.dot(mre, ci_ref[j], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        cj += jnp.dot(mim, si_ref[j], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        cj = jnp.pad(cj, ((0, r - 1), (0, 0)))
        cj = pltpu.roll(cj, shift=j, axis=0) if j else cj
        acc = cj if acc is None else acc + cj
    out_ref[0] = acc * env_ref[:]


def masked_istft_pallas(
    spec: jax.Array,
    masks: jax.Array,
    n_fft: int,
    hop: int,
    window: str = "hann",
    mask_type: str = "magnitude",
    length: Optional[int] = None,
    env: str = "full",
) -> jax.Array:
    """Mixture STFT (..., F, K) + masks (..., S, F, K[, 2]) -> separated
    wavs (..., S, T) in ONE kernel — the separated complex spectra are never
    materialized in HBM.  Inference path (no VJP; training's wav-domain loss
    uses apply_mask + istft_pallas, which differentiates)."""
    if n_fft % hop != 0:
        raise ValueError("pallas istft requires hop | n_fft")
    complex_mask = mask_type == "complex"
    *lead, f, n_bins = spec.shape
    s = masks.shape[len(lead)]
    if n_bins != n_fft // 2 + 1:
        raise ValueError(f"expected {n_fft//2+1} bins, got {n_bins}")
    b = int(np.prod(lead)) if lead else 1
    k_pad = _round_up(n_bins, 128)
    pad_k = ((0, 0), (0, 0), (0, k_pad - n_bins))
    re = jnp.pad(jnp.real(spec).reshape(b, f, n_bins), pad_k).astype(jnp.float32)
    im = jnp.pad(jnp.imag(spec).reshape(b, f, n_bins), pad_k).astype(jnp.float32)
    m_shape = (b, s, f, n_bins) + ((2,) if complex_mask else ())
    pad_m = ((0, 0), (0, 0), (0, 0), (0, k_pad - n_bins)) + (
        ((0, 0),) if complex_mask else ())
    masks_p = jnp.pad(masks.reshape(m_shape), pad_m).astype(jnp.float32)

    ci, si = _idft_matrices_split(n_fft, hop, window, k_pad)
    w = get_window(window, n_fft)
    r = n_fft // hop
    nrows = f + r - 1
    if env == "none":
        inv_env = np.ones((nrows, hop), np.float32)
    else:
        inv_env = safe_inv_env(cola_norm(w, hop, f)).reshape(nrows, hop)

    m_block = (1, 1, f, k_pad) + ((2,) if complex_mask else ())
    m_index = (lambda i: (i // s, i % s, 0, 0, 0)) if complex_mask else (
        lambda i: (i // s, i % s, 0, 0))
    kernel = functools.partial(
        _masked_istft_kernel, n_frames=f, hop=hop, n_fft=n_fft,
        num_sources=s, complex_mask=complex_mask,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * s,),
        in_specs=[
            pl.BlockSpec((1, f, k_pad), lambda i: (i // s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, k_pad), lambda i: (i // s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(m_block, m_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k_pad, hop), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k_pad, hop), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrows, hop), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nrows, hop), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * s, nrows, hop), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * s * f * k_pad * n_fft,
            bytes_accessed=(2 * b + b * s) * f * k_pad * 4
            + b * s * nrows * hop * 4,
            transcendentals=0,
        ),
    )(re, im, masks_p, jnp.asarray(ci), jnp.asarray(si), jnp.asarray(inv_env))
    y = out.reshape(b, s, nrows * hop)
    out_len = (f - 1) * hop + n_fft
    y = y[..., :out_len]
    if length is not None:
        y = y[..., :length]
    return y.reshape(*lead, s, y.shape[-1])


def istft_pallas(spec: jax.Array, n_fft: int, hop: int, window: str = "hann",
                 length: Optional[int] = None, env: str = "full") -> jax.Array:
    """(..., F, n_bins) complex -> (..., T) float32; same least-squares
    semantics as dsp.istft(norm="global"), fused on TPU."""
    if n_fft % hop != 0:
        raise ValueError("pallas istft requires hop | n_fft")
    *lead, f, n_bins = spec.shape
    if n_bins != n_fft // 2 + 1:
        raise ValueError(f"expected {n_fft//2+1} bins, got {n_bins}")
    b = int(np.prod(lead)) if lead else 1
    re = jnp.real(spec).reshape(b, f, n_bins).astype(jnp.float32)
    im = jnp.imag(spec).reshape(b, f, n_bins).astype(jnp.float32)
    y = _istft_ri(re, im, n_fft, hop, window, env)
    out_len = (f - 1) * hop + n_fft
    y = y[:, :out_len]
    if length is not None:
        y = y[:, :length]
    return y.reshape(*lead, y.shape[-1])
