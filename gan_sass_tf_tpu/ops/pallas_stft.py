"""Fused Pallas STFT kernel: framing + window + rDFT over HBM-resident
waveform batches (BASELINE.json:5; SURVEY.md §2.2, §7.3).

TPU mapping:
  * The rDFT is a matmul against precomputed windowed cosine/sine matrices —
    the FLOPs land on the MXU (SURVEY.md §7.3: "matmul-DFT … MXU-friendly
    and likely faster at small N"), and n_fft ≤ 1024 keeps the matrices in
    VMEM (dispatch.py routes larger FFTs to the XLA path).
  * Framing is gather/scatter/DMA-free: stft = Σ_j chunks[f+j] @ W[j] over
    the r = n_fft/hop hop-chunk shifts.  The r shifted chunk views are
    built by XLA (static slices of the hop-chunk waveform view — trailing
    r-1 extra rows, ~free) and fed through an accumulation grid axis; the
    kernel is a pure aligned-block matmul-accumulate, auto-pipelined by
    Pallas.  (Manual HBM DMA at frame granularity faults this environment's
    TPU worker — see verify skill notes — and is deliberately avoided.)
  * Grid = (batch, frame tiles, r) with the output block revisited across
    the innermost reduction axis.

No VJP is defined: the STFT consumes input *data* (mixture/target
waveforms) and no parameter-gradient path flows into it (see train/step.py);
the differentiable half is istft (pallas_istft.py), which has a custom VJP.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gan_sass_tf_tpu.dsp.windows import get_window


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=16)
def _dft_matrices(n_fft: int, hop: int, window: str, k_pad: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed rDFT cos/sin matrices pre-split into r = n_fft/hop
    (hop, k_pad) row-blocks → (r, hop, k_pad) float32, so the kernel's
    per-shift matmul needs no misaligned matrix slices."""
    n_bins = n_fft // 2 + 1
    r = n_fft // hop
    w = get_window(window, n_fft).astype(np.float64)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    wc = np.zeros((n_fft, k_pad), np.float64)
    ws = np.zeros((n_fft, k_pad), np.float64)
    wc[:, :n_bins] = np.cos(ang) * w[:, None]
    ws[:, :n_bins] = -np.sin(ang) * w[:, None]
    return (
        wc.reshape(r, hop, k_pad).astype(np.float32),
        ws.reshape(r, hop, k_pad).astype(np.float32),
    )


def _stft_features_kernel(*refs, r: int, emit: Tuple[str, ...],
                          has_mel: bool, eps: float):
    """Accumulate re/im in VMEM scratch over the j reduction axis; at the
    last j, spill only the requested outputs (spec planes / |X| / log|X| /
    log-mel) — features are computed while the tile is still in VMEM, so
    non-emitted intermediates never touch HBM (the train step is HBM-bound
    and, for magnitude masks, needs no complex spectrum at all)."""
    n_in = 3 + (1 if has_mel else 0)
    x_ref, wc_ref, ws_ref = refs[0], refs[1], refs[2]
    mel_ref = refs[3] if has_mel else None
    out_refs = list(refs[n_in:-2])
    re_acc, im_acc = refs[-2], refs[-1]            # VMEM scratch
    j = pl.program_id(2)
    cj = x_ref[0, 0]
    pre = jnp.dot(cj, wc_ref[0], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    pim = jnp.dot(cj, ws_ref[0], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == 0)
    def _():
        re_acc[:] = pre
        im_acc[:] = pim

    @pl.when(j > 0)
    def _():
        re_acc[:] += pre
        im_acc[:] += pim

    @pl.when(j == r - 1)
    def _():
        re, im = re_acc[:], im_acc[:]
        idx = 0
        if "spec" in emit:
            out_refs[idx][0] = re
            out_refs[idx + 1][0] = im
            idx += 2
        if {"mag", "logmag", "logmel"} & set(emit):
            mag = jnp.sqrt(re * re + im * im)
        if "mag" in emit:
            out_refs[idx][0] = mag
            idx += 1
        if "logmag" in emit:
            out_refs[idx][0] = jnp.log(mag + eps)
            idx += 1
        if "logmel" in emit:
            mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            out_refs[idx][0] = jnp.log(mel + eps)


def stft_features_pallas(
    x: jax.Array,
    n_fft: int,
    hop: int,
    window: str = "hann",
    emit: Tuple[str, ...] = ("spec",),
    mel_matrix=None,
    eps: float = 1e-8,
):
    """Fused STFT + feature extraction: one kernel emits any subset of
    {"spec", "mag", "logmag", "logmel"} (dict result).  Semantics match the
    dsp/ oracle chain stft → abs → log(·+eps) → (|X| @ mel, log)."""
    if n_fft % hop != 0:
        raise ValueError("pallas stft requires hop | n_fft")
    for e in emit:
        if e not in ("spec", "mag", "logmag", "logmel"):
            raise ValueError(f"unknown emit {e!r}")
    has_mel = "logmel" in emit
    if has_mel and mel_matrix is None:
        raise ValueError("logmel requires mel_matrix")
    *lead, t = x.shape
    f = 1 + (t - n_fft) // hop
    if f < 1:
        raise ValueError(f"signal ({t}) shorter than n_fft ({n_fft})")
    n_bins = n_fft // 2 + 1
    k_pad = _round_up(n_bins, 128)
    tile_f = 128 if f >= 128 else _round_up(f, 8)
    f_pad = _round_up(f, tile_f)
    r = n_fft // hop

    b = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(b, t).astype(jnp.float32)
    t_need = (f_pad - 1) * hop + n_fft
    x2 = jnp.pad(x2, ((0, 0), (0, t_need - t)))
    chunks = x2.reshape(b, t_need // hop, hop)
    xs = jnp.stack([chunks[:, j : j + f_pad, :] for j in range(r)])

    wc, ws = _dft_matrices(n_fft, hop, window, k_pad)
    inputs = [xs, jnp.asarray(wc), jnp.asarray(ws)]
    in_specs = [
        pl.BlockSpec((1, 1, tile_f, hop), lambda b_, i, j: (j, b_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hop, k_pad), lambda b_, i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hop, k_pad), lambda b_, i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    m_pad = 0
    if has_mel:
        n_mels = mel_matrix.shape[1]
        m_pad = _round_up(n_mels, 128)
        mel_p = jnp.zeros((k_pad, m_pad), jnp.float32)
        mel_p = mel_p.at[:n_bins, :n_mels].set(jnp.asarray(mel_matrix))
        inputs.append(mel_p)
        in_specs.append(
            pl.BlockSpec((k_pad, m_pad), lambda b_, i, j: (0, 0),
                         memory_space=pltpu.VMEM)
        )

    n_outs = (2 if "spec" in emit else 0) + ("mag" in emit) + \
        ("logmag" in emit) + ("logmel" in emit)
    out_spec_k = lambda width: pl.BlockSpec(
        (1, tile_f, width), lambda b_, i, j: (b_, i, 0),
        memory_space=pltpu.VMEM)
    out_specs, out_shapes = [], []
    for _ in range(n_outs - (1 if has_mel else 0)):
        out_specs.append(out_spec_k(k_pad))
        out_shapes.append(jax.ShapeDtypeStruct((b, f_pad, k_pad), jnp.float32))
    if has_mel:
        out_specs.append(out_spec_k(m_pad))
        out_shapes.append(jax.ShapeDtypeStruct((b, f_pad, m_pad), jnp.float32))

    kernel = functools.partial(
        _stft_features_kernel, r=r, emit=tuple(emit), has_mel=has_mel, eps=eps
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b, f_pad // tile_f, r),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((tile_f, k_pad), jnp.float32),
            pltpu.VMEM((tile_f, k_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * f_pad * n_fft * k_pad,
            bytes_accessed=b * t_need * 4 * r + n_outs * b * f_pad * k_pad * 4,
            transcendentals=b * f_pad * k_pad,
        ),
    )(*inputs)
    outs = list(outs) if isinstance(outs, (list, tuple)) else [outs]

    def crop(a, width):
        return a[:, :f, :width].reshape(*lead, f, width)

    result = {}
    idx = 0
    if "spec" in emit:
        result["spec"] = jax.lax.complex(
            crop(outs[idx], n_bins), crop(outs[idx + 1], n_bins)
        )
        idx += 2
    if "mag" in emit:
        result["mag"] = crop(outs[idx], n_bins)
        idx += 1
    if "logmag" in emit:
        result["logmag"] = crop(outs[idx], n_bins)
        idx += 1
    if "logmel" in emit:
        result["logmel"] = crop(outs[idx], mel_matrix.shape[1])
    return result


def _stft_kernel(x_ref, wc_ref, ws_ref, re_ref, im_ref):
    j = pl.program_id(2)
    cj = x_ref[0, 0]                                       # (tile_f, hop)
    # Full f32 matmul precision: the MXU's default bf16 passthrough costs
    # ~2e-3 relative error — outside the contract's STFT tolerance
    # (BASELINE.json:5); SURVEY.md §7.3 mandates pinned f32 on this path.
    pre = jnp.dot(cj, wc_ref[0], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    pim = jnp.dot(cj, ws_ref[0], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == 0)
    def _():
        re_ref[0] = pre
        im_ref[0] = pim

    @pl.when(j > 0)
    def _():
        re_ref[0] += pre
        im_ref[0] += pim


def stft_pallas(x: jax.Array, n_fft: int, hop: int, window: str = "hann") -> jax.Array:
    """(..., T) float32 -> (..., F, n_fft//2+1) complex64; same semantics as
    dsp.stft (the XLA oracle it is tested against to STFT tolerance)."""
    if n_fft % hop != 0:
        raise ValueError("pallas stft requires hop | n_fft")
    *lead, t = x.shape
    f = 1 + (t - n_fft) // hop
    if f < 1:
        raise ValueError(f"signal ({t}) shorter than n_fft ({n_fft})")
    n_bins = n_fft // 2 + 1
    k_pad = _round_up(n_bins, 128)
    tile_f = 128 if f >= 128 else _round_up(f, 8)
    f_pad = _round_up(f, tile_f)
    r = n_fft // hop

    b = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(b, t).astype(jnp.float32)
    t_need = (f_pad - 1) * hop + n_fft
    x2 = jnp.pad(x2, ((0, 0), (0, t_need - t)))
    chunks = x2.reshape(b, t_need // hop, hop)             # (b, f_pad-1+r, hop)
    # r shifted chunk views (XLA static slices): shift j rows → frame f's
    # j-th hop-chunk sits at row f.
    xs = jnp.stack([chunks[:, j : j + f_pad, :] for j in range(r)])

    wc, ws = _dft_matrices(n_fft, hop, window, k_pad)
    grid = (b, f_pad // tile_f, r)
    re, im = pl.pallas_call(
        _stft_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tile_f, hop), lambda b_, i, j: (j, b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hop, k_pad), lambda b_, i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hop, k_pad), lambda b_, i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_f, k_pad), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_f, k_pad), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, f_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, f_pad, k_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * f_pad * n_fft * k_pad,
            bytes_accessed=b * t_need * 4 * r + 2 * b * f_pad * k_pad * 4,
            transcendentals=0,
        ),
    )(xs, jnp.asarray(wc), jnp.asarray(ws))
    spec = jax.lax.complex(re[:, :f, :n_bins], im[:, :f, :n_bins])
    return spec.reshape(*lead, f, n_bins)
