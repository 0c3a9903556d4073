"""Fused Pallas STFT kernel: framing + window + rDFT in one pass over
HBM-resident waveform batches (BASELINE.json:5; SURVEY.md §2.2, §7.3).

TPU mapping:
  * The DFT is a matmul against precomputed (n_fft, n_bins_pad) cosine/sine
    matrices with the analysis window folded in — the FLOPs land on the MXU
    (SURVEY.md §7.3: "matmul-DFT … MXU-friendly and likely faster at small
    N"), and n_fft ≤ 1024 keeps both matrices comfortably in VMEM
    (dispatch.py routes larger FFTs to the XLA path).
  * Framing is scatter/gather-free: the kernel DMAs a contiguous
    (TILE_F-1)·hop + n_fft sample span from HBM and assembles overlapping
    frames as r = n_fft/hop static shifted slices of the hop-chunk view —
    pure VPU data movement.
  * Grid = (batch, frame tiles); each step produces a (TILE_F, n_bins_pad)
    re/im block.

No VJP is defined: the STFT consumes input *data* (mixture/target
waveforms), and no parameter-gradient path flows into it (see
train/step.py); the differentiable half of the pipeline is istft
(pallas_istft.py), which has a custom VJP.
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
    """Windowed rDFT cos/sin matrices, pre-split into r = n_fft/hop
    (hop, k_pad) row-blocks → shape (r, hop, k_pad) float32.

    stft = Σ_j chunks[j : j+F] @ W[j] — the hop-chunk accumulation form of
    frames @ W with the analysis window folded in.  Pre-splitting avoids
    in-kernel row slices at non-tile-aligned offsets (Mosaic constraint).
    """
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
    wc3 = wc.reshape(r, hop, k_pad).astype(np.float32)
    ws3 = ws.reshape(r, hop, k_pad).astype(np.float32)
    return wc3, ws3


def _stft_kernel(x_hbm, wc_ref, ws_ref, re_ref, im_ref, chunks, sem,
                 *, tile_f: int, hop: int, n_fft: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    r = n_fft // hop
    n_chunks = tile_f - 1 + r
    # One DMA: the contiguous hop-chunk span covering this frame tile.
    chunk0 = pl.multiple_of(i * tile_f, tile_f)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(chunk0, n_chunks), :], chunks, sem
    )
    copy.start()
    copy.wait()
    # stft tile = Σ_j chunks[j : j+tile_f] @ W[j]: the row shift j is
    # realized as pltpu.roll + leading slice (offset-0, Mosaic-safe); the
    # per-j weight blocks come pre-split so no misaligned matrix slices.
    acc_re = None
    acc_im = None
    for j in range(r):
        # roll up by j == roll down by n_chunks - j (shift must be ≥ 0)
        cj = chunks[:] if j == 0 else pltpu.roll(
            chunks[:], shift=n_chunks - j, axis=0
        )
        cj = cj[:tile_f]                                   # (tile_f, hop)
        pre = jnp.dot(cj, wc_ref[j], preferred_element_type=jnp.float32)
        pim = jnp.dot(cj, ws_ref[j], preferred_element_type=jnp.float32)
        acc_re = pre if acc_re is None else acc_re + pre
        acc_im = pim if acc_im is None else acc_im + pim
    re_ref[0] = acc_re
    im_ref[0] = acc_im


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
    n_chunks_tile = tile_f - 1 + r

    b = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(b, t).astype(jnp.float32)
    # Pad so every tile's sample span is in range, then view as hop-chunks.
    t_need = (f_pad - 1) * hop + n_fft
    x2 = jnp.pad(x2, ((0, 0), (0, t_need - t)))
    x3 = x2.reshape(b, t_need // hop, hop)

    wc, ws = _dft_matrices(n_fft, hop, window, k_pad)
    grid = (b, f_pad // tile_f)
    kernel = functools.partial(
        _stft_kernel, tile_f=tile_f, hop=hop, n_fft=n_fft
    )
    re, im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Waveform stays in HBM (ANY may pick VMEM, whose tiled layout
            # forbids the 64-lane chunk slices); the kernel DMAs spans out.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((r, hop, k_pad), lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, hop, k_pad), lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_f, k_pad), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_f, k_pad), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, f_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, f_pad, k_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_chunks_tile, hop), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * f_pad * n_fft * k_pad,
            bytes_accessed=b * t_need * 4 + 2 * b * f_pad * k_pad * 4,
            transcendentals=0,
        ),
    )(x3, jnp.asarray(wc), jnp.asarray(ws))
    spec = jax.lax.complex(re[:, :f, :n_bins], im[:, :f, :n_bins])
    return spec.reshape(*lead, f, n_bins)
