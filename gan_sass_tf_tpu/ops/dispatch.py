"""Backend dispatch for the DSP hot ops (SURVEY.md §7.1 step 8).

Selection order for backend="auto": fused Pallas kernels when running on TPU
and the geometry fits the kernel's constraints; otherwise the pure-XLA path
(which is also the numerical oracle in tests).  A global override supports
A/B benchmarking:

    with force_backend("xla"): ...
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax

from gan_sass_tf_tpu.dsp.stft import istft as _xla_istft, stft as _xla_stft

_FORCED: Optional[str] = None


@contextlib.contextmanager
def force_backend(name: Optional[str]):
    """Force 'xla' or 'pallas' for all dispatched ops within the context."""
    global _FORCED
    prev, _FORCED = _FORCED, name
    try:
        yield
    finally:
        _FORCED = prev


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def _have_pallas_kernels() -> bool:
    import importlib.util

    return importlib.util.find_spec("gan_sass_tf_tpu.ops.pallas_stft") is not None


# VMEM envelope of the matmul-DFT kernels: the (r, hop, K) cos/sin matrix
# pair is ~2 * n_fft * (n_fft/2+1) * 4 bytes; past 1024 it no longer fits
# alongside the pipeline buffers (n_fft 2048 → ~19 MB) and a submitted
# kernel faults the TPU worker (see CLAUDE.md) — validate BEFORE pallas_call.
_PALLAS_MAX_NFFT = 1024

# The iSTFT-side kernels (pallas_istft.py) grid over batch×source only and
# stage the WHOLE frame axis per grid cell (the diagonal OLA needs its
# neighbours resident); their VMEM footprint therefore grows linearly with
# n_frames.  The STFT-side kernels tile frames (tile_f) and are
# length-independent.  Past the scoped-VMEM limit the TPU compiler rejects
# the kernel ("Ran out of memory in memory space vmem" — observed round 5
# at a 2 215-frame one-shot stream separate, 28.1 M vs the 16 M cap), so
# auto-routes long inputs to the XLA path instead of submitting them.
_ISTFT_VMEM_CAP_BYTES = 12 * 2**20  # conservative vs the 16 M scoped limit


def _istft_vmem_bytes(f: int, n_fft: int, hop: int) -> int:
    """Rough (deliberately conservative) estimate of the masked-iSTFT
    kernel's per-grid-cell VMEM: double-buffered spec (Cr, Ci) + mask blocks
    of (f, k_pad) f32, DFT matrices, env + output rows.  Within ~15% of the
    compiler's scoped-allocation report at the observed failure geometry."""
    k_pad = -(-(n_fft // 2 + 1) // 128) * 128
    r = max(n_fft // hop, 1)
    spec_mask = 3 * f * k_pad * 4          # Cr + Ci + one source's mask
    dft = 2 * r * k_pad * hop * 4
    rows = 2 * (f + r) * hop * 4           # inv-env + output
    return 2 * spec_mask + dft + 2 * rows  # ×2 = pipeline double-buffering


def _check_pallas_geometry(n_fft: int, hop: int,
                           n_frames: Optional[int] = None) -> None:
    """Raise a clean ValueError when an explicitly-requested Pallas backend
    (config dsp.backend="pallas" or force_backend) is outside the envelope
    the kernels were built for (VERDICT r2 item 4: a user-reachable config
    value must never submit a geometry that can crash the TPU worker)."""
    problems = []
    if n_fft > _PALLAS_MAX_NFFT:
        problems.append(
            f"n_fft={n_fft} > {_PALLAS_MAX_NFFT} (DFT matrices exceed VMEM)"
        )
    if n_fft % hop != 0:
        problems.append(f"n_fft={n_fft} not divisible by hop={hop}")
    if hop % 128 != 0 and 128 % hop != 0:
        problems.append(
            f"hop={hop} neither a multiple nor a divisor of 128 "
            "(TPU 128-lane tiling)"
        )
    if n_frames is not None:
        m = 128 // hop if (hop % 128 != 0 and 128 % hop == 0) else 1
        est = _istft_vmem_bytes(-(-n_frames // m), n_fft, hop * m)
        if est > _ISTFT_VMEM_CAP_BYTES:
            problems.append(
                f"n_frames={n_frames} stages ~{est >> 20} MB of scoped VMEM "
                f"in the iSTFT kernel (cap ~{_ISTFT_VMEM_CAP_BYTES >> 20} MB;"
                " the OLA kernel holds the whole frame axis per example) — "
                "chunk the input (infer.streaming) or use backend='xla'"
            )
    if problems:
        raise ValueError(
            "Pallas DSP backend requested for an unsupported geometry: "
            + "; ".join(problems)
            + ". Supported: n_fft <= "
            f"{_PALLAS_MAX_NFFT}, n_fft % hop == 0, and hop % 128 == 0 or "
            "128 % hop == 0. Use backend='auto' (routes unsupported "
            "geometries to the XLA path) or backend='xla'."
        )


def _resolve(backend: str, n_fft: int, hop: int,
             n_frames: Optional[int] = None) -> str:
    """n_frames: pass the static frame count for iSTFT-side ops (their
    kernels stage the whole frame axis — see _istft_vmem_bytes); None for
    STFT-side ops, whose kernels tile frames and are length-independent."""
    if _FORCED is not None:
        if _FORCED == "pallas":
            _check_pallas_geometry(n_fft, hop, n_frames)
        return _FORCED
    if backend in ("xla", "pallas"):
        if backend == "pallas":
            _check_pallas_geometry(n_fft, hop, n_frames)
        return backend
    # auto: Pallas wants TPU, divisible hop, DFT matrices that fit VMEM, and
    # 128-aligned hop (TPU memrefs are 128-lane tiled).  Measured ~1.9x
    # faster than the XLA stft+istft chain on v5e at the wsj0 geometry,
    # with ≤1e-6-level fidelity.
    #
    # Sub-128 hops that divide 128 are COVERED by the phased decomposition
    # (kernels at hop*m = 128, frames interleaved/recombined outside).  The
    # measured auto boundary on v5e (scripts/bench_dsp_phased.py): at n_fft
    # 256 / hop 64 the phased path is ~1.5x SLOWER than XLA's small-FFT
    # chain (phase overhead dominates tiny kernels); at n_fft 512 / hop 64
    # it is 1.45x FASTER (per-kernel matmul-DFT work amortizes the
    # interleave).  Auto therefore takes phased Pallas only from n_fft 512
    # up; smaller n_fft stays on XLA (backend="pallas"/force_backend still
    # reach the phased path anywhere in its envelope).
    if (
        _on_tpu()
        and n_fft % hop == 0
        and n_fft <= 1024
        and (hop % 128 == 0 or (128 % hop == 0 and n_fft >= 512))
        and _have_pallas_kernels()
    ):
        if n_frames is not None:
            m = 128 // hop if hop % 128 != 0 else 1
            if (_istft_vmem_bytes(-(-n_frames // m), n_fft, hop * m)
                    > _ISTFT_VMEM_CAP_BYTES):
                return "xla"   # long one-shot input: OLA kernel over VMEM cap
        return "pallas"
    return "xla"


def _phases(hop: int) -> int:
    """Number of frame phases for the sub-128 hop decomposition (1 = the
    direct kernels)."""
    if hop % 128 == 0:
        return 1
    if 128 % hop == 0:
        return 128 // hop
    raise ValueError(
        f"pallas DSP needs hop % 128 == 0 or hop | 128; got hop={hop}"
    )


def _win_encode(window: str, n_fft: int, win_length: Optional[int]):
    """tf.signal frame_length < fft_length support: returns the padded-window
    name (see dsp.windows.get_window) and the input end-padding that keeps
    the frame count tf-exact (1 + (T - win_length)//hop).  Both the XLA and
    Pallas paths consume the encoded name — the Pallas DFT matrices fold the
    zero-padded window in, so no kernel changes are needed.  One shared
    implementation (dsp.windows.encode_win_length) so the oracle and the
    dispatch layer can never drift."""
    from gan_sass_tf_tpu.dsp.windows import encode_win_length

    return encode_win_length(window, n_fft, win_length)


def _pad_tail(x, pad: int):
    import jax.numpy as jnp

    if not pad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def _pallas_aligned(x, hop: int, n_fft: int):
    """Pallas inputs must stay hop-aligned (Mosaic 128-lane tiling; the
    win_length end-padding breaks alignment).  Pads x up to the next hop
    multiple and returns the tf-exact frame count to truncate back to —
    the extra all-padding frames are sliced off outside the kernel."""
    t = x.shape[-1]
    f_keep = 1 + (t - n_fft) // hop
    extra = (-t) % hop
    return _pad_tail(x, extra), f_keep


def _interleave_phases(outs, f_total: int):
    """Phase outputs [p] of shape (..., f_p, K), f_p = #frames ≡ p (mod m)
    -> (..., f_total, K) with frame order restored (j*m + p)."""
    import jax.numpy as jnp

    f_max = max(o.shape[-2] for o in outs)
    outs = [
        jnp.pad(o, [(0, 0)] * (o.ndim - 2)
                + [(0, f_max - o.shape[-2]), (0, 0)])
        for o in outs
    ]
    st = jnp.stack(outs, axis=-2)              # (..., f_max, m, K)
    st = st.reshape(*st.shape[:-3], f_max * len(outs), st.shape[-1])
    return st[..., :f_total, :]


def _stft_phased(x, n_fft: int, hop: int, window: str, m: int):
    """Sub-128 hop STFT on Pallas: phase p = frames p, p+m, p+2m, … — each
    phase is a direct kernel call at stride hop*m = 128 on the waveform
    shifted by p*hop (lane-aligned slices only reach the kernel)."""
    from gan_sass_tf_tpu.ops.pallas_stft import stft_pallas

    f_total = 1 + (x.shape[-1] - n_fft) // hop
    hop2 = hop * m
    outs = []
    for p in range(min(m, f_total)):
        xp, f_keep = _pallas_aligned(x[..., p * hop :], hop2, n_fft)
        outs.append(stft_pallas(xp, n_fft, hop2, window)[..., :f_keep, :])
    return _interleave_phases(outs, f_total)


def stft(x, n_fft: int, hop: int, window: str = "hann", backend: str = "auto",
         win_length: Optional[int] = None):
    window, pad = _win_encode(window, n_fft, win_length)
    x = _pad_tail(x, pad)
    if _resolve(backend, n_fft, hop) == "pallas":
        from gan_sass_tf_tpu.ops.pallas_stft import stft_pallas

        m = _phases(hop)
        if m > 1:
            return _stft_phased(x, n_fft, hop, window, m)
        x, f_keep = _pallas_aligned(x, hop, n_fft)
        return stft_pallas(x, n_fft, hop, window)[..., :f_keep, :]
    return _xla_stft(x, n_fft, hop, window)


def stft_features(x, dsp_cfg, emit=("logmag",), backend: str = "auto"):
    """Fused STFT + feature extraction: dict with any subset of
    {"spec", "mag", "logmag", "logmel"}.  On TPU this is ONE Pallas kernel
    (features computed in VMEM; non-emitted intermediates never hit HBM);
    the XLA fallback composes the dsp/ oracle ops."""
    import jax.numpy as jnp

    n_fft, hop = dsp_cfg.n_fft, dsp_cfg.hop_length
    window, pad = _win_encode(dsp_cfg.window, n_fft,
                              getattr(dsp_cfg, "win_length", None))
    x = _pad_tail(x, pad)
    mel = None
    if "logmel" in emit:
        from gan_sass_tf_tpu.dsp.features import mel_filterbank

        mel = jnp.asarray(
            mel_filterbank(dsp_cfg.n_mels, dsp_cfg.n_bins, dsp_cfg.sample_rate)
        )
    if _resolve(backend, n_fft, hop) == "pallas":
        from gan_sass_tf_tpu.ops.pallas_stft import stft_features_pallas

        m = _phases(hop)
        if m > 1:
            f_total = 1 + (x.shape[-1] - n_fft) // hop
            hop2 = hop * m
            phase_outs = []
            for p in range(min(m, f_total)):
                xp, f_keep = _pallas_aligned(x[..., p * hop :], hop2, n_fft)
                o = stft_features_pallas(
                    xp, n_fft, hop2, window, emit=tuple(emit),
                    mel_matrix=mel, eps=dsp_cfg.eps,
                )
                phase_outs.append(
                    {k: v[..., :f_keep, :] for k, v in o.items()}
                )
            return {
                k: _interleave_phases([po[k] for po in phase_outs], f_total)
                for k in phase_outs[0]
            }
        x, f_keep = _pallas_aligned(x, hop, n_fft)
        out = stft_features_pallas(
            x, n_fft, hop, window, emit=tuple(emit),
            mel_matrix=mel, eps=dsp_cfg.eps,
        )
        if f_keep != 1 + (x.shape[-1] - n_fft) // hop:
            out = {k: v[..., :f_keep, :] for k, v in out.items()}
        return out
    spec = _xla_stft(x, n_fft, hop, window)
    out = {}
    if "spec" in emit:
        out["spec"] = spec
    if {"mag", "logmag", "logmel"} & set(emit):
        mag = jnp.abs(spec)
    if "mag" in emit:
        out["mag"] = mag
    if "logmag" in emit:
        out["logmag"] = jnp.log(mag + dsp_cfg.eps)
    if "logmel" in emit:
        out["logmel"] = jnp.log(mag @ mel + dsp_cfg.eps)
    return out


def _combine_phases(ys, n_fft: int, hop: int, window: str, f: int,
                    length: Optional[int]):
    """Phase waveforms ys[p] (raw windowed OLA, env="none") -> the full
    least-squares iSTFT: shift-add the phases, then one multiply by the
    TRUE hop-level inverse envelope (the phase kernels must not normalize
    by their own hop*m envelopes)."""
    import jax.numpy as jnp

    from gan_sass_tf_tpu.dsp.windows import cola_norm, get_window, safe_inv_env

    out_len = (f - 1) * hop + n_fft
    acc = None
    for p, y_p in enumerate(ys):
        pad_l = p * hop
        pad_r = out_len - pad_l - y_p.shape[-1]
        y_p = jnp.pad(y_p, [(0, 0)] * (y_p.ndim - 1) + [(pad_l, pad_r)])
        acc = y_p if acc is None else acc + y_p
    w = get_window(window, n_fft)
    y = acc * jnp.asarray(safe_inv_env(cola_norm(w, hop, f)))
    return y[..., :length] if length is not None else y


def istft(spec, n_fft: int, hop: int, window: str = "hann",
          length: Optional[int] = None, backend: str = "auto",
          win_length: Optional[int] = None):
    window, pad = _win_encode(window, n_fft, win_length)
    if pad and length is None:
        length = (spec.shape[-2] - 1) * hop + win_length
    if _resolve(backend, n_fft, hop, spec.shape[-2]) == "pallas":
        from gan_sass_tf_tpu.ops.pallas_istft import istft_pallas

        m = _phases(hop)
        if m > 1:
            f = spec.shape[-2]
            ys = [
                istft_pallas(spec[..., p::m, :], n_fft, hop * m, window,
                             env="none")
                for p in range(min(m, f))
            ]
            return _combine_phases(ys, n_fft, hop, window, f, length)
        return istft_pallas(spec, n_fft, hop, window, length)
    return _xla_istft(spec, n_fft, hop, window, length, norm="global")


def masked_istft(spec, masks, n_fft: int, hop: int, window: str = "hann",
                 mask_type: str = "magnitude", length: Optional[int] = None,
                 backend: str = "auto", win_length: Optional[int] = None):
    """Fused mask-apply + iSTFT/overlap-add (BASELINE.json:5): mixture STFT
    (..., F, K) + per-source masks -> (..., S, T) wavs.  Inference path (no
    VJP); the XLA fallback composes apply_mask + istft."""
    window, pad = _win_encode(window, n_fft, win_length)
    if pad and length is None:
        length = (spec.shape[-2] - 1) * hop + win_length
    if _resolve(backend, n_fft, hop, spec.shape[-2]) == "pallas":
        from gan_sass_tf_tpu.ops.pallas_istft import masked_istft_pallas

        m = _phases(hop)
        if m > 1:
            f = spec.shape[-2]
            ys = []
            for p in range(min(m, f)):
                msl = (masks[..., p::m, :, :] if mask_type == "complex"
                       else masks[..., p::m, :])
                ys.append(masked_istft_pallas(
                    spec[..., p::m, :], msl, n_fft, hop * m, window,
                    mask_type, None, env="none",
                ))
            return _combine_phases(ys, n_fft, hop, window, f, length)
        return masked_istft_pallas(
            spec, masks, n_fft, hop, window, mask_type, length
        )
    from gan_sass_tf_tpu.dsp.masks import apply_mask

    est = apply_mask(spec, masks, mask_type)
    return _xla_istft(est, n_fft, hop, window, length, norm="global")
