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


def _resolve(backend: str, n_fft: int, hop: int) -> str:
    if _FORCED is not None:
        return _FORCED
    if backend in ("xla", "pallas"):
        return backend
    # auto: Pallas wants TPU, divisible hop, DFT matrices that fit VMEM, and
    # 128-aligned hop (TPU memrefs are 128-lane tiled; hop-chunk slices at
    # sub-128 offsets are not expressible — e.g. the hop-64 toy CPU config
    # stays on XLA).  Measured ~1.9x faster than the XLA stft+istft chain on
    # v5e at the wsj0 geometry, with ≤1e-6-level fidelity.
    if (
        _on_tpu()
        and n_fft % hop == 0
        and n_fft <= 1024
        and hop % 128 == 0
        and _have_pallas_kernels()
    ):
        return "pallas"
    return "xla"


def _win_encode(window: str, n_fft: int, win_length: Optional[int]):
    """tf.signal frame_length < fft_length support: returns the padded-window
    name (see dsp.windows.get_window) and the input end-padding that keeps
    the frame count tf-exact (1 + (T - win_length)//hop).  Both the XLA and
    Pallas paths consume the encoded name — the Pallas DFT matrices fold the
    zero-padded window in, so no kernel changes are needed."""
    if win_length is None or win_length == n_fft:
        return window, 0
    if win_length > n_fft:
        raise ValueError(
            f"win_length {win_length} > n_fft {n_fft}: tf.signal zero-pads "
            "the frame to the FFT size, so win_length must be <= n_fft"
        )
    return f"{window}@{win_length}", n_fft - win_length


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


def stft(x, n_fft: int, hop: int, window: str = "hann", backend: str = "auto",
         win_length: Optional[int] = None):
    window, pad = _win_encode(window, n_fft, win_length)
    x = _pad_tail(x, pad)
    if _resolve(backend, n_fft, hop) == "pallas":
        from gan_sass_tf_tpu.ops.pallas_stft import stft_pallas

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


def istft(spec, n_fft: int, hop: int, window: str = "hann",
          length: Optional[int] = None, backend: str = "auto",
          win_length: Optional[int] = None):
    window, pad = _win_encode(window, n_fft, win_length)
    if pad and length is None:
        length = (spec.shape[-2] - 1) * hop + win_length
    if _resolve(backend, n_fft, hop) == "pallas":
        from gan_sass_tf_tpu.ops.pallas_istft import istft_pallas

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
    if _resolve(backend, n_fft, hop) == "pallas":
        from gan_sass_tf_tpu.ops.pallas_istft import masked_istft_pallas

        return masked_istft_pallas(
            spec, masks, n_fft, hop, window, mask_type, length
        )
    from gan_sass_tf_tpu.dsp.masks import apply_mask

    est = apply_mask(spec, masks, mask_type)
    return _xla_istft(est, n_fft, hop, window, length, norm="global")
