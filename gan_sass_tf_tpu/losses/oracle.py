"""Oracle-mask quality bounds (VERDICT r2 items 1-2).

The contract metric is SI-SDR (BASELINE.json:2); a trained model's score is
only interpretable against the ceiling the MASKING FORMULATION itself allows
on the task.  Two oracles, one per mask family the framework supports:

  * magnitude masks, sigmoid activation -> phase-sensitive filter (PSF)
    clipped to [0, 1]: m_i = clip(Re(S_i · conj(X)) / |X|², 0, 1) — the
    L2-optimal REAL mask under mixture phase, projected onto the sigmoid
    head's range.  Strictly ≥ the classic IRM (m_i = |S_i|/Σ|S_j|) and,
    unlike the IRM, it accounts for additive noise in X automatically —
    on the noisy hard protocol the source-normalized IRM is NOT a bound
    (round-3 measured: a wav-SI-SDR-trained model beat it by 3 dB).
  * magnitude masks, softmax activation -> source-normalized IRM: softmax
    masks must sum to 1 across sources (every mixture bin — noise included —
    is distributed among the estimates), and the IRM is the ideal member of
    exactly that family.
  * complex masks   -> ideal complex mask CLIPPED to the generator's
    representable set: the MaskHead tanh-bounds each of (re, im) to [-1, 1]
    (models/generator.py MaskHead), so the oracle is m_i = clip(S_i / X).
    Exact wherever the true mask is representable; finite at bins with
    destructive interference (|S_i| > |X|).

Both oracles resynthesize through the SAME masked-iSTFT path the model uses
(ops.dispatch.masked_istft), so edge conditioning / window effects are
included in the bound — the gap between a model's SI-SDRi and the oracle's
is pure modeling headroom.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from gan_sass_tf_tpu.losses.metrics import pit_si_sdr
from gan_sass_tf_tpu.ops import dispatch as ops


def oracle_masks(spec_mix: jax.Array, spec_srcs: jax.Array, mask_type: str,
                 eps: float = 1e-8,
                 mask_activation: str = "sigmoid") -> jax.Array:
    """Ideal masks from the true per-source STFTs, restricted to the
    generator head's representable set (see module docstring).

    spec_mix:  (B, F, K) complex mixture STFT
    spec_srcs: (B, S, F, K) complex true-source STFTs
    -> (B, S, F, K) [magnitude] or (B, S, F, K, 2) [complex], matching the
    generator's output convention (and its tanh bound for complex)."""
    if mask_type == "magnitude":
        if mask_activation == "softmax":
            mags = jnp.abs(spec_srcs)
            return mags / (mags.sum(axis=1, keepdims=True) + eps)
        denom = spec_mix[:, None]
        psf = jnp.real(spec_srcs * jnp.conj(denom)) / (
            jnp.abs(denom) ** 2 + eps)
        return jnp.clip(psf, 0.0, 1.0)
    if mask_type == "complex":
        denom = spec_mix[:, None]
        m = spec_srcs * jnp.conj(denom) / (jnp.abs(denom) ** 2 + eps)
        return jnp.stack(
            [jnp.clip(jnp.real(m), -1.0, 1.0),
             jnp.clip(jnp.imag(m), -1.0, 1.0)],
            axis=-1,
        )
    raise ValueError(f"unknown mask_type {mask_type!r}")


def oracle_bound_si_sdr(mixture: jax.Array, scaled_sources: jax.Array,
                        dsp_cfg) -> Dict[str, jax.Array]:
    """Task ceiling: separate with the ideal mask of the configured family
    and score exactly like build_eval_step does (PIT SI-SDR improvement over
    the mixture baseline).

    mixture: (B, T); scaled_sources: (B, S, T) — the mix_sources outputs.
    Returns {si_sdr, si_sdr_mix, si_sdr_improvement} (batch means)."""
    n_fft, hop = dsp_cfg.n_fft, dsp_cfg.hop_length
    kw = dict(window=dsp_cfg.window, backend=dsp_cfg.backend,
              win_length=dsp_cfg.win_length)
    spec_mix = ops.stft(mixture, n_fft, hop, **kw)
    spec_srcs = ops.stft(scaled_sources, n_fft, hop, **kw)
    masks = oracle_masks(spec_mix, spec_srcs, dsp_cfg.mask_type, dsp_cfg.eps,
                         mask_activation=dsp_cfg.mask_activation)
    est = ops.masked_istft(spec_mix, masks, n_fft, hop,
                           mask_type=dsp_cfg.mask_type, **kw)
    t = est.shape[-1]
    tgt = scaled_sources[..., :t]
    sisdr = pit_si_sdr(est, tgt).mean()
    mix_rep = jnp.broadcast_to(mixture[:, None, :t], tgt.shape)
    baseline = pit_si_sdr(mix_rep, tgt).mean()
    return {"si_sdr": sisdr, "si_sdr_mix": baseline,
            "si_sdr_improvement": sisdr - baseline}
