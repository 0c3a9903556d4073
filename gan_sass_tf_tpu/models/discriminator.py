"""Conv/BN/LeakyReLU discriminator stack (reference layer L5, BASELINE.json:5).

Classifies (mixture features, candidate-source spectrogram) pairs as real
(ground-truth source) vs fake (separated estimate).  Input layout
(B, T, F, C) with C = 2 channels: the mixture log-magnitude and the
candidate's log-magnitude, both over linear STFT bins.

Norm options: "batch" (the reference's BN; carries batch_stats mutable
collection), "group" (stateless — plays nicer with sharded jit since there
are no cross-step running stats), "none".
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_sass_tf_tpu.models.registry import register_discriminator


@register_discriminator("conv")
def _conv(cfg):
    return ConvDiscriminator(
        channels=cfg.model.d_channels,
        norm=cfg.model.d_norm,
        leak=cfg.model.leak,
        dropout=cfg.model.dropout,
        stem_stride=cfg.model.d_stem_stride,
        input_fold=cfg.model.d_input_fold,
        dtype=jnp.dtype(cfg.model.compute_dtype),
    )


@register_discriminator("patch")
def _patch(cfg):
    return PatchDiscriminator(
        channels=cfg.model.d_channels,
        norm=cfg.model.d_norm,
        leak=cfg.model.leak,
        dropout=cfg.model.dropout,
        stem_stride=cfg.model.d_stem_stride,
        input_fold=cfg.model.d_input_fold,
        dtype=jnp.dtype(cfg.model.compute_dtype),
    )


class ConvDiscriminator(nn.Module):
    """norm options: "batch" (the reference's BN), "group" (stateless),
    "spectral" (spectral normalization of the conv weights — the standard
    GAN-stability regularizer, bounding D's Lipschitz constant), "none"."""

    channels: Sequence[int] = (32, 64, 128)
    norm: str = "batch"
    leak: float = 0.2
    dropout: float = 0.0
    # First-conv (time, freq) stride; its kernel is 2x the stride.  The
    # default (2, 4) makes the stem a (4, 8) conv producing a 4x smaller
    # grid than the classic (4,4)/(2,2) stem: the 2-channel input conv is
    # the single hottest op in the train step on TPU (2 input channels
    # waste 126/128 MXU lanes and force padded layouts on the full
    # (T, K) grid) — measured 3.7x faster fwd+bwd+input-grad at equal
    # quality (BASELINE.md round 2).  Set (2, 2) for the classic stem.
    stem_stride: Sequence[int] = (2, 4)
    # input_fold f: the input arrives with f consecutive frames folded into
    # channels ((N, T/f, K, 2f)); the stem kernel/stride shrink by f along
    # T so the receptive field and function class match the unfolded stem.
    input_fold: int = 1
    dtype: jnp.dtype = jnp.float32       # compute dtype (bf16 speed path)

    def _stem_geometry(self, i: int):
        if i > 0:
            return (4, 4), (2, 2)
        st, sk = self.stem_stride
        f = self.input_fold
        if st % f != 0:
            # f must divide the stem time-stride: otherwise the folded
            # stem cannot reproduce the unfolded downsampling factor and
            # the "function class unchanged" invariant silently breaks.
            raise ValueError(
                f"d_input_fold {f} must divide the stem time-stride {st}"
            )
        return ((2 * st) // f, 2 * sk), (st // f, sk)

    def _norm(self, x: jax.Array, train: bool) -> jax.Array:
        if self.norm == "batch":
            return nn.BatchNorm(use_running_average=not train,
                                dtype=self.dtype)(x)
        if self.norm == "group":
            return nn.GroupNorm(num_groups=min(8, x.shape[-1]),
                                dtype=self.dtype)(x)
        if self.norm in ("none", "spectral"):
            return x
        raise ValueError(f"unknown norm {self.norm!r}")

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """(B, T, F, C) -> (B,) real/fake logits."""
        x = x.astype(self.dtype)
        spectral = self.norm == "spectral"
        for i, c in enumerate(self.channels):
            k, s = self._stem_geometry(i)
            conv = nn.Conv(c, k, strides=s, dtype=self.dtype)
            if spectral:
                # Power-iteration state lives in 'batch_stats' (same mutable
                # collection the train step already threads for BN).
                x = nn.SpectralNorm(conv)(x, update_stats=train)
            else:
                x = conv(x)
            if i > 0 and not spectral:  # reference: no norm on first conv
                x = self._norm(x, train)
            x = nn.leaky_relu(x, self.leak)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = jnp.mean(x, axis=(1, 2))          # global average pool (B, C)
        # Logits in f32: GAN loss numerics are sensitive to bf16 rounding.
        head = nn.Dense(1, dtype=jnp.float32)
        x = x.astype(jnp.float32)
        if spectral:
            return nn.SpectralNorm(head)(x, update_stats=train)[..., 0]
        return head(x)[..., 0]


class PatchDiscriminator(ConvDiscriminator):
    """PatchGAN variant: instead of one global logit, a 1x1 conv emits a
    real/fake logit per time-frequency patch of the final feature map and
    the loss averages over patches — a stronger locality prior for
    spectrogram textures (each patch judged independently).  Returns
    (B, T', F') patch logits; the GAN losses reduce over all axes, so it is
    drop-in compatible with the train step."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        spectral = self.norm == "spectral"
        for i, c in enumerate(self.channels):
            k, s = self._stem_geometry(i)
            conv = nn.Conv(c, k, strides=s, dtype=self.dtype)
            if spectral:
                x = nn.SpectralNorm(conv)(x, update_stats=train)
            else:
                x = conv(x)
            if i > 0 and not spectral:
                x = self._norm(x, train)
            x = nn.leaky_relu(x, self.leak)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        head = nn.Conv(1, (1, 1), dtype=jnp.float32)
        x = x.astype(jnp.float32)
        patches = (nn.SpectralNorm(head)(x, update_stats=train)
                   if spectral else head(x))               # (B, T', F', 1)
        return patches[..., 0]                              # (B, T', F')
