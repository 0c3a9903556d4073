"""Spectral-masking generator zoo (reference layer L5, BASELINE.json:5).

The generator maps mixture features (log-magnitude or log-mel spectrogram,
shape (B, T, F_feat)) to per-source time-frequency masks over the *linear*
STFT bins:

    magnitude masks: (B, S, T, n_bins)        in [0, 1]
    complex masks:   (B, S, T, n_bins, 2)     tanh-bounded (re, im)

Variants (registry keys):
    "toy"    — per-frame MLP (the CPU-runnable toy of BASELINE.json:7)
    "conv"   — conv U-Net over the (T, F) grid (frequency-strided, so the
               time axis stays arbitrary/static-shape friendly)
    "bilstm" — stacked bidirectional LSTM over frames (the classic
               separation mask net; BASELINE.json:9 uses it for 3-source PIT)

TPU-first notes: everything is static-shaped; convs/matmuls carry the FLOPs
(MXU); the BiLSTM uses flax's scan-based RNN (lax.scan under jit — no python
loops in the compiled graph).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_sass_tf_tpu.dsp.masks import mask_channels
from gan_sass_tf_tpu.models.phase_ct import PhaseConvTranspose
from gan_sass_tf_tpu.models.registry import register_generator


def _standardize(x: jax.Array, axes, eps: float = 1e-5) -> jax.Array:
    """Per-example feature standardization (training stability; replaces the
    reference's host-side feature normalization with an in-graph op)."""
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class MaskHead(nn.Module):
    """Shared output head: hidden features -> per-source masks over linear
    STFT bins, with the mask nonlinearity from DSPConfig."""

    num_sources: int
    n_bins: int
    mask_type: str          # "magnitude" | "complex"
    mask_activation: str    # "sigmoid" | "softmax"
    feat_is_linear: bool    # True when F_feat == n_bins (1x1 conv head ok)
    dtype: jnp.dtype = jnp.float32       # compute dtype (bf16 speed path)
    head_mode: str = "dense"  # non-linear-grid heads: "dense" (learned
    #                           per-position map), "interp" (FIXED mel-warp
    #                           resample to the bin grid + 1x1 conv — shift-
    #                           equivariant, cannot memorize bin positions),
    #                           or "film" (sequence trunks: bin-local convs
    #                           over the linear-grid input spectrogram,
    #                           FiLM-modulated by the per-frame hidden state)
    sample_rate: float = 0.0  # required by "interp" (mel-center geometry)
    noise_slot: bool = False  # softmax only: S+1 slots, last one discarded —
    #                           sink for mixture noise (DSPConfig.mask_noise_slot)
    film_channels: int = 64   # width of the "film" head's bin-local convs
    film_fold: int = 8        # conv-trunk film head: lane-packing factor
    #                           (ModelConfig.g_film_fold)

    @nn.compact
    def __call__(self, h: jax.Array, x_ref: jax.Array | None = None
                 ) -> jax.Array:
        # h: (B, T, F_feat, C) or (B, T, D);
        # x_ref: (B, T, n_bins) linear-grid input features ("film" only)
        s, mc = self.num_sources, mask_channels(self.mask_type)
        if (self.noise_slot and self.mask_activation == "softmax"
                and self.mask_type == "magnitude"):
            s = s + 1  # extra slot participates in the softmax, then dropped
            #            (magnitude-softmax only — DSPConfig validates; the
            #            complex tanh exit below has no slot-drop)
        if ((self.head_mode == "film" and h.ndim == 4)
                or self.head_mode == "filmpack"):
            # Packed film head for CONV trunks (round 4, VERDICT r3 item 1):
            # the trunk runs on a fold-reduced grid (cheap); full-grid mask
            # synthesis happens here, on a LANE-PACKED relayout of the
            # full-resolution input — (B, T, K) -> (B, T, K/f, f) — so the
            # head's activations fill the 128 MXU lanes that a full-grid
            # C<=64 tensor would pad (the measured music channel-
            # insensitivity: 16/32/64-ch convs all cost the same, i.e. the
            # lanes are idle).  Per-bin detail is fully preserved (the fold
            # is a relayout, not a decimation); a (3,3) conv over
            # (T, K/f cells) sees +-f bins per layer with full in-cell
            # mixing — a superset of bin-local convs with period-f weight
            # sharing, so masks cannot memorize absolute pitch (the r3
            # position-freeness lesson).  The trunk enters as FiLM
            # modulation, nearest-resized to the cell grid.
            if x_ref is None or x_ref.shape[-1] != self.n_bins:
                raise ValueError(
                    f"head_mode={self.head_mode!r} needs the full-grid "
                    f"input spectrogram (n_bins={self.n_bins}) as x_ref"
                )
            f, c = self.film_fold, self.film_channels
            kp = -(-self.n_bins // f) * f
            x = jnp.pad(x_ref, ((0, 0), (0, 0), (0, kp - self.n_bins)))
            b, t = x.shape[:2]
            cells = kp // f
            x = x.reshape(b, t, cells, f).astype(self.dtype)
            # Smooth per-cell position encoding (position as an input
            # feature, never a learned per-bin weight — r3's film-v1
            # lesson: without it the head underfits).
            k_pos = jnp.linspace(0.0, 1.0, cells, dtype=self.dtype)
            enc = jnp.stack(
                [k_pos] + [jnp.sin(2.0 * jnp.pi * k_pos * q)
                           for q in (1.0, 2.0, 4.0, 8.0)], axis=-1)
            enc = jnp.broadcast_to(enc[None, None],
                                   (b, t, cells, enc.shape[-1]))
            x = jnp.concatenate([x, enc], axis=-1)
            # Context source: a conv trunk arrives as a (reduced) grid; a
            # sequence trunk ("filmpack", e.g. the BiLSTM) as per-frame
            # hidden state — broadcast over cells.  Either way the trunk
            # enters ONLY as FiLM modulation (position-free).
            ctx4 = h if h.ndim == 4 else h[:, :, None, :]
            ctx = jax.image.resize(
                ctx4.astype(self.dtype),
                (ctx4.shape[0], t, cells, ctx4.shape[-1]), "nearest")
            for dil in (1, 2, 4):
                x = nn.Conv(c, (3, 3), kernel_dilation=(1, dil),
                            dtype=self.dtype)(x)
                gb = nn.Conv(2 * c, (1, 1), dtype=self.dtype)(ctx)
                gamma, beta = jnp.split(gb, 2, axis=-1)
                x = jax.nn.leaky_relu(x * (1.0 + gamma) + beta, 0.2)
            out = nn.Conv(f * s * mc, (1, 1), dtype=self.dtype)(x)
            out = out.reshape(b, t, cells, f, s, mc)
            out = out.reshape(b, t, kp, s, mc)[:, :, :self.n_bins]
            out = jnp.moveaxis(out, 3, 1)                       # (B,S,T,K,mc)
        elif self.head_mode == "film" and h.ndim == 3:
            # Position-free head for sequence trunks: the Dense hidden→K map
            # below can memorize trained pitch positions (measured ~11 dB
            # held-out generalization gap on 3src_pit — BASELINE.md round 3,
            # same failure the interp head fixed on wsj0_logmel).  Here mask
            # logits come from bin-LOCAL convs over the input spectrogram
            # (shift-equivariant along bins) FiLM-modulated by the BiLSTM's
            # per-frame hidden state (broadcast over bins): no learned
            # weight carries a bin-position axis.
            if x_ref is None or x_ref.shape[-1] != self.n_bins:
                raise ValueError(
                    "head_mode='film' needs linear-grid input features "
                    f"(n_bins={self.n_bins}) as x_ref"
                )
            c = self.film_channels
            # x_ref arrives ALREADY standardized (the trunk's own
            # _standardize output is reused — no second full-grid
            # mean/var reduction on a bandwidth-bound step).
            x = x_ref[..., None].astype(self.dtype)
            # Fixed sinusoidal frequency encoding: position enters as a
            # SMOOTH input feature (band-limited to 8 cycles over the bin
            # axis), never as a learned per-bin weight — position-dependent
            # masks stay interpolatable to held-out pitches.  Without any
            # position signal the v1 head underfit even the training
            # distribution (+4.0 vs +19.9 dB train-dist on 3src).
            k_pos = jnp.linspace(0.0, 1.0, self.n_bins, dtype=self.dtype)
            enc = jnp.stack(
                [k_pos] + [jnp.sin(2.0 * jnp.pi * k_pos * f)
                           for f in (1.0, 2.0, 4.0, 8.0)], axis=-1)
            enc = jnp.broadcast_to(
                enc[None, None], (*x.shape[:2], self.n_bins, enc.shape[-1]))
            x = jnp.concatenate([x, enc], axis=-1)
            # Dilated along bins: receptive field ~29 bins spans 2-4
            # harmonic spacings at the 3src geometry (f0 80-300 Hz,
            # 15.6 Hz/bin), so the head can SEE harmonic structure instead
            # of asking the FiLM bottleneck to encode it.
            for dil in (1, 2, 4):
                x = nn.Conv(c, (1, 5), kernel_dilation=(1, dil),
                            dtype=self.dtype)(x)
                gb = nn.Dense(2 * c, dtype=self.dtype)(h)     # (B, T, 2c)
                gamma, beta = jnp.split(gb[:, :, None, :], 2, axis=-1)
                x = jax.nn.leaky_relu(x * (1.0 + gamma) + beta, 0.2)
            out = nn.Conv(s * mc, (1, 1), dtype=self.dtype)(x)
            out = out.reshape(*out.shape[:3], s, mc)           # (B,T,K,S,mc)
            out = jnp.moveaxis(out, 3, 1)                       # (B,S,T,K,mc)
        elif h.ndim == 4 and self.feat_is_linear and h.shape[2] == self.n_bins:
            out = nn.Conv(s * mc, (1, 1), dtype=self.dtype)(h)
            out = out.reshape(*out.shape[:3], s, mc)           # (B,T,K,S,mc)
            out = jnp.moveaxis(out, 3, 1)                       # (B,S,T,K,mc)
        elif h.ndim == 4 and self.head_mode == "interp":
            # Fixed mel→linear warp (compile-time constant, one MXU matmul)
            # then a 1x1 conv shared across bins: every learned weight is
            # position-free, so held-out pitches land on the same function
            # trained pitches did (the Dense head below measured a 12.5 dB
            # held-out generalization gap on wsj0_logmel — round 3).
            from gan_sass_tf_tpu.dsp.features import mel_interp_matrix

            w = jnp.asarray(mel_interp_matrix(
                h.shape[2], self.n_bins, self.sample_rate), self.dtype)
            # 1x1 conv FIRST (at the mel grid), warp SECOND: the two linear
            # ops commute (the conv mixes channels at fixed m, the warp
            # mixes m at fixed channel; warp rows sum to 1 so the bias
            # passes through exactly), and this order never materializes
            # the (B,T,K,C) full-grid tensor — only (B,T,M,S·mc) then
            # (B,T,K,S·mc), ~16x less HBM traffic at the wsj0 geometry.
            out = nn.Conv(s * mc, (1, 1), dtype=self.dtype)(h.astype(self.dtype))
            out = jnp.einsum("btmo,km->btko", out, w)
            out = out.reshape(*out.shape[:3], s, mc)           # (B,T,K,S,mc)
            out = jnp.moveaxis(out, 3, 1)                       # (B,S,T,K,mc)
        else:
            if h.ndim == 4:
                h = h.reshape(*h.shape[:2], -1)                 # (B,T,F*C)
            out = nn.Dense(s * self.n_bins * mc, dtype=self.dtype)(h)
            out = out.reshape(*out.shape[:2], s, self.n_bins, mc)
            out = jnp.moveaxis(out, 2, 1)                       # (B,S,T,K,mc)
        return _mask_exit(out, self.mask_type, self.mask_activation,
                          self.num_sources)


def _mask_exit(out: jax.Array, mask_type: str, mask_activation: str,
               num_sources: int) -> jax.Array:
    """Shared mask nonlinearity exit: (B, S[+slot], T, K, mc) logits ->
    masks.  f32 regardless of compute dtype: masks multiply the complex
    STFT on the fidelity-critical path (BASELINE.json:5)."""
    out = out.astype(jnp.float32)
    if mask_type == "complex":
        return jnp.tanh(out)                                # (B,S,T,K,2)
    out = out[..., 0]                                       # (B,S,T,K)
    if mask_activation == "softmax":
        out = jax.nn.softmax(out, axis=1)                   # over slots
        return out[:, :num_sources]            # drop the noise slot if any
    return jax.nn.sigmoid(out)


@register_generator("toy")
def _toy(cfg):
    if cfg.model.g_crop_nyquist:
        raise ValueError("g_crop_nyquist is only supported by the 'conv' "
                         "generator")
    return ToyMLPGenerator(
        num_sources=cfg.data.num_sources,
        n_bins=cfg.dsp.n_bins,
        mask_type=cfg.dsp.mask_type,
        mask_activation=cfg.dsp.mask_activation,
        noise_slot=cfg.dsp.mask_noise_slot,
        hidden=cfg.model.g_hidden,
        dropout=cfg.model.dropout,
        dtype=jnp.dtype(cfg.model.compute_dtype),
    )


class ToyMLPGenerator(nn.Module):
    num_sources: int
    n_bins: int
    mask_type: str
    mask_activation: str
    noise_slot: bool = False
    hidden: int = 256
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, train: bool = False) -> jax.Array:
        h = _standardize(feats, axes=(1, 2)).astype(self.dtype)
        h = nn.Dense(self.hidden, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.hidden, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return MaskHead(
            self.num_sources, self.n_bins, self.mask_type,
            self.mask_activation, feat_is_linear=False, dtype=self.dtype,
            noise_slot=self.noise_slot,
        )(h)


@register_generator("conv")
def _conv(cfg):
    if cfg.model.g_stem_mode not in ("conv", "fold"):
        raise ValueError(
            f"g_stem_mode must be 'conv' or 'fold', "
            f"got {cfg.model.g_stem_mode!r}"
        )
    if cfg.model.g_head_mode not in ("dense", "interp", "film", "fold"):
        raise ValueError(
            f"conv g_head_mode must be 'dense', 'interp', 'film' or "
            f"'fold', got {cfg.model.g_head_mode!r}"
        )
    if (cfg.model.g_head_mode == "fold"
            and tuple(cfg.model.g_stem_stride) == (1, 1)):
        raise ValueError(
            "g_head_mode='fold' emits masks from the stem-folded grid — "
            "it needs g_stem_stride != (1, 1) (and g_stem_mode='fold' for "
            "the lossless relayout)"
        )
    if (cfg.model.g_head_mode == "fold"
            and cfg.dsp.feature_dim != cfg.dsp.n_bins):
        raise ValueError(
            "g_head_mode='fold' needs linear-grid input features "
            f"(feature_dim {cfg.dsp.feature_dim} != n_bins "
            f"{cfg.dsp.n_bins})"
        )
    if (cfg.model.g_head_mode == "film"
            and cfg.dsp.feature_dim != cfg.dsp.n_bins):
        raise ValueError(
            "conv g_head_mode='film' needs linear-grid input features "
            f"(feature_dim {cfg.dsp.feature_dim} != n_bins {cfg.dsp.n_bins})"
        )
    if cfg.model.g_dec_l0 not in ("conv", "subpixel"):
        raise ValueError(
            f"g_dec_l0 must be 'conv' or 'subpixel', "
            f"got {cfg.model.g_dec_l0!r}"
        )
    if cfg.model.g_crop_nyquist and (
            cfg.dsp.feature_dim != cfg.dsp.n_bins
            or cfg.dsp.n_bins % 2 == 0):
        # Fail loudly: a silently-inactive perf knob poisons A/B numbers.
        raise ValueError(
            "g_crop_nyquist needs linear-grid features with odd n_bins "
            f"(feature_dim {cfg.dsp.feature_dim}, n_bins {cfg.dsp.n_bins})"
        )
    return ConvUNetGenerator(
        num_sources=cfg.data.num_sources,
        n_bins=cfg.dsp.n_bins,
        feature_dim=cfg.dsp.feature_dim,
        mask_type=cfg.dsp.mask_type,
        mask_activation=cfg.dsp.mask_activation,
        noise_slot=cfg.dsp.mask_noise_slot,
        channels=cfg.model.g_channels,
        leak=cfg.model.leak,
        dropout=cfg.model.dropout,
        dtype=jnp.dtype(cfg.model.compute_dtype),
        time_stride=cfg.model.g_time_stride,
        stem_stride=tuple(cfg.model.g_stem_stride),
        stem_mode=cfg.model.g_stem_mode,
        decoder_slim=cfg.model.g_decoder_slim,
        head_mode=cfg.model.g_head_mode,
        sample_rate=float(cfg.dsp.sample_rate),
        crop_nyquist=cfg.model.g_crop_nyquist,
        dec_l0=cfg.model.g_dec_l0,
        film_channels=cfg.model.g_film_channels,
        film_fold=cfg.model.g_film_fold,
        phase_ct=cfg.model.g_phase_ct,
    )


class ConvUNetGenerator(nn.Module):
    """Frequency-strided conv U-Net.  Downsampling only along F keeps the
    time axis untouched (streaming-friendly; arbitrary frame counts)."""

    num_sources: int
    n_bins: int
    feature_dim: int
    mask_type: str
    mask_activation: str
    noise_slot: bool = False
    channels: Sequence[int] = (32, 64, 128)
    leak: float = 0.2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    time_stride: bool = True   # downsample T too: ~2x less activation HBM
    #                            traffic per level (the step is BW-bound)
    stem_stride: tuple = (1, 1)  # (T, F) reduction before the U-Net; masks
    #                              restored to full resolution by a subpixel
    #                              head (ModelConfig.g_stem_stride)
    stem_mode: str = "conv"    # "conv" (strided-conv decimation) or "fold"
    #                            (lossless space-to-depth relayout)
    decoder_slim: float = 1.0  # decoder channel multiplier (g_decoder_slim)
    head_mode: str = "dense"   # mask head (ModelConfig.g_head_mode): "film"
    #                            = lane-packed bin-local head over the
    #                            full-grid input, FiLM-modulated by the
    #                            (fold-reduced) trunk — replaces the
    #                            subpixel stem-restore as the full-grid
    #                            synthesis stage
    sample_rate: float = 0.0
    film_channels: int = 64    # packed film head width
    film_fold: int = 8         # packed film head lane-packing factor
    dec_l0: str = "conv"       # final (full-grid) decoder stage: "conv" =
    #                            ConvTranspose + post-concat 3x3 at full
    #                            (T, K); "subpixel" = 1x1 expansion at the
    #                            half grid + depth-to-space (ModelConfig.
    #                            g_dec_l0 — the full-grid 3x3 pair is ~45%
    #                            of G's effective MACs at the music
    #                            geometry because channels pad to the 128
    #                            MXU lanes; the skip still supplies
    #                            per-bin full-grid detail to the head)
    phase_ct: bool = False     # decoder upsampling via PhaseConvTranspose:
    #                            same function/params as nn.ConvTranspose,
    #                            but the backward avoids XLA's materialized
    #                            pad+reverse of full-grid cotangents (the
    #                            round-5 ledger's largest removable item —
    #                            see models/phase_ct.py)
    crop_nyquist: bool = False  # run the net on the even K-1 bin grid and
    #                             copy the top bin's mask from its neighbor:
    #                             n_bins = n_fft/2 + 1 is odd (1025 at the
    #                             music geometry), which pads every full-grid
    #                             tensor's TPU tiling; the Nyquist bin
    #                             carries negligible energy (22.05 kHz).

    @nn.compact
    def __call__(self, feats: jax.Array, train: bool = False) -> jax.Array:
        if self.dec_l0 not in ("conv", "subpixel"):
            # The registry builder validates too, but direct construction
            # must fail loudly as well — a misspelled dec_l0 would otherwise
            # silently fall through to the ConvTranspose path (r3 advisor).
            raise ValueError(f"dec_l0 must be 'conv' or 'subpixel', "
                             f"got {self.dec_l0!r}")
        crop = (self.crop_nyquist and self.feature_dim == self.n_bins
                and feats.shape[2] == self.n_bins and self.n_bins % 2 == 1)
        if crop:
            feats = feats[:, :, :-1]
        k_bins = self.n_bins - 1 if crop else self.n_bins
        t_in, f_in = feats.shape[1], feats.shape[2]
        x = _standardize(feats, axes=(1, 2))[..., None].astype(self.dtype)
        x_full = x                       # full-res input (head skip, below)
        st, sf = self.stem_stride
        if (st, sf) != (1, 1):
            # Grid-reducing stem: the whole encoder/decoder below runs at
            # (T/st, F/sf) — at the music geometry the decoder at the full
            # (T, 1025) grid carries ~85% of G's MACs, so this is a
            # near-linear step-time lever.
            if self.stem_mode == "fold":
                # Space-to-depth: LOSSLESS relayout of the (st, sf) cell
                # into channels (the strided-conv stem decimates — measured
                # −3 dB SI-SDRi at the music geometry; folding discards
                # nothing, the net just sees the same bins as depth).
                pt, pf = -t_in % st, -f_in % sf
                x = jnp.pad(x, ((0, 0), (0, pt), (0, pf), (0, 0)))
                b, tp, fp, _ = x.shape
                x = x.reshape(b, tp // st, st, fp // sf, sf, 1)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, tp // st, fp // sf, st * sf)
            else:                        # "conv": kernel = 2x stride
                x = nn.Conv(self.channels[0], (2 * st, 2 * sf),
                            strides=(st, sf), dtype=self.dtype)(x)
                x = nn.leaky_relu(x, self.leak)
        down = (2, 2) if self.time_stride else (1, 2)
        skips = []
        for c in self.channels:
            x = nn.Conv(c, (3, 3), dtype=self.dtype)(x)
            x = nn.leaky_relu(x, self.leak)
            skips.append(x)
            x = nn.Conv(c, (3, 3), strides=down, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, self.leak)
        x = nn.Conv(self.channels[-1], (3, 3), dtype=self.dtype)(x)
        x = nn.leaky_relu(x, self.leak)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for lvl, (c, skip) in enumerate(
                zip(reversed(self.channels), reversed(skips))):
            cd = max(8, int(c * self.decoder_slim))
            if self.dec_l0 == "subpixel" and lvl == len(self.channels) - 1:
                # Light full-grid stage: ConvTranspose + post-concat 3x3 at
                # the full (T, K) grid are ~45% of G's effective MACs at the
                # music geometry (channels <= 128 pad to the 128 MXU lanes,
                # so the grid — not the channel count — sets the cost).  A
                # 1x1 expansion at the half grid + depth-to-space restores
                # resolution for ~7% of that; the encoder skip re-injects
                # per-bin full-grid detail straight into the mask head.
                dt_, df_ = down
                x = nn.Conv(cd * dt_ * df_, (1, 1), dtype=self.dtype)(x)
                b, th, fh, _ = x.shape
                x = x.reshape(b, th, fh, dt_, df_, cd)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, th * dt_, fh * df_, cd)
                x = x[:, : skip.shape[1], : skip.shape[2], :]
                x = nn.leaky_relu(x, self.leak)
                x = jnp.concatenate([x, skip], axis=-1)
                continue                 # the mask head (1x1) follows
            ct = (PhaseConvTranspose if self.phase_ct else nn.ConvTranspose)
            x = ct(cd, (3, 3), strides=down, dtype=self.dtype)(x)
            x = x[:, : skip.shape[1], : skip.shape[2], :]       # crop odd dims
            x = nn.leaky_relu(x, self.leak)
            x = jnp.concatenate([x, skip], axis=-1)
            x = nn.Conv(cd, (3, 3), dtype=self.dtype)(x)
            x = nn.leaky_relu(x, self.leak)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if (st, sf) != (1, 1) and self.head_mode == "fold":
            # Folded head (round 5): mask synthesis stays ON the folded
            # grid — no full-grid hidden tensor is ever materialized.  The
            # full-res input skip enters FOLDED (the same lossless
            # space-to-depth the stem used), so per-bin detail survives as
            # cell channels; the head emits every (st, sf) sub-position's
            # mask logits per cell (period-(st,sf) weight sharing — the
            # packed-film positional convention) and depth-to-space
            # restores resolution on the MASK tensor only, which XLA lays
            # out T-minor (measured — no lane padding).  Motivation: with
            # the subpixel-restore head the restored full-grid tensors are
            # <=33-channel, padding 4x to the 128-lane tile; the round-5
            # physical ledger charged the restore+head path ~15 GB/step of
            # music's 45.8 at fold(1,2)c128 — more than the folded trunk.
            pt, pf = -t_in % st, -f_in % sf
            xf = jnp.pad(x_full, ((0, 0), (0, pt), (0, pf), (0, 0)))
            b2, tp, fp, _ = xf.shape
            xf = xf.reshape(b2, tp // st, st, fp // sf, sf, 1)
            xf = xf.transpose(0, 1, 3, 2, 4, 5).reshape(
                b2, tp // st, fp // sf, st * sf)
            x = jnp.concatenate([x, xf.astype(self.dtype)], axis=-1)
            # Same per-bin capacity budget as the restore path (c0 per bin):
            c0 = min(self.channels[0], 32)
            x = nn.Conv(c0 * st * sf, (1, 1), dtype=self.dtype)(x)
            x = nn.leaky_relu(x, self.leak)
            s_slots = self.num_sources + (
                1 if (self.noise_slot and self.mask_activation == "softmax"
                      and self.mask_type == "magnitude") else 0)
            mc = mask_channels(self.mask_type)
            out = nn.Conv(st * sf * s_slots * mc, (1, 1),
                          dtype=self.dtype)(x)
            out = out.reshape(b2, tp // st, fp // sf, st, sf, s_slots, mc)
            out = out.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
                b2, tp, fp, s_slots, mc)
            out = out[:, :t_in, :f_in]
            out = jnp.moveaxis(out, 3, 1)                  # (B,S,T,K,mc)
            masks = _mask_exit(out, self.mask_type, self.mask_activation,
                               self.num_sources)
            if crop:
                masks = jnp.concatenate(
                    [masks, masks[:, :, :, -1:]], axis=3)
            return masks
        if (st, sf) != (1, 1) and self.head_mode != "film":
            # Subpixel head: restore the full (T, F) grid from the stem-
            # reduced one — a 1x1 conv emits st*sf sub-positions per cell.
            # (The film head does its own full-grid synthesis from the
            # lane-packed input, so no restore is needed there — the trunk
            # output stays at the reduced grid and enters as FiLM context.)
            # Full-grid channels are capped at 32 (the baseline head width):
            # full-grid tensors dominate HBM traffic, so a wide reduced-grid
            # net must not widen the restored grid with it.
            c0 = min(self.channels[0], 32)
            x = nn.Conv(c0 * st * sf, (1, 1), dtype=self.dtype)(x)
            b, t1, f1, _ = x.shape
            x = x.reshape(b, t1, f1, st, sf, c0)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, t1 * st, f1 * sf, c0)
            x = x[:, :t_in, :f_in]
            x = nn.leaky_relu(x, self.leak)
            # Full-resolution input skip: without it the mask within one
            # stem cell can only vary through fixed subpixel weights and
            # never sees per-bin input detail — measured −2.3 dB SI-SDRi
            # at the music geometry.  One extra head channel ≈ free.
            x = jnp.concatenate([x, x_full], axis=-1)
        masks = MaskHead(
            self.num_sources, k_bins, self.mask_type,
            self.mask_activation,
            feat_is_linear=(self.feature_dim == self.n_bins),
            noise_slot=self.noise_slot,
            dtype=self.dtype,
            head_mode=self.head_mode,
            sample_rate=self.sample_rate,
            film_channels=self.film_channels,
            film_fold=self.film_fold,
        )(x, x_ref=(x_full[..., 0] if self.head_mode == "film" else None))
        if crop:
            # Nyquist-bin mask := its neighbor's (axis 3 = bins; works for
            # both magnitude (B,S,T,K) and complex (B,S,T,K,2) masks).
            masks = jnp.concatenate([masks, masks[:, :, :, -1:]], axis=3)
        return masks


@register_generator("bilstm")
def _bilstm(cfg):
    if cfg.model.g_crop_nyquist:
        raise ValueError("g_crop_nyquist is only supported by the 'conv' "
                         "generator")
    if cfg.model.g_head_mode not in ("dense", "film", "filmpack"):
        raise ValueError(
            "bilstm g_head_mode must be 'dense', 'film' or 'filmpack', "
            f"got {cfg.model.g_head_mode!r}"
        )
    if (cfg.model.g_head_mode in ("film", "filmpack")
            and cfg.dsp.feature_dim != cfg.dsp.n_bins):
        raise ValueError(
            "g_head_mode='film' needs linear-grid input features "
            f"(feature_dim {cfg.dsp.feature_dim} != n_bins {cfg.dsp.n_bins})"
        )
    return BiLSTMGenerator(
        num_sources=cfg.data.num_sources,
        n_bins=cfg.dsp.n_bins,
        mask_type=cfg.dsp.mask_type,
        mask_activation=cfg.dsp.mask_activation,
        noise_slot=cfg.dsp.mask_noise_slot,
        hidden=cfg.model.g_hidden,
        layers=cfg.model.g_layers,
        dropout=cfg.model.dropout,
        dtype=jnp.dtype(cfg.model.compute_dtype),
        head_mode=cfg.model.g_head_mode,
        film_channels=cfg.model.g_film_channels,
        film_fold=cfg.model.g_film_fold,
    )


class BiLSTMGenerator(nn.Module):
    """Stacked BiLSTM over frames — lax.scan-based (compiler-friendly loop,
    SURVEY.md 'no data-dependent Python control flow inside jit')."""

    num_sources: int
    n_bins: int
    mask_type: str
    mask_activation: str
    noise_slot: bool = False
    hidden: int = 300
    layers: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    head_mode: str = "dense"   # "dense" (hidden→K projection; can memorize
    #                            bin positions) | "film" (position-free,
    #                            full-grid bin-local convs) | "filmpack"
    #                            (position-free AND lane-packed — same
    #                            function family as "film" at ~f x less
    #                            full-grid activation traffic)
    film_channels: int = 64
    film_fold: int = 8

    @nn.compact
    def __call__(self, feats: jax.Array, train: bool = False) -> jax.Array:
        x0 = _standardize(feats, axes=(1, 2))                    # (B,T,F)
        h = x0.astype(self.dtype)
        for _ in range(self.layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype))
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype))
            h = nn.Bidirectional(fwd, bwd)(h)                  # (B,T,2H)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return MaskHead(
            self.num_sources, self.n_bins, self.mask_type,
            self.mask_activation, feat_is_linear=False, dtype=self.dtype,
            noise_slot=self.noise_slot, head_mode=self.head_mode,
            film_channels=self.film_channels, film_fold=self.film_fold,
        )(h, x_ref=x0)   # standardized once; the film head reuses it
