"""The fused alternating G/D train step (SURVEY.md §3.1b) — ONE jitted XLA
program per step covering mixing → STFT → features → G masks → mask·STFT →
D(real/fake) → PIT + adversarial losses → grads → all-reduce → two optax
updates.  No host round-trips inside the step (BASELINE.json:5); the
gradient all-reduce over the 'data' mesh axis is inserted by XLA from the
sharding constraints (params replicated, batch sharded — SURVEY.md §2.4).

Reference behavior covered (reconstructed call stack, SURVEY.md §3.1):
alternating D-then-G updates with two optimizers, PIT-aligned adversarial +
L1 losses (BASELINE.json:9), D over (mixture, candidate) spectrogram pairs.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from gan_sass_tf_tpu.data.mixer import mix_sources
from gan_sass_tf_tpu.dsp import apply_mask, logmag
from gan_sass_tf_tpu.losses import (
    align_to_perm,
    gan_d_loss,
    gan_g_loss,
    pit_si_sdr,
    pooled_match_perm,
    recon_loss,
)
from gan_sass_tf_tpu.ops import dispatch as ops
from gan_sass_tf_tpu.train.state import TrainState, make_optimizers


def _d_vars(params, stats):
    return {"params": params, "batch_stats": stats} if stats else {"params": params}


def _g_vars(params):
    return {"params": params}


def _shard_offset(axis_names, local_b):
    """Global index of this shard's first example (0 without axis names)."""
    if not axis_names:
        return 0
    idx = 0
    for name in axis_names:
        idx = idx * jax.lax.axis_size(name) + jax.lax.axis_index(name)
    return idx * local_b


def build_train_step(cfg, g, d, axis_names: Tuple[str, ...] = (),
                     from_bank: bool = False, local_batch: int = 0) -> Callable[[TrainState, jax.Array, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Returns train_step(state, data, rng) -> (state, metrics) where `data`
    is either local_sources (B_local,S,T) f32, or — with from_bank=True —
    the replicated device-resident utterance bank (S,N_bank,T) sampled
    in-graph (zero per-step host->device transfer, BASELINE.json:5).

    Designed to run under jax.shard_map over the ('dcn','data') mesh
    (Experiment wraps it): `axis_names` are the mesh axes to pmean gradients,
    BN statistics, and metrics over.  Explicit collectives (rather than
    GSPMD auto-partitioning) because the Pallas DSP kernels are opaque to
    the SPMD partitioner — under shard_map each shard runs them on its local
    batch, which is exactly the embarrassingly-parallel semantics they have
    (SURVEY.md §2.4).
    """
    dcfg, lcfg = cfg.dsp, cfg.loss
    n_fft, hop = dcfg.n_fft, dcfg.hop_length
    g_tx, d_tx = make_optimizers(cfg)
    # "batch" carries BN running stats; "spectral" carries power-iteration
    # vectors — both live in the 'batch_stats' mutable collection.
    has_bn = cfg.model.d_norm in ("batch", "spectral")

    # Composite reconstruction domains: "a+b" sums the per-domain losses
    # (weights from recon_domain_weights); PIT matches in the first one.
    domains = tuple(lcfg.recon_domain.split("+"))
    for _dn in domains:
        if _dn not in ("spec", "mag", "wav", "cspec"):
            raise ValueError(f"unknown recon domain {_dn!r} "
                             f"(in {lcfg.recon_domain!r})")
    dweights = lcfg.recon_domain_weights or (1.0,) * len(domains)
    if len(dweights) != len(domains):
        raise ValueError(
            f"recon_domain_weights has {len(dweights)} entries for "
            f"{len(domains)} domains in {lcfg.recon_domain!r}")

    need_est_spec = (any(d in ("wav", "cspec") for d in domains)
                     or dcfg.mask_type != "magnitude")
    # Dropout (ModelConfig.dropout): modules are deterministic unless
    # train=True AND a 'dropout' rng is threaded through apply().
    use_dropout = cfg.model.dropout > 0.0

    def _rngs(rng):
        return {"dropout": rng} if (use_dropout and rng is not None) else None

    # g_remat: recompute G's forward during the backward instead of
    # stashing its intermediate activations — exact same function (the
    # checkpoint saves only the masks), trading ~1x extra G-forward FLOPs
    # (MXU measured 23% busy on music) for the activation-stash HBM
    # traffic (the measured binding wall on every preset — roofline,
    # BASELINE.md round 4).
    g_remat = bool(getattr(cfg.model, "g_remat", False))

    def g_forward(g_params, feats, spec_mix, mag_mix, train: bool, rng=None):
        def _apply(p, f):
            return g.apply(_g_vars(p), f, train=train, rngs=_rngs(rng))

        masks = (jax.checkpoint(_apply) if g_remat else _apply)(
            g_params, feats)
        if need_est_spec:
            est_spec = apply_mask(spec_mix, masks, dcfg.mask_type)
            est_mag = jnp.abs(est_spec)
        else:
            # Magnitude masks: |m·X| == m·|X| — skip the complex multiply
            # and its 2x-sized materialization (the step is HBM-bound).
            est_spec = None
            est_mag = masks * mag_mix[:, None]
        est_logmag = jnp.log(est_mag + dcfg.eps)
        return masks, est_spec, est_mag, est_logmag

    d_in_dtype = jnp.dtype(cfg.model.compute_dtype)

    d_fold = cfg.model.d_input_fold

    def d_input(mix_logmag, cand_logmag):
        """(B,T,K) mixture + (B,S,T,K) candidates -> (B*S, T/f, K, 2f).
        D always judges (mixture, candidate) linear log-magnitude pairs.
        Materialized in the compute dtype.  d_input_fold > 1 folds f
        consecutive frames into channels — C=2 tensors at full (T, K)
        resolution force padded TPU layouts (profiled as the hottest op
        family in the step); the stem conv shrinks by the same factor so
        the discriminator computes the same function class."""
        b, s = cand_logmag.shape[:2]
        mix_b = jnp.broadcast_to(mix_logmag[:, None], cand_logmag.shape)
        x = jnp.stack(
            [mix_b.astype(d_in_dtype), cand_logmag.astype(d_in_dtype)], axis=-1
        )
        x = x.reshape(b * s, *x.shape[2:])            # (B·S, T, K, 2)
        if d_fold > 1:
            bs, t_, k_, c_ = x.shape
            t2 = (t_ // d_fold) * d_fold
            x = x[:, :t2].reshape(bs, t2 // d_fold, d_fold, k_, c_)
            x = jnp.moveaxis(x, 2, 3).reshape(
                bs, t2 // d_fold, k_, d_fold * c_)
        return x

    def d_apply(d_params, d_stats, x, update_stats: bool, rng=None):
        variables = _d_vars(d_params, d_stats)
        if has_bn:
            logits, new_vars = d.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs=_rngs(rng),
            )
            # A shallow D may have no BN layer at all (norm starts at layer 1).
            new_stats = new_vars.get("batch_stats", d_stats)
            return logits, (new_stats if update_stats else d_stats)
        return d.apply(variables, x, train=True, rngs=_rngs(rng)), d_stats

    # ---- D update --------------------------------------------------------

    d_noise = float(cfg.train.d_instance_noise)

    def _with_instance_noise(x, rng):
        # Instance noise: overlap the real/fake D-input distributions so a
        # winning D cannot drive d_loss to ~0 (measured on every hard-
        # protocol row) — fresh per D evaluation, both halves, same std.
        if d_noise <= 0.0:
            return x
        return x + d_noise * jax.random.normal(rng, x.shape, x.dtype)

    r1_gamma = float(cfg.train.r1_gamma)

    def d_loss_fn(d_params, d_stats, x, rng):
        # x = concat(real-pair, fake-pair) D input, built ONCE per step
        # outside the grads (VERDICT r1: it is a stop-gradient constant in
        # the D loss, so no per-d_step rebuild and no duplicate G forward).
        # Real+fake through one D pass: one big MXU-friendly batch, and BN
        # stats see the same distribution every step.
        rng, rng_n, rng_r1 = jax.random.split(rng, 3)
        x = _with_instance_noise(x, rng_n)
        logits, new_stats = d_apply(d_params, d_stats, x, update_stats=True,
                                    rng=rng)
        real, fake = jnp.split(logits, 2)
        loss = gan_d_loss(real, fake, lcfg.gan_loss)
        if r1_gamma > 0.0:
            # Zero-centered R1 gradient penalty (Mescheder et al. 2018):
            # (gamma/2) E[||d D(x)/d x||^2] on the REAL inputs D sees.
            # Penalizing D's input-gradient norm around the data keeps its
            # decision surface from steepening without bound once it wins —
            # the measured hard-protocol failure mode (d_loss -> ~0, G's
            # adversarial gradient gone).  One extra D fwd+bwd on the real
            # half; the outer d_params grad differentiates THROUGH this
            # input-grad (the whole point — the penalty shapes D).
            x_real = jnp.split(x, 2)[0].astype(jnp.float32)

            def real_logit_sum(xr):
                lg, _ = d_apply(d_params, d_stats, xr.astype(x.dtype),
                                update_stats=False, rng=rng_r1)
                return jnp.sum(lg.astype(jnp.float32))

            gx = jax.grad(real_logit_sum)(x_real)
            r1 = jnp.mean(jnp.sum(
                jnp.square(gx), axis=tuple(range(1, gx.ndim))))
            loss = loss + 0.5 * r1_gamma * r1
        return loss, (new_stats, real.mean(), fake.mean())

    # ---- full step -------------------------------------------------------

    def _pmean(x):
        return jax.lax.pmean(x, axis_names) if axis_names else x

    def train_step(state: TrainState, data: jax.Array, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_mix, rng_data, rng_g, rng_dl, rng_ga = jax.random.split(rng, 5)
        if use_dropout or d_noise > 0.0:
            # Decorrelate dropout masks AND D instance noise across
            # data-parallel shards: the step rng is replicated, so without
            # this every shard would apply the SAME mask/noise to its
            # different local batch.  (Mixing / sampling keys already
            # decorrelate via per-global-example fold_in.)  Folded
            # UNCONDITIONALLY — fold_in(k, 0) != k, so the unsharded step
            # must fold too for shard 0 to genuinely match it (r2 advisor
            # finding).
            shard = _shard_offset(axis_names, 1)
            rng_g, rng_dl, rng_ga = (
                jax.random.fold_in(k, shard)
                for k in (rng_g, rng_dl, rng_ga)
            )
        if from_bank:
            from gan_sass_tf_tpu.data.device_bank import sample_bank

            offset = _shard_offset(axis_names, local_batch)
            sources = sample_bank(data, rng_data, local_batch, offset)
        else:
            sources = data
            offset = _shard_offset(axis_names, sources.shape[0])
        mixture, scaled = mix_sources(sources, rng_mix, cfg.data, offset)
        # Fused STFT+features: one kernel emits exactly what the step needs
        # (for magnitude masks the complex spectrum is never materialized).
        mix_emit = (("spec",) if need_est_spec else ()) + ("mag", "logmag") \
            + (("logmel",) if dcfg.feature == "logmel" else ())
        mix_out = ops.stft_features(mixture, dcfg, emit=mix_emit,
                                    backend=dcfg.backend)
        spec_mix = mix_out.get("spec")
        mag_mix = mix_out["mag"]
        mix_logmag = mix_out["logmag"]
        feats = mix_out["logmel"] if dcfg.feature == "logmel" else mix_logmag
        mag_domain = "mag" in domains
        cspec_domain = "cspec" in domains
        wav_domain = "wav" in domains
        mag_primary = domains[0] == "mag"   # PIT matches in the 1st domain
        tgt_emit = (("mag", "logmag") if mag_domain else ("logmag",)) \
            + (("spec",) if cspec_domain else ())
        tgt_out = ops.stft_features(scaled, dcfg, emit=tgt_emit,
                                    backend=dcfg.backend)
        tgt_logmag = tgt_out["logmag"]
        tgt_mag = tgt_out.get("mag")
        tgt_spec = tgt_out.get("spec")

        # ONE G forward per step, shared between the D updates (via
        # stop_gradient views), the PIT matching, and the G loss: the whole
        # alternating schedule lives inside one value_and_grad over
        # g_params.  Everything D-side depends on the estimate only through
        # stop_gradient, so the outer AD sees it as constant — identical
        # math to the old two-forward formulation, one full G forward (the
        # step's biggest activation-traffic producer) cheaper.
        def g_loss_and_d_update(g_params):
            _, est_spec, est_mag, est_logmag = g_forward(
                g_params, feats, spec_mix, mag_mix, train=True, rng=rng_g)
            est_logmag_sg = jax.lax.stop_gradient(est_logmag)
            est_match = (jax.lax.stop_gradient(est_mag) if mag_primary
                         else est_logmag_sg)
            tgt_match = tgt_mag if mag_primary else tgt_logmag
            if lcfg.use_pit:
                # Match in the reconstruction domain.  The permutation is
                # argmin'd once per step (no grad — it is piecewise-constant
                # in the params, so the gradient is unchanged a.e. and the
                # (B,S,S,T,K) pairwise tensor never enters the backward
                # pass).  bf16 + 4x4 average pooling of the (T,K) grid cut
                # its traffic ~32x with unchanged permutation decisions (the
                # matching statistic is a mean over the grid anyway).
                match_kind = ("l1" if lcfg.recon_loss == "si_sdr"
                              else lcfg.recon_loss)
                perm = pooled_match_perm(est_match, tgt_match, match_kind)
                tgt_logmag_aligned = align_to_perm(tgt_logmag, perm)
                tgt_mag_aligned = (
                    align_to_perm(tgt_mag, perm) if mag_domain else None
                )
                scaled_aligned = (
                    align_to_perm(scaled, perm) if wav_domain else scaled
                )
                tgt_spec_aligned = (
                    align_to_perm(tgt_spec, perm) if cspec_domain else None
                )
            else:
                tgt_logmag_aligned = tgt_logmag
                tgt_mag_aligned = tgt_mag
                scaled_aligned = scaled
                tgt_spec_aligned = tgt_spec

            # -- D updates (stop-gradient constants w.r.t. g_params) -------
            # The (B·S,T,K,2) pair tensors are built once per step and
            # reused across every d_step (VERDICT r1 item 3).
            x_d = jnp.concatenate([
                d_input(mix_logmag, tgt_logmag_aligned),
                d_input(mix_logmag, est_logmag_sg),
            ])
            d_params = state.d_params
            d_stats = state.d_batch_stats
            d_opt = state.d_opt_state
            d_loss = jnp.zeros(())
            real_m = fake_m = jnp.zeros(())
            for di in range(cfg.train.d_steps):  # static schedule
                (d_loss, (d_stats, real_m, fake_m)), d_grads = \
                    jax.value_and_grad(d_loss_fn, has_aux=True)(
                        d_params, d_stats, x_d,
                        jax.random.fold_in(rng_dl, di))
                d_grads = _pmean(d_grads)      # DP all-reduce over the mesh
                d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
                d_params = jax.tree_util.tree_map(
                    lambda p, u: p + u, d_params, d_updates
                )
            if d_stats:
                d_stats = _pmean(d_stats)      # sync-BN statistics

            # -- G loss against the just-updated discriminator -------------
            # Domains: "spec" = log-magnitude L1/MSE (the reference's loss);
            # "mag" = linear magnitude (does not over-weight silent bins);
            # "wav" = waveform through the iSTFT VJP (supports si_sdr loss);
            # "cspec" = complex-spectrum (re, im) — phase-aware, the right
            # domain for complex masks (BASELINE.json:10).  Composite
            # ("cspec+wav") sums the weighted per-domain losses; si_sdr as
            # the recon kind applies to the wav term, the spectral terms
            # fall back to L1 (same rule as the PIT matching statistic).
            spec_kind = ("l1" if lcfg.recon_loss == "si_sdr"
                         else lcfg.recon_loss)

            def domain_rec(dname):
                if dname == "wav":
                    est_r = ops.istft(est_spec, n_fft, hop,
                                      window=dcfg.window,
                                      backend=dcfg.backend,
                                      win_length=dcfg.win_length)
                    tgt_r = scaled_aligned[..., : est_r.shape[-1]]
                    if lcfg.recon_loss == "si_sdr":
                        from gan_sass_tf_tpu.losses import si_sdr as _si_sdr

                        return -jnp.mean(_si_sdr(est_r, tgt_r))
                    return recon_loss(est_r, tgt_r, lcfg.recon_loss)
                if dname == "cspec":
                    # (re, im) L1/MSE: phase-AWARE — with complex masks,
                    # spec/mag domains leave the estimated phase completely
                    # unsupervised (SI-SDR is phase-sensitive, so such a
                    # model never separates in the waveform sense).
                    est_ri = jnp.stack(
                        [jnp.real(est_spec), jnp.imag(est_spec)], axis=-1)
                    tgt_ri = jnp.stack(
                        [jnp.real(tgt_spec_aligned),
                         jnp.imag(tgt_spec_aligned)], axis=-1)
                    return recon_loss(est_ri, tgt_ri, spec_kind)
                if dname == "mag":
                    return recon_loss(est_mag, tgt_mag_aligned, spec_kind)
                return recon_loss(est_logmag, tgt_logmag_aligned, spec_kind)

            rec = sum(w * domain_rec(dn)
                      for w, dn in zip(dweights, domains))
            # Adversarial term needs the differentiable est_logmag — the
            # only pair tensor rebuilt (its fake half carries the grad).
            # D sees instance noise of the same std here as in its own
            # updates — FRESH noise, not the D-update keys' (noise is
            # additive, so the grad path through est_logmag is untouched).
            rng_ga2, rng_gn = jax.random.split(rng_ga)
            fake_logits, _ = d_apply(
                d_params, d_stats,
                _with_instance_noise(d_input(mix_logmag, est_logmag),
                                     rng_gn),
                update_stats=False, rng=rng_ga2,
            )
            adv = gan_g_loss(fake_logits, lcfg.gan_loss)
            loss = lcfg.adv_weight * adv + lcfg.recon_weight * rec
            return loss, (d_params, d_stats, d_opt,
                          d_loss, real_m, fake_m, adv, rec)

        (g_loss, aux), g_grads = jax.value_and_grad(
            g_loss_and_d_update, has_aux=True
        )(state.g_params)
        d_params, d_stats, d_opt, d_loss, real_m, fake_m, adv, rec = aux
        g_grads = _pmean(g_grads)              # DP all-reduce over the mesh
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.g_params, g_updates
        )
        # EMA shadow of G (train.g_ema): eval/inference read the averaged
        # weights, which integrate out the G/D oscillation.  Warm-up ramp
        # min(decay, (1+t)/(10+t)) so early steps track the live params
        # instead of the random init (t is the POST-update step count).
        ema = cfg.train.g_ema
        if ema > 0.0:
            t = (state.step + 1).astype(jnp.float32)
            decay = jnp.minimum(jnp.float32(ema), (1.0 + t) / (10.0 + t))
            g_ema = jax.tree_util.tree_map(
                lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
                state.g_ema_params, g_params,
            )
        else:
            g_ema = state.g_ema_params

        new_state = TrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            d_batch_stats=d_stats,
            g_opt_state=g_opt,
            d_opt_state=d_opt,
            g_ema_params=g_ema,
        )
        metrics = _pmean({
            "d_loss": d_loss,
            "g_loss": g_loss,
            "g_adv": adv,
            "g_recon": rec,
            "d_real_logit": real_m,
            "d_fake_logit": fake_m,
        })
        return new_state, metrics

    return train_step


def build_separate_fn(cfg, g) -> Callable[[Any, jax.Array], jax.Array]:
    """separate(g_params, mixture (B, T)) -> (B, S, T_grid) wavs — the fused
    inference graph (SURVEY.md §3.2): stft → G → mask·STFT → iSTFT/OLA."""
    dcfg = cfg.dsp

    def separate(g_params, mixture):
        feat_key = "logmel" if dcfg.feature == "logmel" else "logmag"
        out = ops.stft_features(mixture, dcfg, emit=("spec", feat_key),
                                backend=dcfg.backend)
        masks = g.apply(_g_vars(g_params), out[feat_key], train=False)
        # Fused mask-apply + iSTFT/OLA: separated complex spectra never
        # materialize in HBM (BASELINE.json:5).
        wavs = ops.masked_istft(
            out["spec"], masks, dcfg.n_fft, dcfg.hop_length,
            window=dcfg.window, mask_type=dcfg.mask_type,
            backend=dcfg.backend, win_length=dcfg.win_length,
        )
        # Length-stable output: with win_length < n_fft the tf-exact iSTFT
        # is (n_fft - win_length) samples shorter than the input grid — pad
        # back with zeros so callers always see (B, S, T_in).  The zeros
        # are honest (no analysis frame covers those samples, tf.signal
        # semantics); the streaming paths read a hop-aligned extension per
        # chunk and crop it off so the silent tail never enters their
        # cross-fades (infer/streaming._chunk_geometry).
        t = mixture.shape[-1]
        if wavs.shape[-1] < t:
            wavs = jnp.pad(
                wavs, [(0, 0)] * (wavs.ndim - 1) + [(0, t - wavs.shape[-1])]
            )
        return wavs[..., :t]

    return separate


def build_eval_step(cfg, g, axis_names: Tuple[str, ...] = ()) -> Callable[[Any, jax.Array, jax.Array], Dict[str, jax.Array]]:
    """Jitted eval: mix → separate → best-permutation SI-SDR (the contract
    metric, BASELINE.json:2) plus the input-mixture SI-SDR for reference."""
    separate = build_separate_fn(cfg, g)

    def eval_step(g_params, sources, rng):
        offset = _shard_offset(axis_names, sources.shape[0])
        mixture, scaled = mix_sources(sources, rng, cfg.data, offset)
        est = separate(g_params, mixture)
        t = est.shape[-1]
        tgt = scaled[..., :t]
        sisdr = pit_si_sdr(est, tgt).mean()
        mix_rep = jnp.broadcast_to(mixture[:, None, :t], tgt.shape)
        baseline = pit_si_sdr(mix_rep, tgt).mean()
        out = {"si_sdr": sisdr, "si_sdr_mix": baseline,
               "si_sdr_improvement": sisdr - baseline}
        return jax.lax.pmean(out, axis_names) if axis_names else out

    return eval_step
