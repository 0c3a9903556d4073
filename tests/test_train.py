"""Integration tests (SURVEY.md §4.2.4): config-1 toy training on CPU —
N steps, finite & decreasing losses, separate() round trip; plus the
alternating-update semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gan_sass_tf_tpu import config
from gan_sass_tf_tpu.data import make_dataset
from gan_sass_tf_tpu.train import Experiment


def _tiny_cfg(**data_kw):
    cfg = config.get_config("2src_toy_cpu")
    return cfg.replace(
        train=cfg.train.__class__(**{**cfg.train.__dict__,
                                     "batch_size": 8, "log_every": 1}),
        data=cfg.data.__class__(**{**cfg.data.__dict__,
                                   "segment_seconds": 0.5, **data_kw}),
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "g_channels": (8, 16),
                                     "d_channels": (8, 16)}),
    )


def test_toy_training_losses_finite_and_learning(tmp_path):
    cfg = _tiny_cfg()
    exp = Experiment(cfg, workdir=None)
    history = []
    exp.train(num_steps=30, log_fn=lambda s, m: history.append(dict(m)))
    assert history, "no metrics logged"
    for m in history:
        for k, v in m.items():
            assert np.isfinite(v), f"{k} not finite: {v}"
    # Reconstruction loss should improve over the toy run.
    first = np.mean([h["g_recon"] for h in history[:5]])
    last = np.mean([h["g_recon"] for h in history[-5:]])
    assert last < first, f"recon did not decrease: {first} -> {last}"


def test_d_instance_noise_trains_and_perturbs_d():
    """train.d_instance_noise: additive Gaussian on every D input (real and
    fake halves + the G-side adversarial eval).  Same seed, one step: the
    D-side metrics must differ from the clean run (noise actually reaches
    the logits) and training must stay finite."""
    base = _tiny_cfg()
    noisy = base.replace(train=base.train.__class__(**{
        **base.train.__dict__, "d_instance_noise": 0.5}))
    runs = {}
    for name, cfg in (("clean", base), ("noisy", noisy)):
        exp = Experiment(cfg, workdir=None)
        hist = []
        exp.train(num_steps=5, log_fn=lambda s, m: hist.append(dict(m)))
        for m in hist:
            for k, v in m.items():
                assert np.isfinite(v), f"{name} {k} not finite: {v}"
        runs[name] = hist[0]["d_loss"]
    assert runs["clean"] != runs["noisy"]


def test_separate_roundtrip():
    cfg = _tiny_cfg()
    exp = Experiment(cfg, workdir=None)
    ds = make_dataset(cfg, seed=7)
    sources = ds.batch(cfg.train.batch_size)
    mixture = sources.sum(axis=1)
    wavs = exp.separate_fn(exp.state.g_params, jnp.asarray(mixture))
    b, s = cfg.train.batch_size, cfg.data.num_sources
    assert wavs.shape[:2] == (b, s)
    assert wavs.shape[2] <= mixture.shape[1]
    assert np.isfinite(np.asarray(wavs)).all()


def test_eval_step_reports_si_sdr():
    cfg = _tiny_cfg()
    exp = Experiment(cfg, workdir=None)
    out = exp.evaluate(num_batches=1)
    assert set(out) == {"si_sdr", "si_sdr_mix", "si_sdr_improvement"}


def test_eval_split_knob_and_dataset_arg():
    """data.eval_split selects the split Experiment evaluates on, and
    evaluate(dataset=...) overrides it per call (the A/B that separates
    generalization gaps from training regressions)."""
    cfg = _tiny_cfg(eval_split="train")
    exp = Experiment(cfg, workdir=None)
    assert exp.eval_dataset.split == "train"
    ds_all = make_dataset(cfg, seed=1, split="all")
    out = exp.evaluate(num_batches=1, dataset=ds_all)
    assert np.isfinite(out["si_sdr_improvement"])
    assert np.isfinite(out["si_sdr"])


def test_alternating_update_changes_both_nets():
    cfg = _tiny_cfg()
    exp = Experiment(cfg, workdir=None)
    g0 = jax.tree_util.tree_leaves(exp.state.g_params)[0].copy()
    d0 = jax.tree_util.tree_leaves(exp.state.d_params)[0].copy()
    exp.train(num_steps=1)
    g1 = jax.tree_util.tree_leaves(exp.state.g_params)[0]
    d1 = jax.tree_util.tree_leaves(exp.state.d_params)[0]
    assert np.abs(np.asarray(g1) - np.asarray(g0)).max() > 0
    assert np.abs(np.asarray(d1) - np.asarray(d0)).max() > 0
    assert int(exp.state.step) == 1


def test_g_ema_tracks_params_and_drives_eval():
    """train.g_ema keeps an EMA shadow of G params: exact one-step update
    (warm-up-ramped decay), eval_g_params returns it, and g_ema=0 disables
    it entirely (None leafless node — checkpoint shape unchanged)."""
    cfg = _tiny_cfg()
    cfg = cfg.replace(
        train=cfg.train.__class__(**{**cfg.train.__dict__, "g_ema": 0.99}))
    exp = Experiment(cfg, workdir=None)
    g0 = jax.tree_util.tree_map(np.asarray, exp.state.g_params)
    exp.train(num_steps=1)
    g1 = jax.tree_util.tree_leaves(exp.state.g_params)
    ema = jax.tree_util.tree_leaves(exp.state.g_ema_params)
    # decay at t=1 is min(0.99, 2/11)
    decay = 2.0 / 11.0
    for e, p1, p0 in zip(ema, g1, jax.tree_util.tree_leaves(g0)):
        expect = p0 * decay + np.asarray(p1) * (1.0 - decay)
        np.testing.assert_allclose(np.asarray(e), expect, rtol=1e-5,
                                   atol=1e-6)
    # eval consumes the EMA weights.
    assert exp.eval_g_params is exp.state.g_ema_params
    out = exp.evaluate(num_batches=1)
    assert np.isfinite(out["si_sdr_improvement"])

    cfg_off = _tiny_cfg()
    exp_off = Experiment(cfg_off, workdir=None)
    assert exp_off.state.g_ema_params is None
    assert exp_off.eval_g_params is exp_off.state.g_params


def test_g_ema_validation():
    cfg = _tiny_cfg()
    with pytest.raises(ValueError, match="g_ema"):
        cfg.train.__class__(**{**cfg.train.__dict__, "g_ema": 1.0})


def test_debug_leaks_smoke():
    """SURVEY §5.2: the jax.checking_leaks sanitizer is wired through
    Experiment(debug_leaks=True) and a clean step passes under it."""
    cfg = _tiny_cfg()
    try:
        exp = Experiment(cfg, workdir=None, debug_leaks=True)
        assert jax.config.jax_check_tracer_leaks
        m = exp.train(num_steps=1)
        assert np.isfinite(m["g_loss"])
    finally:
        jax.config.update("jax_check_tracer_leaks", False)


def test_training_with_noise_sources():
    cfg = _tiny_cfg(num_noise=1, snr_db=10.0)
    exp = Experiment(cfg, workdir=None)
    m = exp.train(num_steps=2)
    assert np.isfinite(m["g_loss"]) and np.isfinite(m["d_loss"])


def test_three_source_pit_training():
    base = config.get_config("3src_pit")
    cfg = base.replace(
        dsp=base.dsp.__class__(**{**base.dsp.__dict__, "n_fft": 128,
                                  "hop_length": 32, "win_length": 128}),
        train=base.train.__class__(**{**base.train.__dict__, "batch_size": 8}),
        data=base.data.__class__(**{**base.data.__dict__,
                                    "segment_seconds": 0.25}),
        model=base.model.__class__(**{**base.model.__dict__,
                                      "generator": "toy", "g_hidden": 32,
                                      "d_channels": (8, 16)}),
    )
    exp = Experiment(cfg, workdir=None)
    m = exp.train(num_steps=2)
    assert np.isfinite(m["g_loss"]) and np.isfinite(m["d_loss"])


@pytest.mark.parametrize("head_mode", ["dense", "interp"])
def test_logmel_feature_training(head_mode):
    """wsj0-style log-mel frontend: fused features path with both mel mask
    heads (the preset now defaults to 'interp'; 'dense' stays supported and
    keeps training-integration coverage here)."""
    base = config.get_config("wsj0_logmel")
    cfg = base.replace(
        dsp=base.dsp.__class__(**{**base.dsp.__dict__, "n_fft": 128,
                                  "hop_length": 32, "win_length": 128,
                                  "n_mels": 24}),
        train=base.train.__class__(**{**base.train.__dict__,
                                      "batch_size": 8}),
        data=base.data.__class__(**{**base.data.__dict__,
                                    "dataset": "synthetic",
                                    "segment_seconds": 0.25}),
        model=base.model.__class__(**{**base.model.__dict__,
                                      "g_channels": (8,),
                                      "d_channels": (8, 16),
                                      "g_head_mode": head_mode}),
    )
    exp = Experiment(cfg, workdir=None)
    m = exp.train(num_steps=2)
    assert np.isfinite(m["g_loss"]) and np.isfinite(m["d_loss"])


def test_complex_mask_training():
    """music_complex_44k-style complex-STFT masks (BASELINE.json:10)."""
    base = config.get_config("music_complex_44k")
    cfg = base.replace(
        dsp=base.dsp.__class__(**{**base.dsp.__dict__, "sample_rate": 8000,
                                  "n_fft": 128, "hop_length": 32,
                                  "win_length": 128}),
        train=base.train.__class__(**{**base.train.__dict__,
                                      "batch_size": 8}),
        data=base.data.__class__(**{**base.data.__dict__,
                                    "segment_seconds": 0.25}),
        model=base.model.__class__(**{**base.model.__dict__,
                                      "g_channels": (8,),
                                      "d_channels": (8, 16)}),
    )
    exp = Experiment(cfg, workdir=None)
    m = exp.train(num_steps=2)
    assert np.isfinite(m["g_loss"]) and np.isfinite(m["d_loss"])


def test_complex_mask_learns_separation():
    """VERDICT r2 item 1 (CPU leg): the complex-mask GAN pipeline must
    actually LEARN separation, not just produce finite losses — positive
    eval SI-SDR improvement after a short train on music-like (vocal vs
    accompaniment) fixtures at toy geometry.

    Runs in a SUBPROCESS: this exact 150-step in-process train has
    triggered an intermittent XLA-CPU `Fatal Python error: Aborted` four
    times across rounds 2-3 (always this test, only under a long
    in-process suite on the 1-CPU box) — isolation turns a suite-killing
    abort into a plain test failure and sidesteps the in-process state
    accumulation that correlates with it.

    The subprocess runs SINGLE-device: it would otherwise inherit the
    conftest's 8-virtual-device XLA_FLAGS, and an 8-way all-reduce on an
    oversubscribed host can blow XLA-CPU's fixed 40 s collective
    rendezvous deadline (observed round 5: 6/8 threads arrived, F-abort).
    This test is about LEARNING; DP equivalence has its own tests."""
    import os
    import re
    import subprocess
    import sys as _sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
from gan_sass_tf_tpu import config
from gan_sass_tf_tpu.train import Experiment

base = config.get_config("music_complex_44k")
cfg = base.replace(
    dsp=base.dsp.__class__(**{**base.dsp.__dict__, "sample_rate": 8000,
                              "n_fft": 256, "hop_length": 64,
                              "win_length": 256}),
    train=base.train.__class__(**{**base.train.__dict__,
                                  "batch_size": 8, "log_every": 50}),
    data=base.data.__class__(**{**base.data.__dict__,
                                "segment_seconds": 0.5,
                                "slot_profiles": ("vocal", "accomp")}),
    model=base.model.__class__(**{**base.model.__dict__,
                                  "g_channels": (8, 16),
                                  "d_channels": (8, 16),
                                  "compute_dtype": "float32"}),
    mesh=base.mesh.__class__(data_axis_size=-1),
)
exp = Experiment(cfg, workdir=None)
exp.train(num_steps=150)
ev = exp.evaluate(num_batches=2)
print("SI_SDRI_RESULT", ev["si_sdr_improvement"])
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""))
    proc = subprocess.run(
        [_sys.executable, "-c", code], cwd=repo, timeout=900,
        capture_output=True, text=True, env=env,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-3000:]}"
    si = float(proc.stdout.split("SI_SDRI_RESULT")[-1])
    assert si > 1.0, f"complex-mask training failed to separate: {si}"


def test_wav_domain_recon_training():
    """Waveform-domain reconstruction loss: trains through the iSTFT VJP."""
    base = _tiny_cfg()
    cfg = base.replace(
        loss=base.loss.__class__(**{**base.loss.__dict__,
                                    "recon_domain": "wav"}),
    )
    exp = Experiment(cfg, workdir=None)
    history = []
    exp.train(num_steps=10, log_fn=lambda s, m: history.append(dict(m)))
    for m in history:
        assert np.isfinite(m["g_recon"])
    assert history[-1]["g_recon"] < history[0]["g_recon"] * 2  # sane scale


def _tiny_complex_cfg():
    base = config.get_config("music_complex_44k")
    return base.replace(
        dsp=base.dsp.__class__(**{**base.dsp.__dict__, "sample_rate": 8000,
                                  "n_fft": 128, "hop_length": 32,
                                  "win_length": 128}),
        train=base.train.__class__(**{**base.train.__dict__,
                                      "batch_size": 8, "log_every": 1}),
        data=base.data.__class__(**{**base.data.__dict__,
                                    "segment_seconds": 0.25}),
        model=base.model.__class__(**{**base.model.__dict__,
                                      "g_channels": (8,),
                                      "d_channels": (8, 16),
                                      "compute_dtype": "float32"}),
    )


def test_composite_recon_domain_is_weighted_sum():
    """recon_domain="cspec+wav": the combined recon term equals the weighted
    sum of the single-domain terms from identical init/rng/data (the recon
    loss does not depend on the D update, so one step suffices)."""
    def one_step_recon(domain, weights=()):
        base = _tiny_complex_cfg()
        cfg = base.replace(
            loss=base.loss.__class__(**{**base.loss.__dict__,
                                        "recon_domain": domain,
                                        "recon_domain_weights": weights}),
        )
        history = []
        Experiment(cfg, workdir=None).train(
            num_steps=1, log_fn=lambda s, m: history.append(dict(m)))
        return history[0]["g_recon"]

    a = one_step_recon("cspec")
    b = one_step_recon("wav")
    ab = one_step_recon("cspec+wav", (0.5, 2.0))
    np.testing.assert_allclose(ab, 0.5 * a + 2.0 * b, rtol=1e-4)


def test_composite_recon_domain_validation():
    base = _tiny_complex_cfg()
    bad = base.replace(loss=base.loss.__class__(**{
        **base.loss.__dict__, "recon_domain": "cspec+phase"}))
    with pytest.raises(ValueError, match="unknown recon domain"):
        Experiment(bad, workdir=None)
    bad2 = base.replace(loss=base.loss.__class__(**{
        **base.loss.__dict__, "recon_domain": "cspec+wav",
        "recon_domain_weights": (1.0,)}))
    with pytest.raises(ValueError, match="recon_domain_weights"):
        Experiment(bad2, workdir=None)


def test_mag_domain_training():
    """Linear-magnitude reconstruction domain."""
    base = _tiny_cfg()
    cfg = base.replace(
        loss=base.loss.__class__(**{**base.loss.__dict__,
                                    "recon_domain": "mag"}),
    )
    exp = Experiment(cfg, workdir=None)
    m = exp.train(num_steps=3)
    assert np.isfinite(m["g_recon"]) and np.isfinite(m["d_loss"])


def test_si_sdr_loss_training():
    """Waveform-domain negative-SI-SDR loss through the iSTFT VJP."""
    base = _tiny_cfg()
    cfg = base.replace(
        loss=base.loss.__class__(**{**base.loss.__dict__,
                                    "recon_domain": "wav",
                                    "recon_loss": "si_sdr",
                                    "recon_weight": 1.0}),
    )
    exp = Experiment(cfg, workdir=None)
    history = []
    exp.train(num_steps=30, log_fn=lambda s, m: history.append(dict(m)))
    assert all(np.isfinite(h["g_recon"]) for h in history)
    # -SI-SDR trends down (separation improving); tolerate step noise
    first = np.mean([h["g_recon"] for h in history[:5]])
    last = np.mean([h["g_recon"] for h in history[-5:]])
    assert last < first + 0.5, f"-SI-SDR exploded: {first} -> {last}"


def test_spectral_norm_d_training():
    """GAN training with a spectral-normalized discriminator."""
    base = _tiny_cfg()
    cfg = base.replace(
        model=base.model.__class__(**{**base.model.__dict__,
                                      "d_norm": "spectral"}),
    )
    exp = Experiment(cfg, workdir=None)
    m = exp.train(num_steps=3)
    assert np.isfinite(m["g_loss"]) and np.isfinite(m["d_loss"])


def test_patch_discriminator_training():
    base = _tiny_cfg()
    cfg = base.replace(
        model=base.model.__class__(**{**base.model.__dict__,
                                      "discriminator": "patch"}),
    )
    exp = Experiment(cfg, workdir=None)
    m = exp.train(num_steps=2)
    assert np.isfinite(m["g_loss"]) and np.isfinite(m["d_loss"])


def test_multi_step_dispatch():
    """steps_per_dispatch: K optimizer steps per jitted call (bank mode)."""
    base = _tiny_cfg()
    cfg = base.replace(
        train=base.train.__class__(**{**base.train.__dict__,
                                      "steps_per_dispatch": 4,
                                      "log_every": 4}),
        data=base.data.__class__(**{**base.data.__dict__,
                                    "device_bank": True,
                                    "bank_utterances": 8}),
    )
    exp = Experiment(cfg, workdir=None)
    history = []
    exp.train(num_steps=8, log_fn=lambda s, m: history.append((s, dict(m))))
    assert int(exp.state.step) == 8
    assert [s for s, _ in history] == [4, 8]
    assert all(np.isfinite(v) for _, m in history for v in m.values())


def test_multi_step_dispatch_remainder():
    """ADVICE r1: train(N) with N % steps_per_dispatch != 0 must run EXACTLY
    N optimizer steps (shorter final dispatch), not ceil(N/spd)*spd."""
    base = _tiny_cfg()
    cfg = base.replace(
        train=base.train.__class__(**{**base.train.__dict__,
                                      "steps_per_dispatch": 4,
                                      "log_every": 100}),
        data=base.data.__class__(**{**base.data.__dict__,
                                    "device_bank": True,
                                    "bank_utterances": 8}),
    )
    exp = Experiment(cfg, workdir=None)
    history = []
    exp.train(num_steps=6, log_fn=lambda s, m: history.append(s))
    assert int(exp.state.step) == 6
    assert history[-1] == 6


def test_tiny_frame_grid_pit_no_nan():
    """ADVICE r1: PIT matching must not NaN when the (T,K) grid is smaller
    than the 4x4 pooling window (empty-tensor mean)."""
    base = _tiny_cfg(segment_seconds=0.02)  # snaps to n_fft -> 1 frame
    cfg = base.replace(
        model=base.model.__class__(**{**base.model.__dict__,
                                      "generator": "toy",
                                      "g_time_stride": False,
                                      "d_channels": (8,)}),
    )
    assert cfg.num_frames < 4
    exp = Experiment(cfg, workdir=None)
    m = exp.train(num_steps=1)
    assert all(np.isfinite(v) for v in m.values())


def test_dropout_training_step():
    """Full train step with dropout enabled: finite losses, params move."""
    base = _tiny_cfg()
    cfg = base.replace(
        model=base.model.__class__(**{**base.model.__dict__,
                                      "dropout": 0.3}),
    )
    exp = Experiment(cfg, workdir=None)
    m = exp.train(num_steps=2)
    assert all(np.isfinite(v) for v in m.values())


def test_win_length_training_step():
    """Full train step with win_length < n_fft (tf frame_length semantics):
    frames/masks shapes consistent, losses finite, separation runs."""
    base = _tiny_cfg()
    cfg = base.replace(
        dsp=base.dsp.__class__(**{**base.dsp.__dict__, "win_length": 200}),
        loss=base.loss.__class__(**{**base.loss.__dict__,
                                    "recon_domain": "wav",
                                    "recon_loss": "si_sdr",
                                    "recon_weight": 1.0}),
    )
    exp = Experiment(cfg, workdir=None)
    m = exp.train(num_steps=2)
    assert all(np.isfinite(v) for v in m.values())
    ev = exp.evaluate(num_batches=1)
    assert np.isfinite(ev["si_sdr"])


def test_d_input_fold_training():
    """d_input_fold=2: D consumes (B*S, T/2, K, 4) with a stem shrunk to
    match — same function class, avoids C=2 tensor layouts on TPU."""
    base = _tiny_cfg()
    cfg = base.replace(
        model=base.model.__class__(**{**base.model.__dict__,
                                      "d_input_fold": 2}),
    )
    exp = Experiment(cfg, workdir=None)
    m = exp.train(num_steps=2)
    assert all(np.isfinite(v) for v in m.values())


def test_r1_penalty_changes_d_update_and_stays_finite():
    """train.r1_gamma: zero-centered gradient penalty on D's real inputs.
    The D loss gains a strictly positive term (||dD/dx||^2 of a random-init
    conv D is nonzero), so the very first d_loss must differ from the
    clean run at the same seed, and training must stay finite."""
    base = _tiny_cfg()
    r1 = base.replace(train=base.train.__class__(**{
        **base.train.__dict__, "r1_gamma": 10.0}))
    first = {}
    for name, cfg in (("clean", base), ("r1", r1)):
        exp = Experiment(cfg, workdir=None)
        hist = []
        exp.train(num_steps=5, log_fn=lambda s, m: hist.append(dict(m)))
        for m in hist:
            for k, v in m.items():
                assert np.isfinite(v), f"{name} {k} not finite: {v}"
        first[name] = hist[0]["d_loss"]
    assert first["clean"] != first["r1"]
    assert first["r1"] > first["clean"]  # penalty is additive and positive


def test_lr_schedule_decays_updates():
    """A cosine-to-~0 D lr schedule over a horizon shorter than the run:
    after the horizon the D update magnitude must collapse relative to a
    constant-lr run (same seed, same data)."""
    base = _tiny_cfg()
    sched = base.replace(train=base.train.__class__(**{
        **base.train.__dict__, "d_lr_schedule": "cosine",
        "lr_decay_steps": 5, "lr_end_factor": 1e-6}))

    def d_drift(cfg, steps):
        exp = Experiment(cfg, workdir=None)
        exp.train(num_steps=steps)
        before = jax.tree_util.tree_map(jnp.copy, exp.state.d_params)
        exp.train(num_steps=1)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            before, exp.state.d_params)
        return max(jax.tree_util.tree_leaves(diffs))

    drift_const = d_drift(base, 8)
    drift_sched = d_drift(sched, 8)   # past the 5-step horizon: lr ~ 0
    assert drift_sched < drift_const * 1e-2, (drift_sched, drift_const)


def test_reseed_reinitializes_without_retrace(tmp_path):
    """Experiment.reseed: new seed -> fresh params/bank/datasets, step back
    to 0, and the already-compiled step fn is reused (multi-seed protocol)."""
    cfg = _tiny_cfg()
    exp = Experiment(cfg, workdir=None)
    exp.train(num_steps=3)
    assert int(exp.state.step) == 3
    # np.asarray immediately: the jitted step donates the state buffers,
    # so live references go stale after the next train() call.
    p_before = np.asarray(jax.tree_util.tree_leaves(exp.state.g_params)[0])
    n_compiled = len(exp._step_fns)
    exp.reseed(7)
    assert int(exp.state.step) == 0
    p_after = np.asarray(jax.tree_util.tree_leaves(exp.state.g_params)[0])
    assert not np.allclose(p_before, p_after)
    exp.train(num_steps=2)
    assert int(exp.state.step) == 2
    assert len(exp._step_fns) == n_compiled   # no new step fn traced
    # Same seed -> bit-identical re-init (protocol reproducibility).
    exp.reseed(7)
    p2 = np.asarray(jax.tree_util.tree_leaves(exp.state.g_params)[0])
    assert np.array_equal(p_after, p2)


def test_g_remat_is_exact():
    """model.g_remat: jax.checkpoint around G's forward — recompute-in-
    backward must be the SAME function (identical metrics trajectory from
    identical init), not an approximation.  This is what makes remat the
    one speed lever that needs no quality A/B: if this test passes, every
    quality row measured without remat transfers verbatim."""
    base = _tiny_cfg()
    remat = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "g_remat": True}))
    hist = {}
    for name, cfg in (("plain", base), ("remat", remat)):
        exp = Experiment(cfg, workdir=None)
        rows = []
        exp.train(num_steps=4, log_fn=lambda s, m: rows.append(dict(m)))
        hist[name] = rows
    for a, b in zip(hist["plain"], hist["remat"]):
        for k in a:
            if k == "mixture_sec_per_sec":
                continue         # wall-clock rate, not a model metric
            np.testing.assert_allclose(
                a[k], b[k], rtol=1e-5, atol=1e-6,
                err_msg=f"metric {k} diverged under g_remat")
