"""Inference tests: public wav-in/wavs-out API (BASELINE.json:5) and the
streaming chunked overlap-add path (BASELINE.json:11)."""

import os

import numpy as np
import pytest

from gan_sass_tf_tpu import config, models
from gan_sass_tf_tpu.infer import separate, separate_file, separate_streaming
from gan_sass_tf_tpu.utils.wav_io import read_wav, write_wav


def _cfg():
    cfg = config.get_config("2src_toy_cpu")
    return cfg.replace(
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "g_channels": (8, 16)}),
    )


@pytest.fixture(scope="module")
def g_params():
    import jax

    cfg = _cfg()
    g = models.build_generator(cfg)
    feats = np.zeros((1, 16, cfg.dsp.feature_dim), np.float32)
    return cfg, g, g.init(jax.random.PRNGKey(0), feats)["params"]


def test_separate_arbitrary_length(g_params):
    cfg, g, params = g_params
    for t in [5000, 8000, 8192]:  # off-grid and on-grid lengths
        wav = np.random.default_rng(0).standard_normal(t).astype(np.float32)
        out = separate(params, cfg, wav)
        assert out.shape == (cfg.data.num_sources, t)
        assert np.isfinite(out).all()


def test_separate_file_roundtrip(g_params, tmp_path):
    cfg, g, params = g_params
    wav = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)).astype(np.float32)
    in_path = str(tmp_path / "mix.wav")
    write_wav(in_path, cfg.dsp.sample_rate, wav)
    paths = separate_file(params, cfg, in_path, str(tmp_path / "out"))
    assert len(paths) == cfg.data.num_sources
    for p in paths:
        assert os.path.exists(p)
        sr, w = read_wav(p)
        assert sr == cfg.dsp.sample_rate
        assert len(w) == len(wav)


def test_separate_file_sr_mismatch(g_params, tmp_path):
    cfg, g, params = g_params
    in_path = str(tmp_path / "bad.wav")
    write_wav(in_path, 44100, np.zeros(1000, np.float32))
    with pytest.raises(ValueError, match="sample rate"):
        separate_file(params, cfg, in_path, str(tmp_path))


def test_streaming_matches_oneshot_on_pure_tones(g_params):
    """Streaming chunked separation ≈ one-shot separation away from chunk
    boundaries (cross-fade makes boundaries approximate by design)."""
    cfg, g, params = g_params
    sr = cfg.dsp.sample_rate
    t = 3 * sr  # 3 chunks of 1 s
    n = np.arange(t) / sr
    wav = (np.sin(2 * np.pi * 300 * n) + np.sin(2 * np.pi * 1500 * n)).astype(
        np.float32
    )
    one = separate(params, cfg, wav)
    stream = separate_streaming(params, cfg, wav)
    assert stream.shape == one.shape == (2, t)
    assert np.isfinite(stream).all()
    # energy sanity: streaming output is not degenerate
    assert np.abs(stream).max() > 1e-4


def test_streaming_short_input(g_params):
    cfg, g, params = g_params
    wav = np.random.default_rng(1).standard_normal(2000).astype(np.float32)
    out = separate_streaming(params, cfg, wav)  # shorter than one chunk
    assert out.shape == (2, 2000)


def test_streaming_perm_alignment():
    """Chunks with swapped sources must be re-aligned to a consistent order."""
    from gan_sass_tf_tpu.infer.streaming import _align_chunk_permutations

    rng = np.random.default_rng(0)
    stride, overlap = 60, 20
    t_c = stride + overlap
    base = rng.standard_normal((2, 3 * stride + overlap)).astype(np.float32)
    chunks = np.stack(
        [base[:, i * stride : i * stride + t_c] for i in range(3)]
    )  # (3, 2, T_c) consistent ordering
    chunks[1] = chunks[1][::-1]  # swap sources in the middle chunk
    fixed = _align_chunk_permutations(chunks, stride, overlap)
    # overlap regions must now agree between neighbors
    for i in range(1, 3):
        np.testing.assert_allclose(
            fixed[i, :, :overlap], fixed[i - 1, :, stride:], atol=1e-6
        )


def test_cli_configs_and_overrides(capsys):
    from gan_sass_tf_tpu import cli

    assert cli.main(["configs"]) == 0
    out = capsys.readouterr().out
    assert "2src_toy_cpu" in out and "stream_v5e8" in out

    cfg = cli._apply_overrides(
        config.get_config("2src_toy_cpu"),
        ["train.batch_size=16", "dsp.feature=logmel", "model.g_channels=8,16"],
    )
    assert cfg.train.batch_size == 16
    assert cfg.dsp.feature == "logmel"
    assert cfg.model.g_channels == (8, 16)
    cfg = cli._apply_overrides(
        cfg, ["loss.recon_domain_weights=1.0,0.2"])   # float-tuple fields
    assert cfg.loss.recon_domain_weights == (1.0, 0.2)
    with pytest.raises(AttributeError):
        cli._apply_overrides(cfg, ["train.nope=1"])
    # Mutually-dependent overrides must work in EITHER order: sections are
    # replaced once with all their overrides, so __post_init__ validation
    # never sees a half-applied pair (a cosine schedule with its horizon
    # still at the 0 default was the failure mode).
    for pair in (["train.d_lr_schedule=cosine", "train.lr_decay_steps=1000"],
                 ["train.lr_decay_steps=1000", "train.d_lr_schedule=cosine"]):
        cfg2 = cli._apply_overrides(config.get_config("2src_toy_cpu"), pair)
        assert cfg2.train.d_lr_schedule == "cosine"
        assert cfg2.train.lr_decay_steps == 1000


def test_streaming_scan_variant(g_params):
    """Scan-carry low-latency streamer: one jitted program over all chunks,
    overlap state carried; covers the full input length."""
    from gan_sass_tf_tpu.infer import separate_streaming_scan

    cfg, g, params = g_params
    sr = cfg.dsp.sample_rate
    t = int(2.5 * sr)  # not a whole number of chunks
    n = np.arange(t) / sr
    wav = (np.sin(2 * np.pi * 300 * n) + np.sin(2 * np.pi * 1500 * n)).astype(
        np.float32
    )
    out = separate_streaming_scan(params, cfg, wav)
    assert out.shape == (cfg.data.num_sources, t)
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 1e-4


def test_oracle_irm_si_sdr_strongly_positive():
    """Regression for the iSTFT edge-amplification bug: with ORACLE ideal
    ratio masks, the full separate pipeline (mask -> fused iSTFT/OLA ->
    waveforms) must score strongly positive SI-SDR.  Before clamping the
    overlap-add envelope, float noise amplified by 1/env ~ 1e7 at the signal
    edges produced outliers that drove even oracle separation to ~-10 dB."""
    import jax
    import jax.numpy as jnp

    from gan_sass_tf_tpu import dsp, losses
    from gan_sass_tf_tpu.data import make_dataset
    from gan_sass_tf_tpu.data.mixer import mix_sources
    from gan_sass_tf_tpu.ops.dispatch import masked_istft

    cfg = config.get_config("2src_toy_cpu")
    cfg = cfg.replace(train=cfg.train.__class__(**{**cfg.train.__dict__,
                                                   "batch_size": 4}))
    src = jnp.asarray(make_dataset(cfg, seed=3).batch(4))
    mixture, scaled = mix_sources(src, jax.random.PRNGKey(0), cfg.data)
    n_fft, hop = cfg.dsp.n_fft, cfg.dsp.hop_length
    spec = dsp.stft(mixture, n_fft, hop)
    mags = jnp.abs(dsp.stft(scaled, n_fft, hop))
    irm = mags / (mags.sum(axis=1, keepdims=True) + 1e-8)
    est = masked_istft(spec, irm, n_fft, hop, mask_type="magnitude")
    t = est.shape[-1]
    sisdr = float(losses.pit_si_sdr(est, scaled[..., :t]).mean())
    assert sisdr > 10.0, f"oracle IRM SI-SDR too low: {sisdr}"


def test_cli_train_eval_separate_end_to_end(tmp_path, capsys):
    """Full CLI lifecycle on the toy config: train -> eval -> separate."""
    from gan_sass_tf_tpu import cli

    wd = str(tmp_path / "run")
    common = ["--config", "2src_toy_cpu", "--workdir", wd,
              "--set", "train.batch_size=8",
              "--set", "data.segment_seconds=0.5",
              "--set", "model.g_channels=8",
              "--set", "model.d_channels=8",
              "--set", "train.log_every=2",
              "--set", "train.ckpt_every=4",
              "--set", "train.eval_every=1000"]
    assert cli.main(["train", *common, "--steps", "4"]) == 0
    out = capsys.readouterr().out
    assert "step 4" in out and os.path.exists(os.path.join(wd, "metrics.jsonl"))

    assert cli.main(["eval", *common, "--batches", "1"]) == 0
    out = capsys.readouterr().out
    assert "si_sdr" in out

    mix_path = str(tmp_path / "mix.wav")
    wav = (0.4 * np.sin(2 * np.pi * 440 * np.arange(4000) / 8000)).astype(
        np.float32)
    write_wav(mix_path, 8000, wav)
    out_dir = str(tmp_path / "sep")
    assert cli.main(["separate", *common, "--input", mix_path,
                     "--output-dir", out_dir]) == 0
    assert len(os.listdir(out_dir)) == 2


def test_streaming_scan_first_chunk_full_weight(g_params):
    """ADVICE r1: chunk 0's head must NOT be cross-faded against the zero
    init carry — its first `overlap` samples must match the batched path
    (which gives chunk 0 full weight) on the permutation-invariant source
    sum."""
    from gan_sass_tf_tpu.infer import separate_streaming_scan

    cfg, g, params = g_params
    sr = cfg.dsp.sample_rate
    t = int(2.5 * sr)
    n = np.arange(t) / sr
    wav = (np.sin(2 * np.pi * 300 * n) + np.sin(2 * np.pi * 1500 * n)).astype(
        np.float32
    )
    out_scan = separate_streaming_scan(params, cfg, wav)
    out_batch = separate_streaming(params, cfg, wav)
    overlap = cfg.stream.overlap_frames * cfg.dsp.hop_length
    head_scan = out_scan.sum(axis=0)[:overlap]
    head_batch = out_batch.sum(axis=0)[:overlap]
    np.testing.assert_allclose(head_scan, head_batch, rtol=0, atol=1e-4)


def test_inference_fns_cached_no_retrace(g_params):
    """VERDICT r1 item 5: public inference wrappers must reuse one compiled
    fn per config — the second identical call must not retrace."""
    import jax

    from gan_sass_tf_tpu.infer.separate import separate_fn_for
    from gan_sass_tf_tpu.infer.streaming import (
        separate_streaming_scan,
        streaming_scan_fn_for,
    )

    cfg, g, params = g_params
    fn = separate_fn_for(cfg)
    assert separate_fn_for(cfg) is fn                 # cfg-keyed memoization
    wav = np.zeros(4000, np.float32)
    separate(params, cfg, wav)
    n1 = fn._cache_size()
    separate(params, cfg, wav)
    assert fn._cache_size() == n1                     # no retrace on call 2

    sfn = streaming_scan_fn_for(cfg)
    assert streaming_scan_fn_for(cfg) is sfn
    t = int(2.0 * cfg.dsp.sample_rate)
    mix = np.zeros(t, np.float32)
    separate_streaming_scan(params, cfg, mix)
    n2 = sfn._cache_size()
    separate_streaming_scan(params, cfg, mix)
    assert sfn._cache_size() == n2


def test_streaming_win_length_no_boundary_dips(g_params):
    """ADVICE r2 (self-review): with win_length < n_fft the per-chunk
    separate() output ends in (n_fft - win_length) unreconstructible zeros;
    the streaming paths must read an extended chunk and crop, so chunk
    boundaries show no amplitude dips — both modes must match the one-shot
    separation of the full signal on pure tones."""
    from gan_sass_tf_tpu.infer import separate_streaming_scan

    base, _, _ = g_params
    cfg = base.replace(
        dsp=base.dsp.__class__(**{**base.dsp.__dict__, "win_length": 200}),
    )
    import jax
    from gan_sass_tf_tpu import models as _models

    g = _models.build_generator(cfg)
    feats = np.zeros((1, 16, cfg.dsp.feature_dim), np.float32)
    params = g.init(jax.random.PRNGKey(0), feats, train=False)["params"]

    sr = cfg.dsp.sample_rate
    t = int(2.5 * sr)
    n = np.arange(t) / sr
    wav = (np.sin(2 * np.pi * 300 * n) + np.sin(2 * np.pi * 1500 * n)).astype(
        np.float32
    )
    ref = separate(params, cfg, wav)                      # (S, T) one-shot
    valid = t - (cfg.dsp.n_fft - cfg.dsp.win_length)      # one-shot zero tail
    for mode_fn in (separate_streaming, separate_streaming_scan):
        out = mode_fn(params, cfg, wav)
        assert out.shape == (cfg.data.num_sources, t)
        # permutation-invariant comparison via the source sum, skipping the
        # first chunk head (scan vs batch fade differences) — the point is
        # NO dead zones at interior chunk boundaries.
        a = out.sum(axis=0)[256:valid]
        b = ref.sum(axis=0)[256:valid]
        # chunk-boundary samples differ slightly by design (per-chunk
        # context + cross-fade); require near-equality for the bulk and a
        # bounded worst case — the pre-fix bug zeroed whole bands.
        d = np.abs(a - b)
        scale = max(1.0, float(np.abs(b).max()))
        assert np.quantile(d, 0.99) < 5e-2 * scale, mode_fn.__name__
        assert d.max() < 0.25 * scale, mode_fn.__name__
        # and specifically: no near-zero bands inside the stream
        seg_energy = np.convolve(np.abs(a), np.ones(64) / 64, mode="valid")
        assert seg_energy.min() > 0.25 * seg_energy.max(), mode_fn.__name__


def test_streaming_perm_hysteresis_near_silent_overlap():
    """A NEAR-SILENT overlap region carries no matching evidence; without
    the hysteresis margin, adversarial noise-level L2 differences flip
    sources mid-stream (the hard protocol's pauses-in-noise failure mode).
    With it, the chain keeps the previous chunk's assignment."""
    from gan_sass_tf_tpu.infer.streaming import _chain_permutations

    stride, overlap = 60, 20
    t_c = stride + overlap
    rng = np.random.default_rng(3)
    # Three chunks, stable source order, loud everywhere EXCEPT the overlap
    # between chunks 1 and 2, which is near-silent with noise constructed
    # to make the SWAPPED match slightly cheaper than the true one.
    chunks = rng.standard_normal((3, 2, t_c)).astype(np.float32)
    eps = 1e-4
    # chunk1 tail (= chunk2's previous-aligned tail): source0=+eps, s1=-eps
    chunks[1, 0, stride:] = eps
    chunks[1, 1, stride:] = -eps
    # chunk2 head: source0=-eps, s1=+eps -> swapped L2 is exactly 0, true
    # match L2 is (2*eps)^2 * overlap. Pure argmin would flip here.
    chunks[2, 0, :overlap] = -eps
    chunks[2, 1, :overlap] = eps
    heads = chunks[:, :, :overlap]
    tails = chunks[:, :, stride:]
    perm = _chain_permutations(heads, tails, hysteresis=1e-3)
    np.testing.assert_array_equal(perm[2], perm[1])   # no mid-stream flip
    # Pure argmin (hysteresis=0) must flip on this construction — the test
    # is vacuous otherwise.
    perm0 = _chain_permutations(heads, tails, hysteresis=0.0)
    assert not np.array_equal(perm0[2], perm0[1])
    # And a LOUD, genuine swap must still be corrected (margin is relative
    # to strip energy, so real evidence always wins).
    loud = rng.standard_normal((2, 3 * stride + overlap)).astype(np.float32)
    ch = np.stack([loud[:, i * stride: i * stride + t_c] for i in range(3)])
    ch[1] = ch[1][::-1]
    p = _chain_permutations(ch[:, :, :overlap], ch[:, :, stride:],
                            hysteresis=1e-3)
    assert p[1].tolist() == [1, 0]


def test_streaming_silent_gap_end_to_end(monkeypatch):
    """End-to-end hard-material chaining (VERDICT r4 item 5): an
    order-UNSTABLE separator (PIT nets have no canonical source order per
    chunk) + a noisy pause spanning several chunk boundaries.  Both
    streaming paths must emit a swap-free stream: loud boundaries are fixed
    by the overlap evidence, and inside the gap — where evidence vanishes —
    hysteresis keeps the previous assignment.  (Mechanism test: the margin
    is set EXPLICITLY — the shipped default is 0/argmin, which measured
    better end-to-end with a real separator; see BASELINE.md round 5.)"""
    from _streaming_gap_scenario import (
        gap_assignment, make_scenario, make_stub_separate, run_scan_path)

    from gan_sass_tf_tpu.infer import streaming as streaming_mod
    from gan_sass_tf_tpu.infer.streaming import separate_streaming

    cfg = _cfg()
    cfg = cfg.replace(stream=cfg.stream.__class__(**{
        **cfg.stream.__dict__, "perm_hysteresis": 1e-3}))
    mixture, low, high, t, sr = make_scenario(cfg)
    stub_separate = make_stub_separate(sr)

    # Batch path: stub injected via the separate_fn override.
    out = np.asarray(separate_streaming(None, cfg, mixture,
                                        separate_fn=stub_separate))
    assert out.shape == (2, t)
    i0, i1 = gap_assignment(out, low, high, sr)
    assert i0 == i1, "batch path: sources swapped across the gap"

    # Scan path: stub injected by patching build_separate_fn.
    monkeypatch.setattr(streaming_mod, "build_separate_fn",
                        lambda cfg_, g_: stub_separate)
    full = run_scan_path(cfg, mixture, t)
    i0, i1 = gap_assignment(full, low, high, sr)
    assert i0 == i1, "scan path: sources swapped across the gap"


def test_streaming_hysteresis_zero_flips_in_noisy_gap(monkeypatch):
    """Negative control (VERDICT r4 item 5: the knob's value must be
    measurable end-to-end): the SAME scenario with perm_hysteresis=0 DOES
    flip sources mid-gap on the scan path — noise-level L2 differences win
    the argmin without the margin.  If this test starts passing with a
    zero margin, the positive test above has stopped proving anything."""
    from _streaming_gap_scenario import (
        gap_assignment, make_scenario, make_stub_separate, run_scan_path)

    from gan_sass_tf_tpu.infer import streaming as streaming_mod

    cfg = _cfg()
    cfg = cfg.replace(stream=cfg.stream.__class__(**{
        **cfg.stream.__dict__, "perm_hysteresis": 0.0}))
    mixture, low, high, t, sr = make_scenario(cfg)
    monkeypatch.setattr(streaming_mod, "build_separate_fn",
                        lambda cfg_, g_: make_stub_separate(sr))
    full = run_scan_path(cfg, mixture, t)
    i0, i1 = gap_assignment(full, low, high, sr, require_clean=False)
    assert i0 != i1, (
        "expected a mid-gap source flip with hysteresis disabled — the "
        "negative control no longer provokes the failure mode"
    )
