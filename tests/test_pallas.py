"""Pallas kernel tolerance tests (SURVEY.md §7.1 step 8: same API + same
tolerance tests as the XLA oracle path).  On CPU these run in TPU
interpreter mode; the same kernels are exercised compiled on real TPU by
the verification flows and bench."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gan_sass_tf_tpu import dsp
from gan_sass_tf_tpu.ops.pallas_istft import istft_pallas
from gan_sass_tf_tpu.ops.pallas_stft import stft_pallas

GRIDS = [
    (256, 64, 4000),     # toy config grid (+ non-128 hop lanes)
    (512, 128, 16384),   # wsj0 / stream grid
    (512, 128, 24064),   # 3 s segment, F=185 (non-divisible by tile)
]


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("n_fft,hop,t", GRIDS)
def test_stft_pallas_matches_oracle(rng, n_fft, hop, t):
    x = _rand(rng, 2, t)
    ours = np.asarray(stft_pallas(jnp.asarray(x), n_fft, hop))
    ref = np.asarray(dsp.stft(jnp.asarray(x), n_fft, hop))
    assert ours.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=3e-4 * scale, rtol=1e-3)


def test_stft_pallas_batch_dims(rng):
    x = _rand(rng, 2, 3, 4000)  # (B, S, T) as used for target STFTs
    ours = np.asarray(stft_pallas(jnp.asarray(x), 256, 64))
    ref = np.asarray(dsp.stft(jnp.asarray(x), 256, 64))
    np.testing.assert_allclose(ours, ref, atol=3e-4 * np.abs(ref).max())


@pytest.mark.parametrize("n_fft,hop,t", GRIDS)
def test_istft_pallas_matches_oracle(rng, n_fft, hop, t):
    x = _rand(rng, 2, t)
    spec = dsp.stft(jnp.asarray(x), n_fft, hop)
    ours = np.asarray(istft_pallas(spec, n_fft, hop))
    ref = np.asarray(dsp.istft(spec, n_fft, hop, norm="global"))
    assert ours.shape == ref.shape
    # First/last hop samples are ill-conditioned (1/env amplifies roundoff
    # where the Hann envelope → 0); compare the well-conditioned interior.
    np.testing.assert_allclose(
        ours[:, hop:-hop], ref[:, hop:-hop], atol=2e-4, rtol=1e-3
    )


def test_roundtrip_pallas(rng):
    n_fft, hop, t = 512, 128, 16384
    x = _rand(rng, 1, t)
    spec = stft_pallas(jnp.asarray(x), n_fft, hop)
    f = spec.shape[-2]
    t_grid = (f - 1) * hop + n_fft
    y = np.asarray(istft_pallas(spec, n_fft, hop, length=t_grid))
    np.testing.assert_allclose(
        y[:, hop : t_grid - hop], x[:, hop : t_grid - hop], atol=2e-4
    )


def test_istft_pallas_gradient_matches_oracle(rng):
    """The custom VJP (wav-domain recon training path) must agree with
    autodiff through the XLA istft."""
    n_fft, hop, t = 256, 64, 2048
    x = _rand(rng, 1, t)
    spec = dsp.stft(jnp.asarray(x), n_fft, hop)
    tgt = jnp.asarray(_rand(rng, 1, (spec.shape[-2] - 1) * hop + n_fft))
    re, im = jnp.real(spec), jnp.imag(spec)

    def loss_pallas(re, im):
        y = istft_pallas(jax.lax.complex(re, im), n_fft, hop)
        return jnp.mean((y - tgt) ** 2)

    def loss_oracle(re, im):
        y = dsp.istft(jax.lax.complex(re, im), n_fft, hop, norm="global")
        return jnp.mean((y - tgt) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(re, im)
    go = jax.grad(loss_oracle, argnums=(0, 1))(re, im)
    for a, b in zip(gp, go):
        scale = np.abs(np.asarray(b)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4 * scale, rtol=1e-3
        )


def test_dispatch_force_backend(rng):
    from gan_sass_tf_tpu.ops import dispatch

    x = jnp.asarray(_rand(rng, 1, 4000))
    with dispatch.force_backend("xla"):
        a = dispatch.stft(x, 256, 64)
    with dispatch.force_backend("pallas"):
        b = dispatch.stft(x, 256, 64)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=3e-4 * float(jnp.abs(a).max())
    )


def test_pallas_rejects_bad_geometry(rng):
    x = jnp.zeros((1, 4000))
    with pytest.raises(ValueError, match="hop"):
        stft_pallas(x, 256, 100)
    with pytest.raises(ValueError, match="bins"):
        istft_pallas(jnp.zeros((1, 10, 100), jnp.complex64), 256, 64)


def test_forced_pallas_guards_geometry(rng):
    """VERDICT r2 item 4: explicitly forcing the Pallas backend at a
    geometry outside the kernels' envelope (e.g. the music preset's
    n_fft 2048 — DFT matrices past VMEM) must raise a clean ValueError at
    trace time, never reach pallas_call (a faulting Pallas kernel crashes
    the TPU worker)."""
    from gan_sass_tf_tpu import config as config_lib
    from gan_sass_tf_tpu.ops import dispatch

    x = jnp.zeros((1, 8192))
    # n_fft too large for VMEM
    with dispatch.force_backend("pallas"):
        with pytest.raises(ValueError, match="VMEM"):
            dispatch.stft(x, 2048, 512)
    # hop neither multiple nor divisor of 128
    with dispatch.force_backend("pallas"):
        with pytest.raises(ValueError, match="128"):
            dispatch.stft(x, 512, 96)
    # n_fft not divisible by hop
    with dispatch.force_backend("pallas"):
        with pytest.raises(ValueError, match="divisible"):
            dispatch.stft(x, 640, 256)
    # the user-reachable path: music preset + dsp.backend="pallas"
    cfg = config_lib.get_config("music_complex_44k")
    dcfg = cfg.dsp.__class__(
        **{**cfg.dsp.__dict__, "backend": "pallas"}
    )
    with pytest.raises(ValueError, match="VMEM"):
        dispatch.stft_features(x, dcfg, emit=("logmag",),
                               backend=dcfg.backend)
    # istft / masked_istft guard too
    spec = jnp.zeros((1, 8, 1025), jnp.complex64)
    with pytest.raises(ValueError, match="VMEM"):
        dispatch.istft(spec, 2048, 512, backend="pallas")
    # auto stays silent and routes to XLA
    out = dispatch.stft(x, 2048, 512, backend="auto")
    assert out.shape[-1] == 1025


def test_stft_features_pallas_matches_oracle(rng):
    """Fused STFT+features kernel vs the dsp oracle chain."""
    from gan_sass_tf_tpu.dsp.features import mel_filterbank
    from gan_sass_tf_tpu.ops.pallas_stft import stft_features_pallas

    n_fft, hop, t = 512, 128, 16384
    x = jnp.asarray(_rand(rng, 3, t))
    mel = jnp.asarray(mel_filterbank(80, 257, 8000))
    out = stft_features_pallas(
        x, n_fft, hop, emit=("spec", "mag", "logmag", "logmel"),
        mel_matrix=mel, eps=1e-8,
    )
    spec = dsp.stft(x, n_fft, hop)
    mag = jnp.abs(spec)
    scale = float(mag.max())
    np.testing.assert_allclose(np.asarray(out["spec"]), np.asarray(spec),
                               atol=3e-4 * scale)
    np.testing.assert_allclose(np.asarray(out["mag"]), np.asarray(mag),
                               atol=3e-4 * scale)
    np.testing.assert_allclose(np.asarray(out["logmag"]),
                               np.asarray(jnp.log(mag + 1e-8)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["logmel"]),
                               np.asarray(jnp.log(mag @ mel + 1e-8)),
                               atol=1e-3)


def test_stft_features_dispatch_fallback(rng):
    """XLA fallback of ops.stft_features composes the same values."""
    from gan_sass_tf_tpu import config
    from gan_sass_tf_tpu.ops import dispatch

    cfg = config.get_config("wsj0_logmel")
    x = jnp.asarray(_rand(rng, 2, 16384))
    out = dispatch.stft_features(
        x, cfg.dsp, emit=("spec", "mag", "logmag", "logmel"), backend="xla"
    )
    spec = dsp.stft(x, cfg.dsp.n_fft, cfg.dsp.hop_length)
    np.testing.assert_allclose(np.asarray(out["spec"]), np.asarray(spec),
                               atol=1e-5)
    assert out["logmel"].shape == spec.shape[:-1] + (80,)
    with pytest.raises(ValueError, match="unknown emit"):
        from gan_sass_tf_tpu.ops.pallas_stft import stft_features_pallas
        stft_features_pallas(x, 512, 128, emit=("nope",))


@pytest.mark.parametrize("mask_type", ["magnitude", "complex"])
def test_masked_istft_pallas_matches_oracle(rng, mask_type):
    """Fused mask-apply + iSTFT/OLA vs apply_mask + istft oracle chain."""
    from gan_sass_tf_tpu.ops.pallas_istft import masked_istft_pallas

    n_fft, hop, t, b, s = 512, 128, 16384, 2, 3
    x = jnp.asarray(_rand(rng, b, t))
    spec = dsp.stft(x, n_fft, hop)
    m_shape = (b, s) + spec.shape[-2:] + ((2,) if mask_type == "complex" else ())
    masks = jnp.asarray(rng.uniform(-1, 1, m_shape).astype(np.float32))
    ours = np.asarray(masked_istft_pallas(spec, masks, n_fft, hop,
                                          mask_type=mask_type))
    est = dsp.apply_mask(spec, masks, mask_type)
    ref = np.asarray(dsp.istft(est, n_fft, hop, norm="global"))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(
        ours[..., hop:-hop], ref[..., hop:-hop], atol=3e-4, rtol=1e-3
    )


def test_dsp_backend_config_respected(rng):
    """DSPConfig.backend='xla' must keep the step off the Pallas path even
    where auto would choose it (the dispatcher honors explicit backends)."""
    from gan_sass_tf_tpu import config
    from gan_sass_tf_tpu.ops import dispatch

    cfg = config.get_config("wsj0_logmel")
    cfg_xla = cfg.replace(dsp=cfg.dsp.__class__(**{**cfg.dsp.__dict__,
                                                   "backend": "xla"}))
    x = jnp.asarray(_rand(rng, 1, 8192))
    a = dispatch.stft_features(x, cfg_xla.dsp, emit=("logmag",),
                               backend=cfg_xla.dsp.backend)["logmag"]
    with dispatch.force_backend("pallas"):
        b = dispatch.stft_features(x, cfg.dsp, emit=("logmag",))["logmag"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_stft_pallas_encoded_window_support(rng):
    """win_length < n_fft flows into the Pallas kernels as an encoded
    window name ("hann@<support>") folded into the DFT matrices — parity
    with the XLA oracle on pre-padded input (the dispatch layer pads)."""
    n_fft, win, hop = 512, 400, 128
    x = _rand(rng, 2, 16384 + (n_fft - win))    # dispatch-style end padding
    ours = np.asarray(stft_pallas(jnp.asarray(x), n_fft, hop, f"hann@{win}"))
    ref = np.asarray(dsp.stft(jnp.asarray(x), n_fft, hop, f"hann@{win}"))
    assert ours.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=3e-4 * scale, rtol=1e-3)


def test_istft_pallas_encoded_window_support(rng):
    n_fft, win, hop = 512, 400, 128
    x = _rand(rng, 2, 16384)
    spec = dsp.stft(jnp.asarray(x), n_fft, hop, win_length=win)
    ours = np.asarray(istft_pallas(spec, n_fft, hop, f"hann@{win}"))
    ref = np.asarray(dsp.istft(spec, n_fft, hop, f"hann@{win}",
                               norm="global"))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(
        ours[:, hop:-hop], ref[:, hop:-hop], atol=2e-4, rtol=1e-3
    )


def test_dispatch_never_picks_pallas_on_cpu():
    """VERDICT r1 item 2 guard: on a CPU backend (this suite's virtual
    mesh), backend="auto" must resolve to XLA even for Pallas-eligible
    geometry — the CPU-mesh DP tests must never silently take the Pallas
    branch (interpret-mode Pallas deadlocks under multi-device shard_map)."""
    import jax

    from gan_sass_tf_tpu.ops import dispatch

    assert jax.default_backend() == "cpu"
    assert dispatch._resolve("auto", 512, 128) == "xla"   # eligible on TPU
    assert dispatch._resolve("auto", 256, 128) == "xla"


def test_dispatch_auto_phased_boundary(monkeypatch):
    """Round-5 measured auto boundary (scripts/bench_dsp_phased.py on v5e):
    sub-128 hops route to the phased Pallas path from n_fft 512 up (1.45x
    faster than XLA there) and stay on XLA below it (1.5x slower at 256)."""
    from gan_sass_tf_tpu.ops import dispatch

    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    assert dispatch._resolve("auto", 512, 64) == "pallas"   # measured win
    assert dispatch._resolve("auto", 1024, 64) == "pallas"
    assert dispatch._resolve("auto", 256, 64) == "xla"      # measured loss
    assert dispatch._resolve("auto", 512, 128) == "pallas"  # direct path
    assert dispatch._resolve("auto", 512, 96) == "xla"      # 96 ∤ 128
    assert dispatch._resolve("auto", 2048, 512) == "xla"    # VMEM cap


def test_dispatch_auto_long_istft_routes_to_xla(monkeypatch):
    """Round-5 field failure: the iSTFT-side kernels stage the WHOLE frame
    axis per grid cell, so a long one-shot separate (2 215 frames at the
    stream geometry) blew the 16 MB scoped-VMEM cap at compile time.  Auto
    must route such calls to XLA; forcing Pallas must raise cleanly."""
    from gan_sass_tf_tpu.ops import dispatch

    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    # training-segment frame counts stay on Pallas...
    assert dispatch._resolve("auto", 512, 128, n_frames=172) == "pallas"
    # ...the observed failing one-shot length routes to XLA
    assert dispatch._resolve("auto", 512, 128, n_frames=2215) == "xla"
    # estimator sanity at the failure geometry: within ~15% of the
    # compiler's 28.1 MB scoped-allocation report
    est = dispatch._istft_vmem_bytes(2215, 512, 128)
    assert 24 * 2**20 < est < 33 * 2**20
    # STFT-side calls pass no frame count and stay length-independent
    assert dispatch._resolve("auto", 512, 128, n_frames=None) == "pallas"
    # forced Pallas at an over-cap length raises instead of submitting
    with dispatch.force_backend("pallas"):
        with pytest.raises(ValueError, match="VMEM"):
            dispatch.masked_istft(
                jnp.zeros((1, 2215, 257), jnp.complex64),
                jnp.zeros((1, 2, 2215, 257)), 512, 128)


def test_phased_dispatch_sub128_hop_stft(rng):
    """VERDICT r1 weak 6: hop 64 (the toy preset) now reaches Pallas via
    the phased decomposition (kernels at hop*m = 128, frames interleaved).
    Parity vs the XLA oracle through the dispatch layer."""
    from gan_sass_tf_tpu.config import DSPConfig
    from gan_sass_tf_tpu.ops import dispatch

    n_fft, hop, t = 256, 64, 4000
    dcfg = DSPConfig(sample_rate=8000, n_fft=n_fft, hop_length=hop,
                     win_length=n_fft)
    x = jnp.asarray(_rand(rng, 2, t))
    with dispatch.force_backend("pallas"):
        got = dispatch.stft_features(x, dcfg, emit=("spec", "mag", "logmag"))
    with dispatch.force_backend("xla"):
        ref = dispatch.stft_features(x, dcfg, emit=("spec", "mag", "logmag"))
    for k in ref:
        a, b = np.asarray(got[k]), np.asarray(ref[k])
        assert a.shape == b.shape, k
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, atol=3e-4 * scale, rtol=1e-3,
                                   err_msg=k)


def test_phased_dispatch_sub128_hop_istft(rng):
    from gan_sass_tf_tpu.ops import dispatch

    n_fft, hop, t = 256, 64, 4000
    x = jnp.asarray(_rand(rng, 2, t))
    spec = dsp.stft(x, n_fft, hop)
    with dispatch.force_backend("pallas"):
        got = np.asarray(dispatch.istft(spec, n_fft, hop))
    with dispatch.force_backend("xla"):
        ref = np.asarray(dispatch.istft(spec, n_fft, hop))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got[:, hop:-hop], ref[:, hop:-hop],
                               atol=2e-4, rtol=1e-3)


def test_phased_dispatch_sub128_hop_masked_istft(rng):
    from gan_sass_tf_tpu.ops import dispatch

    n_fft, hop, t, s = 256, 64, 4000, 2
    x = jnp.asarray(_rand(rng, 2, t))
    spec = dsp.stft(x, n_fft, hop)
    masks = jnp.asarray(
        rng.uniform(0, 1, (2, s, spec.shape[-2], spec.shape[-1]))
    ).astype(jnp.float32)
    with dispatch.force_backend("pallas"):
        got = np.asarray(dispatch.masked_istft(spec, masks, n_fft, hop))
    with dispatch.force_backend("xla"):
        ref = np.asarray(dispatch.masked_istft(spec, masks, n_fft, hop))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got[..., hop:-hop], ref[..., hop:-hop],
                               atol=2e-4, rtol=1e-3)


def test_phased_istft_gradient(rng):
    """The phased iSTFT (env='none' kernels + outer envelope) must stay
    differentiable with the same gradients as the XLA oracle (wav-domain
    losses on sub-128-hop configs)."""
    from gan_sass_tf_tpu.ops import dispatch

    n_fft, hop, t = 256, 64, 1600
    x = jnp.asarray(_rand(rng, 1, t))
    spec = dsp.stft(x, n_fft, hop)
    re, im = jnp.real(spec), jnp.imag(spec)

    def loss(re, im, backend):
        with dispatch.force_backend(backend):
            y = dispatch.istft(re + 1j * im, n_fft, hop)
        return jnp.sum(y[..., hop:-hop] ** 2)

    gp = jax.grad(loss, argnums=(0, 1))(re, im, "pallas")
    gx = jax.grad(loss, argnums=(0, 1))(re, im, "xla")
    for a, b in zip(gp, gx):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3 * scale, rtol=2e-2)
