"""Oracle-mask bound + hard-protocol tests (VERDICT r2 items 1-2).

The oracle module defines the task ceiling every quality row in BASELINE.md
is reported against; these tests pin its semantics: ideal masks through the
same masked-iSTFT path the model uses, complex oracle respecting the
generator's tanh bound, and the hard protocol actually creating headroom.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_sass_tf_tpu import config
from gan_sass_tf_tpu.data import make_dataset
from gan_sass_tf_tpu.data.mixer import mix_sources
from gan_sass_tf_tpu.losses import oracle_bound_si_sdr, oracle_masks


def _cfg(name="2src_toy_cpu", **data_kw):
    cfg = config.get_config(name)
    return cfg.replace(
        train=cfg.train.__class__(**{**cfg.train.__dict__, "batch_size": 4}),
        data=cfg.data.__class__(**{**cfg.data.__dict__,
                                   "segment_seconds": 0.5, **data_kw}),
    )


def _bound(cfg, seed=0):
    ds = make_dataset(cfg, seed=seed)
    src = jnp.asarray(ds.batch(4))
    mix, scaled = mix_sources(src, jax.random.PRNGKey(0), cfg.data)
    out = oracle_bound_si_sdr(mix, scaled, cfg.dsp)
    return float(out["si_sdr_improvement"])


def test_oracle_irm_bound_strongly_positive():
    """Disjoint-band task: the IRM ceiling must be far above the mixture."""
    assert _bound(_cfg()) > 10.0


def test_hard_protocol_creates_headroom():
    """Shared-f0 (+noise) tasks must have a LOWER oracle ceiling than the
    disjoint-band task — T-F overlap is real — while remaining positive
    (the task is still separable in principle).  The noise ordering is
    asserted on the IRM (softmax) oracle: the PSF oracle suppresses noise
    near-optimally, so ITS ceiling barely moves with noise (by design)."""
    easy = _bound(_cfg())
    hard = _bound(_cfg(f0_mode="shared"))
    assert hard < easy - 2.0, (easy, hard)

    def irm(cfg):
        return _bound(cfg.replace(dsp=cfg.dsp.__class__(
            **{**cfg.dsp.__dict__, "mask_activation": "softmax"})))

    hard_irm = irm(_cfg(f0_mode="shared"))
    harder_irm = irm(_cfg(f0_mode="shared", num_noise=1, snr_db=10.0))
    assert harder_irm < hard_irm, (hard_irm, harder_irm)
    assert harder_irm > 3.0


def test_psf_oracle_dominates_irm_on_noisy_tasks(rng):
    """Sigmoid-head magnitude oracle is the clipped phase-sensitive filter:
    it must dominate the source-normalized IRM (which is NOT a bound once
    noise enters the mixture — round-3 measured a trained model beating it),
    and stay inside the head's [0, 1] range."""
    cfg = _cfg(f0_mode="shared", num_noise=1, snr_db=10.0)
    psf = _bound(cfg)
    irm = _bound(cfg.replace(dsp=cfg.dsp.__class__(
        **{**cfg.dsp.__dict__, "mask_activation": "softmax"})))
    assert psf > irm + 2.0, (psf, irm)

    spec_srcs = jnp.asarray(
        (rng.standard_normal((2, 2, 6, 9))
         + 1j * rng.standard_normal((2, 2, 6, 9))).astype(np.complex64))
    spec_mix = spec_srcs.sum(axis=1)
    m = oracle_masks(spec_mix, spec_srcs, "magnitude",
                     mask_activation="sigmoid")
    assert float(m.min()) >= 0.0 and float(m.max()) <= 1.0


def test_complex_oracle_beats_magnitude_on_overlap():
    """Phase-aware ideal complex masks must beat phase-blind IRM where
    sources overlap in T-F (the reason the music workload uses them,
    BASELINE.json:10)."""
    cfg = _cfg(f0_mode="shared")
    cfg_c = cfg.replace(
        dsp=cfg.dsp.__class__(**{**cfg.dsp.__dict__, "mask_type": "complex"})
    )
    assert _bound(cfg_c) > _bound(cfg) + 3.0


def test_oracle_complex_mask_respects_tanh_bound(rng):
    spec_srcs = jnp.asarray(
        (rng.standard_normal((2, 2, 6, 9))
         + 1j * rng.standard_normal((2, 2, 6, 9))).astype(np.complex64)
    )
    spec_mix = spec_srcs.sum(axis=1)
    m = oracle_masks(spec_mix, spec_srcs, "complex")
    assert m.shape == (2, 2, 6, 9, 2)
    assert float(jnp.abs(m).max()) <= 1.0 + 1e-6


def test_oracle_magnitude_masks_sum_to_one(rng):
    spec_srcs = jnp.asarray(
        (rng.standard_normal((2, 3, 6, 9))
         + 1j * rng.standard_normal((2, 3, 6, 9))).astype(np.complex64)
    )
    spec_mix = spec_srcs.sum(axis=1)
    m = oracle_masks(spec_mix, spec_srcs, "magnitude",
                     mask_activation="softmax")
    np.testing.assert_allclose(np.asarray(m.sum(axis=1)), 1.0, atol=1e-3)
    assert float(m.min()) >= 0.0


def test_music_profiles_generate():
    """vocal/accomp slot profiles: correct shapes, finite, normalized."""
    cfg = _cfg(slot_profiles=("vocal", "accomp"))
    ds = make_dataset(cfg, seed=0)
    b = ds.batch(3)
    assert b.shape == (3, 2, cfg.segment_samples)
    assert np.isfinite(b).all()
    assert np.abs(b).max() <= 1.0 + 1e-5
    # the two profiles are spectrally distinct: accompaniment carries much
    # more broadband (high-quefrency-flat) energy than the vocal stack
    spec_v = np.abs(np.fft.rfft(b[:, 0]))
    spec_a = np.abs(np.fft.rfft(b[:, 1]))
    flat_v = np.exp(np.mean(np.log(spec_v + 1e-9))) / np.mean(spec_v)
    flat_a = np.exp(np.mean(np.log(spec_a + 1e-9))) / np.mean(spec_a)
    assert flat_a > flat_v  # accomp is spectrally flatter

def test_slot_profiles_length_mismatch_raises():
    cfg = _cfg(num_sources=2, slot_profiles=("vocal",))
    with pytest.raises(ValueError, match="slot_profiles"):
        make_dataset(cfg, seed=0).batch(1)


def test_shared_f0_bank_slots_overlap_spectrally():
    """In shared mode the slots must NOT be separable by band: their mean
    spectra overlap heavily (unlike disjoint mode)."""
    cfg_d = _cfg()
    cfg_s = _cfg(f0_mode="shared")

    def band_centroid(cfg):
        b = make_dataset(cfg, seed=0).batch(8)
        sr = cfg.dsp.sample_rate
        freqs = np.fft.rfftfreq(b.shape[-1], 1 / sr)
        cents = []
        for si in range(2):
            spec = np.abs(np.fft.rfft(b[:, si])).mean(axis=0)
            cents.append((freqs * spec).sum() / spec.sum())
        return cents

    c_d = band_centroid(cfg_d)
    c_s = band_centroid(cfg_s)
    # disjoint: slot centroids far apart; shared: much closer
    assert abs(c_s[0] - c_s[1]) < 0.5 * abs(c_d[0] - c_d[1])
