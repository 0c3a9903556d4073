"""Loss tests (SURVEY.md §4.2.3): PIT vs brute-force oracle, GAN loss sign
conventions, SI-SDR known values."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from gan_sass_tf_tpu import losses


# ---------------------------------------------------------------------------
# PIT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("s", [2, 3])
@pytest.mark.parametrize("kind", ["l1", "mse"])
def test_pit_matches_bruteforce(rng, s, kind):
    b, t, f = 4, 7, 5
    est = rng.standard_normal((b, s, t, f)).astype(np.float32)
    tgt = rng.standard_normal((b, s, t, f)).astype(np.float32)
    loss, perm = losses.pit_loss(jnp.asarray(est), jnp.asarray(tgt), kind)
    loss, perm = np.asarray(loss), np.asarray(perm)
    red = np.abs if kind == "l1" else np.square
    for bi in range(b):
        best = min(
            np.mean([red(est[bi, i] - tgt[bi, p[i]]).mean() for i in range(s)])
            for p in itertools.permutations(range(s))
        )
        np.testing.assert_allclose(loss[bi], best, rtol=1e-5)
        # reported perm achieves the reported loss
        achieved = np.mean(
            [red(est[bi, i] - tgt[bi, perm[bi, i]]).mean() for i in range(s)]
        )
        np.testing.assert_allclose(achieved, best, rtol=1e-5)


def test_pit_identity_when_aligned(rng):
    tgt = rng.standard_normal((2, 3, 10)).astype(np.float32)
    loss, perm = losses.pit_loss(jnp.asarray(tgt), jnp.asarray(tgt), "l1")
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(perm), np.tile(np.arange(3), (2, 1)))


def test_pit_finds_swap(rng):
    tgt = rng.standard_normal((1, 2, 10)).astype(np.float32)
    est = tgt[:, ::-1]  # estimates are the swapped targets
    loss, perm = losses.pit_loss(jnp.asarray(est), jnp.asarray(tgt), "l1")
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(perm), [[1, 0]])
    aligned = losses.align_to_perm(jnp.asarray(tgt), perm)
    np.testing.assert_allclose(np.asarray(aligned), est, atol=0)


@pytest.mark.parametrize("s,t,k", [(2, 184, 257), (3, 184, 257)])
def test_pooled_match_equals_unpooled(rng, s, t, k):
    """VERDICT r2 item 7: the train step's bf16 4x4-pooled PIT matching
    (losses.pooled_match_perm, the ~32x matching-traffic shortcut) must pick
    the SAME permutation as the full-resolution f32 argmin at the wsj0/3src
    preset geometry (n_fft 512 → 257 bins, 3 s @ 8 kHz → 184 frames), across
    training-realistic regimes from near-converged to early-training."""
    b = 8
    tgt = np.abs(rng.standard_normal((b, s, t, k))).astype(np.float32)
    for mix_frac, noise_scale in [(0.0, 0.05), (0.3, 0.2), (0.6, 0.5)]:
        # Estimate = permuted target blended toward the mixture + noise:
        # early training emits near-mixture masks; late training emits the
        # (permuted) targets.  The permutation must be recoverable in all.
        perms = np.stack([rng.permutation(s) for _ in range(b)])
        est = np.stack([tgt[i, perms[i]] for i in range(b)])
        mixture = tgt.mean(axis=1, keepdims=True)
        est = (1 - mix_frac) * est + mix_frac * mixture
        est = est + noise_scale * rng.standard_normal(est.shape)
        est = est.astype(np.float32)
        _, perm_full = losses.pit_loss(jnp.asarray(est), jnp.asarray(tgt), "l1")
        perm_pooled = losses.pooled_match_perm(
            jnp.asarray(est), jnp.asarray(tgt), "l1"
        )
        np.testing.assert_array_equal(
            np.asarray(perm_pooled), np.asarray(perm_full),
            err_msg=f"pooled argmin diverged at mix_frac={mix_frac}",
        )


def test_pool4_tiny_grid_passthrough(rng):
    """Grids with T or K < 4 must pass through un-pooled (truncation would
    produce an empty tensor whose mean is NaN)."""
    x = jnp.asarray(rng.standard_normal((2, 2, 3, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(losses.pool4(x)), np.asarray(x))
    y = jnp.asarray(rng.standard_normal((2, 2, 8, 8)).astype(np.float32))
    assert losses.pool4(y).shape == (2, 2, 2, 2)


# ---------------------------------------------------------------------------
# GAN losses
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["ns", "lsgan", "hinge"])
def test_gan_d_prefers_separation(kind):
    """D loss is lower when real logits are high and fake logits low."""
    good = losses.gan_d_loss(jnp.asarray([3.0]), jnp.asarray([-3.0]), kind)
    bad = losses.gan_d_loss(jnp.asarray([-3.0]), jnp.asarray([3.0]), kind)
    assert float(good) < float(bad)


@pytest.mark.parametrize("kind", ["ns", "lsgan", "hinge"])
def test_gan_g_prefers_fooling(kind):
    """G loss is lower when the discriminator scores fakes as real."""
    good = losses.gan_g_loss(jnp.asarray([3.0]), kind)
    bad = losses.gan_g_loss(jnp.asarray([-3.0]), kind)
    assert float(good) < float(bad)


def test_gan_unknown_kind():
    with pytest.raises(ValueError):
        losses.gan_d_loss(jnp.zeros(1), jnp.zeros(1), "wgan-gp")


# ---------------------------------------------------------------------------
# SI-SDR
# ---------------------------------------------------------------------------


def test_si_sdr_perfect_and_scaled(rng):
    x = rng.standard_normal((3, 1000)).astype(np.float32)
    perfect = np.asarray(losses.si_sdr(jnp.asarray(x), jnp.asarray(x)))
    assert (perfect > 60).all()  # roundoff-limited, effectively infinite
    scaled = np.asarray(losses.si_sdr(jnp.asarray(3.7 * x), jnp.asarray(x)))
    assert (scaled > 60).all()
    # Scale-invariance tested away from the roundoff floor: at finite SNR,
    # scaling the estimate must not change the score.
    noisy = x + 0.1 * rng.standard_normal((3, 1000)).astype(np.float32)
    a = np.asarray(losses.si_sdr(jnp.asarray(noisy), jnp.asarray(x)))
    b = np.asarray(losses.si_sdr(jnp.asarray(5.0 * noisy), jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_si_sdr_known_snr(rng):
    """est = tgt + noise at known power ratio → SI-SDR ≈ 10 log10(P_s/P_n)."""
    t = 100_000
    tgt = rng.standard_normal(t).astype(np.float32)
    noise = rng.standard_normal(t).astype(np.float32)
    noise -= noise @ tgt / (tgt @ tgt) * tgt  # orthogonalize
    for snr_db in [0.0, 10.0, 20.0]:
        scale = np.sqrt((tgt @ tgt) / (noise @ noise) / 10 ** (snr_db / 10))
        got = float(losses.si_sdr(jnp.asarray(tgt + scale * noise), jnp.asarray(tgt)))
        assert abs(got - snr_db) < 0.1


def test_pit_si_sdr_swapped(rng):
    tgt = rng.standard_normal((2, 2, 4000)).astype(np.float32)
    est = tgt[:, ::-1]
    got = np.asarray(losses.pit_si_sdr(jnp.asarray(est), jnp.asarray(tgt)))
    assert (got > 60).all()  # permutation-invariant: swap is perfect
