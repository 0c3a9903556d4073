"""Loss library (reference layer L4): adversarial G/D losses, L1/MSE
reconstruction, permutation-invariant training (PIT) matching, and the
SI-SDR contract metric (BASELINE.json:2,9)."""

from gan_sass_tf_tpu.losses.gan import gan_d_loss, gan_g_loss
from gan_sass_tf_tpu.losses.recon import elem_loss, recon_loss
from gan_sass_tf_tpu.losses.pit import (
    align_to_perm,
    pairwise_losses,
    permutations_for,
    pit_loss,
    pool4,
    pooled_match_perm,
)
from gan_sass_tf_tpu.losses.metrics import si_sdr, pit_si_sdr
from gan_sass_tf_tpu.losses.oracle import oracle_bound_si_sdr, oracle_masks

__all__ = [
    "gan_d_loss", "gan_g_loss",
    "elem_loss", "recon_loss",
    "pairwise_losses", "pit_loss", "align_to_perm", "permutations_for",
    "pool4", "pooled_match_perm",
    "si_sdr", "pit_si_sdr",
    "oracle_bound_si_sdr", "oracle_masks",
]
