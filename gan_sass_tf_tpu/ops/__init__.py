"""Compute kernels for the DSP hot path.

`dispatch` selects between the fused Pallas TPU kernels (gan_sass_tf_tpu.ops
.pallas_stft / pallas_istft) and the pure-XLA oracle path in
gan_sass_tf_tpu.dsp, behind one API (SURVEY.md §7.1 step 8: "Pallas kernels
replacing the pure-JAX DSP behind the same API + same tolerance tests")."""

from gan_sass_tf_tpu.ops import dispatch

__all__ = ["dispatch"]
