"""Device-resident audio DSP frontend (reference layer L3, SURVEY.md §1.1).

Pure-JAX (XLA) implementations of framing, windowed STFT/iSTFT,
log-magnitude / log-mel spectrograms, mask application, and overlap-add
resynthesis — the capability set named at BASELINE.json:5.  These are the
numerical oracles; the fused Pallas TPU kernels in `gan_sass_tf_tpu.ops`
implement the same API behind `gan_sass_tf_tpu.ops.dispatch` and are tested
against this path to STFT tolerance.

Conventions (chosen to match tf.signal, the fidelity oracle):
  * periodic Hann window
  * no centering, no end-padding: n_frames = 1 + (T - n_fft) // hop
  * istft uses the least-squares synthesis window (overlap-added squared
    analysis window normalization), matching tf.signal.inverse_stft_window_fn.
"""

from gan_sass_tf_tpu.dsp.windows import get_window, cola_norm
from gan_sass_tf_tpu.dsp.stft import (
    frame_signal,
    num_frames,
    overlap_add,
    stft,
    istft,
)
from gan_sass_tf_tpu.dsp.features import (
    logmag,
    mel_filterbank,
    logmel,
    spec_features,
)
from gan_sass_tf_tpu.dsp.masks import apply_mask, mask_channels

__all__ = [
    "get_window", "cola_norm",
    "frame_signal", "num_frames", "overlap_add", "stft", "istft",
    "logmag", "mel_filterbank", "logmel", "spec_features",
    "apply_mask", "mask_channels",
]
