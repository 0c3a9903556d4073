"""One-shot separation — the reference's public API surface
("mixture wav in, separated source wavs out", BASELINE.json:5).

The whole middle (STFT → G masks → mask·STFT → iSTFT/overlap-add) is one
jitted fused graph (SURVEY.md §3.2); the host only pads the waveform onto
the STFT frame grid and crops the result.
"""

from __future__ import annotations

import functools
import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from gan_sass_tf_tpu.train.step import build_separate_fn
from gan_sass_tf_tpu.utils.wav_io import read_wav, write_wav
from gan_sass_tf_tpu import models


@functools.lru_cache(maxsize=8)
def separate_fn_for(cfg):
    """Memoized jitted separate graph for a config (configs are frozen/
    hashable).  Rebuilding + re-jitting per call would retrace every time —
    a fresh jit wrapper has an empty compile cache (VERDICT r1 item 5)."""
    g = models.build_generator(cfg)
    return jax.jit(build_separate_fn(cfg, g))


def _pad_to_grid(wav: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    t = wav.shape[-1]
    if t < n_fft:
        return np.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, n_fft - t)])
    rem = (t - n_fft) % hop
    if rem:
        wav = np.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, hop - rem)])
    return wav


def separate(
    g_params,
    cfg,
    mixture: np.ndarray,
    separate_fn=None,
) -> np.ndarray:
    """mixture (T,) or (B, T) float32 → (B, S, T) separated source wavs.

    `separate_fn` may be passed to reuse a prebuilt/jitted graph (e.g.
    Experiment.separate_fn); otherwise one is built and jitted here.
    """
    squeeze = mixture.ndim == 1
    mix = np.atleast_2d(np.asarray(mixture, np.float32))
    t_in = mix.shape[-1]
    mix = _pad_to_grid(mix, cfg.dsp.n_fft, cfg.dsp.hop_length)
    if separate_fn is None:
        separate_fn = separate_fn_for(cfg)
    wavs = np.asarray(separate_fn(g_params, jnp.asarray(mix)))
    wavs = wavs[..., :t_in]
    return wavs[0] if squeeze else wavs


def separate_file(
    g_params,
    cfg,
    in_path: str,
    out_dir: str,
    separate_fn=None,
) -> List[str]:
    """Wav file → per-source wav files <stem>_src<i>.wav in out_dir."""
    sr, wav = read_wav(in_path)
    if sr != cfg.dsp.sample_rate:
        raise ValueError(
            f"{in_path}: sample rate {sr} != config {cfg.dsp.sample_rate}"
        )
    wavs = separate(g_params, cfg, wav, separate_fn=separate_fn)
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(in_path))[0]
    paths = []
    for i, w in enumerate(wavs):
        p = os.path.join(out_dir, f"{stem}_src{i}.wav")
        write_wav(p, cfg.dsp.sample_rate, w)
        paths.append(p)
    return paths
