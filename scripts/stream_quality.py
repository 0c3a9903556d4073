"""Streaming quality under the HARD protocol (VERDICT r3 item 7): train a
stream_v5e8 model on shared-f0 + noise material, build long hard mixtures
with deliberate near-silent gaps between utterances (the adversarial case
for chunk-permutation chaining), and compare one-shot separation against
BOTH streaming modes.  A mid-stream source flip destroys the stream-global
PIT SI-SDR, so the streaming-vs-oneshot delta is the chaining healthcheck
(pass bar from the verdict: < 0.5 dB).

    python scripts/stream_quality.py [STEPS] [--easy] [--seed N]
        [--set k=v ...]

Prints one JSON line with per-mode SI-SDRi and deltas.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv) -> int:
    import jax
    import jax.numpy as jnp

    from quality_protocol import protocol_config  # same dir
    from gan_sass_tf_tpu.infer.streaming import (
        separate_streaming,
        separate_streaming_scan,
    )
    from gan_sass_tf_tpu.data.mixer import mix_sources
    from gan_sass_tf_tpu.losses import pit_si_sdr
    from gan_sass_tf_tpu.train import Experiment

    overrides, skip = [], set()
    seed = 0
    for i, a in enumerate(argv):
        if a == "--set" and i + 1 < len(argv):
            overrides.append(argv[i + 1]); skip.update((i, i + 1))
        elif a == "--seed" and i + 1 < len(argv):
            seed = int(argv[i + 1]); skip.update((i, i + 1))
        elif a.startswith("--"):
            skip.add(i)
    args = [a for i, a in enumerate(argv) if i not in skip]
    steps = int(args[0]) if args else 10_000
    hard = "--easy" not in argv

    cfg = protocol_config("stream_v5e8", hard, overrides)
    exp = Experiment(cfg, workdir=None)
    exp.reseed(seed)
    exp.train(num_steps=steps,
              log_fn=lambda s, m: (s % 2000 == 0) and print(
                  f"step {s}: d={m['d_loss']:.3f}", file=sys.stderr,
                  flush=True))
    g_params = exp.eval_g_params

    # --- long hard streams: eval segments + near-silent gaps ------------
    sr = cfg.dsp.sample_rate
    gap = int(0.25 * sr)           # silent pause between utterances: the
    #                                overlap matcher gets zero evidence there
    n_segs = 8
    mix_parts, tgt_parts = [], []
    for i in range(n_segs):
        sources = jnp.asarray(exp.eval_dataset.batch())[:1]    # (1, S, T)
        mixture, scaled = jax.jit(mix_sources, static_argnums=2)(
            sources, jax.random.PRNGKey(7_000 + i), cfg.data)
        mix_parts.append(np.asarray(mixture[0]))
        tgt_parts.append(np.asarray(scaled[0]))
        if i != n_segs - 1:
            mix_parts.append(np.zeros(gap, np.float32))
            tgt_parts.append(np.zeros((scaled.shape[1], gap), np.float32))
    mixture = np.concatenate(mix_parts, axis=-1)               # (T_long,)
    targets = np.concatenate(tgt_parts, axis=-1)               # (S, T_long)

    # --- one-shot (the reference answer: no chunking at all) ------------
    one = np.asarray(exp.separate_fn(
        g_params, jnp.asarray(mixture[None]))[0])[..., : mixture.shape[-1]]
    # --- streaming, both modes ------------------------------------------
    batch = separate_streaming(g_params, cfg, mixture, mesh=exp.mesh)
    scan = separate_streaming_scan(g_params, cfg, mixture)

    tgt = jnp.asarray(targets)[None]

    def sisdri(est):
        t = min(est.shape[-1], targets.shape[-1])
        si = float(pit_si_sdr(jnp.asarray(est)[None, :, :t],
                              tgt[:, :, :t]).mean())
        mix_rep = jnp.broadcast_to(jnp.asarray(mixture)[None, None, :t],
                                   (1, targets.shape[0], t))
        return si - float(pit_si_sdr(mix_rep, tgt[:, :, :t]).mean())

    si_one, si_batch, si_scan = sisdri(one), sisdri(batch), sisdri(scan)
    out = {
        "preset": "stream_v5e8",
        "hard": hard,
        "steps": steps,
        "seed": seed,
        "stream_seconds": round(mixture.shape[-1] / sr, 2),
        "si_sdr_improvement_oneshot": round(si_one, 2),
        "si_sdr_improvement_stream_batch": round(si_batch, 2),
        "si_sdr_improvement_stream_scan": round(si_scan, 2),
        "delta_batch_vs_oneshot": round(si_batch - si_one, 2),
        "delta_scan_vs_oneshot": round(si_scan - si_one, 2),
        "perm_hysteresis": cfg.stream.perm_hysteresis,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
