"""Recompute a preset's oracle-mask quality bound WITHOUT training — same
eval distribution and keys as scripts/quality_protocol.py (held-out split,
PRNGKey(20000+i), 8 batches).  Used to refresh BASELINE.md bound columns
when the oracle definition changes (e.g. round 3's PSF oracle for
sigmoid-head magnitude presets).

    python scripts/recompute_bounds.py PRESET [--hard] [--cpu] [--set k=v ...]

--cpu forces the CPU backend (bounds need no training hardware; keeps the
TPU free for queued jobs).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from quality_protocol import protocol_config  # noqa: E402  (same directory)


def main(argv) -> int:
    from gan_sass_tf_tpu.data import make_dataset
    from gan_sass_tf_tpu.data.mixer import mix_sources
    from gan_sass_tf_tpu.losses import oracle_bound_si_sdr

    args = [a for a in argv if not a.startswith("--")]
    hard = "--hard" in argv
    if "--cpu" in argv:
        jax.config.update("jax_platforms", "cpu")
    overrides = []
    for i, a in enumerate(argv):
        if a == "--set" and i + 1 < len(argv):
            overrides.append(argv[i + 1])
    if overrides:
        args = [a for a in args if a not in overrides]
    preset = args[0] if args else "stream_v5e8"

    cfg = protocol_config(preset, hard, overrides)
    eval_ds = make_dataset(cfg, seed=cfg.train.seed + 9999,
                           split=cfg.data.eval_split)

    @jax.jit
    def bound(sources, rng):
        mixture, scaled = mix_sources(sources, rng, cfg.data)
        return oracle_bound_si_sdr(mixture, scaled, cfg.dsp)

    acc = 0.0
    n = 8
    for i in range(n):
        out = bound(jnp.asarray(eval_ds.batch()),
                    jax.random.PRNGKey(20_000 + i))
        acc += float(out["si_sdr_improvement"]) / n
    print(json.dumps({
        "preset": preset, "hard": hard,
        "oracle_bound": round(acc, 2),
        "mask_type": cfg.dsp.mask_type,
        "mask_activation": cfg.dsp.mask_activation,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
