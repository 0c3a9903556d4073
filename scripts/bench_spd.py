"""steps_per_dispatch amortization benchmark (VERDICT r2 item 6).

Small-batch presets are fixed-overhead-bound (per-dispatch host/relay cost
dominates the few-ms device step); TrainConfig.steps_per_dispatch scans K
optimizer steps inside one jitted call to amortize it.  This measures the
win at K ∈ {1, 4, 16} for the presets the verdict names.

    python scripts/bench_spd.py [preset] [batch] [steps]

Prints one JSON line per K:
  {"preset": ..., "batch": ..., "spd": K, "mix_s_per_s_per_chip": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    from gan_sass_tf_tpu import config
    from gan_sass_tf_tpu.train import Experiment

    preset = sys.argv[1] if len(sys.argv) > 1 else "2src_toy_cpu"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else None
    total = int(sys.argv[3]) if len(sys.argv) > 3 else 192

    for spd in (1, 4, 16):
        cfg = config.get_config(preset)
        train_kw = {"steps_per_dispatch": spd, "log_every": 10**9,
                    "eval_every": 10**9, "ckpt_every": 10**9}
        if batch:
            train_kw["batch_size"] = batch
        cfg = cfg.replace(
            data=cfg.data.__class__(**{**cfg.data.__dict__,
                                       "dataset": "synthetic"}),
            train=cfg.train.__class__(**{**cfg.train.__dict__, **train_kw}),
            mesh=cfg.mesh.__class__(data_axis_size=-1),
        )
        exp = Experiment(cfg, workdir=None)
        data = exp._bank
        state, rng = exp.state, exp._train_rng
        step_fn = exp._train_step_for(spd)
        # warm-up (compile) + sync
        state, m = step_fn(state, data, rng)
        float(m["g_loss"])
        n_disp = max(1, total // spd)
        t0 = time.perf_counter()
        for _ in range(n_disp):
            state, m = step_fn(state, data, rng)
        float(m["g_loss"])
        el = time.perf_counter() - t0
        steps = n_disp * spd
        mix = steps * cfg.train.batch_size * cfg.segment_samples \
            / cfg.dsp.sample_rate
        print(json.dumps({
            "preset": preset, "batch": cfg.train.batch_size, "spd": spd,
            "steps": steps,
            "mix_s_per_s_per_chip": round(mix / el / len(jax.devices()), 1),
            "ms_per_step": round(el / steps * 1e3, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
