"""Compiled-Pallas x shard_map validation on the real TPU chip (VERDICT r1
item 2): runs the FULL alternating G/D train step under jax.shard_map on a
1-device ('dcn','data') mesh with backend="pallas" forced, against the same
step jitted WITHOUT shard_map, from identical init — metrics must match.

This is the closest possible evidence for the production v5e-8 configuration
(Pallas kernels inside a shard_map'd step) on single-chip hardware; the
multi-device sharding program itself is validated by the CPU-mesh tests and
the driver dryrun (XLA dispatch branch).

Run: plain `python scripts/verify_pallas_shardmap.py` (axon TPU backend).
"""

from __future__ import annotations

import os
import sys

# Runnable from anywhere: the package lives at the repo root, one level up.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    from gan_sass_tf_tpu import config, models
    from gan_sass_tf_tpu.train import Experiment
    from gan_sass_tf_tpu.train.step import build_train_step

    assert jax.default_backend() not in ("cpu", "gpu"), \
        "this validation must run on real TPU (Pallas compiled path)"

    cfg = config.get_config("stream_v5e8")
    cfg = cfg.replace(
        dsp=cfg.dsp.__class__(**{**cfg.dsp.__dict__, "backend": "pallas"}),
        train=cfg.train.__class__(**{**cfg.train.__dict__, "batch_size": 8}),
        mesh=cfg.mesh.__class__(data_axis_size=len(jax.devices())),
    )

    # Sharded: Experiment wraps the step in jax.shard_map over the mesh.
    exp = Experiment(cfg, workdir=None)
    state_sh = exp.state
    bank, rng = exp._bank, exp._train_rng

    # Unsharded oracle: the same step fn, plain jit, same init/bank/rng.
    g = models.build_generator(cfg)
    d = models.build_discriminator(cfg)
    step_un = jax.jit(build_train_step(
        cfg, g, d, axis_names=(), from_bank=True,
        local_batch=cfg.train.batch_size,
    ))
    state_un = jax.device_put(jax.tree_util.tree_map(np.asarray, exp.state))

    for i in range(3):
        state_sh, m_sh = exp._train_step(state_sh, bank, rng)
        state_un, m_un = step_un(state_un, bank, rng)
        row = {}
        for k in m_sh:
            a, b = float(m_sh[k]), float(m_un[k])
            row[k] = (a, b)
            assert np.isfinite(a) and np.isfinite(b), f"{k} not finite"
            assert abs(a - b) <= 1e-4 * max(1.0, abs(b)), \
                f"step {i}: {k} sharded {a} != unsharded {b}"
        print(f"step {i}: sharded == unsharded  "
              f"{ {k: round(v[0], 5) for k, v in row.items()} }")

    # Param agreement after 3 steps (beyond scalar metrics).
    leaves_sh = jax.tree_util.tree_leaves(state_sh.g_params)
    leaves_un = jax.tree_util.tree_leaves(state_un.g_params)
    err = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
              for a, b in zip(leaves_sh, leaves_un))
    assert err < 1e-5, f"g_params diverged: max abs err {err}"
    print(f"PASS: compiled-Pallas x shard_map == unsharded "
          f"(g_params max abs err {err:.2e})")


if __name__ == "__main__":
    main()
