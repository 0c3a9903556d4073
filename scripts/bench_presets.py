"""Per-preset throughput benchmark (VERDICT r1 item 7): measures training
throughput for ALL five contract presets (BASELINE.json:7-11) plus the two
streaming-inference modes, printing one JSON line per row for BASELINE.md.

Timing uses device->host fetch sync (jax.block_until_ready is a no-op on
this environment's relay TPU backend — see CLAUDE.md).

Usage: python scripts/bench_presets.py [preset ...]
"""

from __future__ import annotations

import os
import sys

# Runnable from anywhere: the package lives at the repo root, one level up.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys
import time

PRESET_STEPS = {
    # (warmup, timed) — the BiLSTM scan compiles ~200 s, keep its run short
    "2src_toy_cpu": (5, 50),
    "wsj0_logmel": (5, 100),
    "3src_pit": (3, 30),
    "music_complex_44k": (3, 50),
    "stream_v5e8": (5, 100),
}


def bench_preset(name: str, set_overrides=()) -> dict:
    import jax

    from gan_sass_tf_tpu import config
    from gan_sass_tf_tpu.cli import _apply_overrides
    from gan_sass_tf_tpu.train import Experiment

    cfg = config.get_config(name)
    if set_overrides:
        cfg = _apply_overrides(cfg, list(set_overrides))
    overrides = {}
    if cfg.data.dataset != "synthetic":
        overrides["data"] = cfg.data.__class__(
            **{**cfg.data.__dict__, "dataset": "synthetic"})
    n_chips = len(jax.devices())
    overrides["mesh"] = cfg.mesh.__class__(data_axis_size=-1)
    overrides["train"] = cfg.train.__class__(
        **{**cfg.train.__dict__,
           "batch_size": max(cfg.train.batch_size // max(
               cfg.mesh.data_axis_size, 1), 1) * n_chips})
    cfg = cfg.replace(**overrides)

    warmup, steps = PRESET_STEPS[name]
    exp = Experiment(cfg, workdir=None)
    data = exp._bank if exp._use_bank else None
    assert data is not None, "presets bench assumes device-bank mode"
    state, rng = exp.state, exp._train_rng
    for _ in range(warmup):
        state, metrics = exp._train_step(state, data, rng)
    float(metrics["g_loss"])                     # true sync (fetch)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = exp._train_step(state, data, rng)
    float(metrics["g_loss"])
    dt = time.perf_counter() - t0
    mix_sec = steps * cfg.train.batch_size * cfg.segment_samples \
        / cfg.dsp.sample_rate
    return {
        "preset": name,
        "metric": "train_throughput",
        "value": round(mix_sec / dt / n_chips, 1),
        "unit": "mixture-sec/sec/chip",
        "step_ms": round(dt / steps * 1e3, 2),
        "batch": cfg.train.batch_size,
    }


def bench_streaming() -> list:
    import jax
    import numpy as np

    from gan_sass_tf_tpu import config, models
    from gan_sass_tf_tpu.infer.streaming import (
        separate_streaming,
        separate_streaming_scan,
    )

    cfg = config.get_config("stream_v5e8")
    cfg = cfg.replace(mesh=cfg.mesh.__class__(data_axis_size=-1))
    g = models.build_generator(cfg)
    t = 60 * cfg.dsp.sample_rate
    n = np.arange(t) / cfg.dsp.sample_rate
    wav = (np.sin(2 * np.pi * 300 * n)
           + np.sin(2 * np.pi * 1500 * n)).astype(np.float32)
    feats = np.zeros((1, 16, cfg.dsp.feature_dim), np.float32)
    params = g.init(jax.random.PRNGKey(0), feats, train=False)["params"]

    rows = []
    for mode, fn in (("scan", separate_streaming_scan),
                     ("batch", separate_streaming)):
        fn(params, cfg, wav)                     # compile + warm cache
        t0 = time.perf_counter()
        out = fn(params, cfg, wav)
        float(out.ravel()[0])                    # already np, but be uniform
        dt = time.perf_counter() - t0
        rows.append({
            "preset": "stream_v5e8",
            "metric": f"streaming_{mode}_realtime_factor",
            "value": round(60.0 / dt, 1),
            "unit": "x real time",
            "wall_s": round(dt, 3),
        })
    return rows


def main() -> None:
    argv = sys.argv[1:]
    overrides = []
    names = []
    i = 0
    while i < len(argv):
        if argv[i] == "--set" and i + 1 < len(argv):
            overrides.append(argv[i + 1])
            i += 2
        else:
            names.append(argv[i])
            i += 1
    names = names or list(PRESET_STEPS)
    for name in names:
        if name == "streaming":
            for row in bench_streaming():
                print(json.dumps(row), flush=True)
            continue
        print(json.dumps(bench_preset(name, overrides)), flush=True)


if __name__ == "__main__":
    main()
