"""Roofline measurement per preset (VERDICT r3 item 1a): turn
"compute-bound"/"HBM-bound" assertions into numbers.

For each preset: compile the fused train step, read the compiled HLO's
cost_analysis() (XLA's own FLOP count and bytes-accessed estimate), measure
the real step time (fetch-synced — jax.block_until_ready is a no-op through
this env's relay), and report achieved TFLOP/s and GB/s against the v5e
peaks.  The ratio of the two utilizations says which wall the preset sits
against; the LOWER of (time at compute peak, time at BW peak) vs measured
time is the speed-of-light headroom.

    python scripts/roofline.py [preset ...] [--steps N] [--batch B]
        [--set k=v ...]

Prints one JSON line per preset.

Caveats (reported in the JSON):
- cost_analysis does NOT see inside Pallas custom calls, so presets whose
  DSP resolves to the Pallas kernels (wsj0/stream/toy geometries on TPU)
  undercount FLOPs/bytes by the DSP share (profiled at <10% of those steps).
- "bytes accessed" is XLA's static estimate of operand+output traffic per
  fusion — a good HBM proxy post-fusion, not a hardware counter.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e (one chip) peaks: 197 TFLOP/s bf16 / 394 int8; HBM 16 GB at
# 819 GB/s (public spec).  f32 matmul goes through the same MXU at ~1/4
# rate but these steps run bf16 compute where it matters.
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0


def measure_preset(preset: str, steps: int, batch, overrides):
    from gan_sass_tf_tpu import config as config_lib
    from gan_sass_tf_tpu.cli import _apply_overrides
    from gan_sass_tf_tpu.ops.dispatch import _resolve
    from gan_sass_tf_tpu.train import Experiment

    cfg = config_lib.get_config(preset)
    data_kw = {"dataset": "synthetic"}
    if preset == "music_complex_44k":
        data_kw["slot_profiles"] = ("vocal", "accomp")
    cfg = cfg.replace(
        data=cfg.data.__class__(**{**cfg.data.__dict__, **data_kw}),
        mesh=cfg.mesh.__class__(data_axis_size=-1),
    )
    if batch is not None:
        cfg = cfg.replace(
            train=cfg.train.__class__(**{**cfg.train.__dict__,
                                         "batch_size": batch}))
    cfg = _apply_overrides(cfg, list(overrides))
    exp = Experiment(cfg, workdir=None)

    compiled = exp._train_step.lower(
        exp.state, exp._bank, exp._train_rng).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):   # one entry per device on some paths
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    ca_bytes = float(ca.get("bytes accessed", 0.0))
    # Round-5 correction: cost_analysis' aggregate counts intra-fusion
    # operand bytes that never touch HBM (round-4 rows showed presets at an
    # impossible exactly-100% of peak).  The entry-computation ledger
    # (operands+outputs of post-fusion instructions, slice/async-aware) is
    # the HBM-traffic proxy; SoL below uses it.
    # (round-5: physical bytes — tiled layouts + scoped-memory buffers
    # free — are the honest HBM proxy; logical bytes under-count the
    # lane padding of narrow-channel tensors by up to 2x.)
    from bytes_ledger import entry_ledger, parse_hlo
    rows = list(entry_ledger(parse_hlo(compiled.as_text())))
    byts = float(sum(r[3] for r in rows))
    logical_byts = float(sum(r[2] for r in rows))

    state, bank, rng = exp.state, exp._bank, exp._train_rng
    for _ in range(5):
        state, mm = exp._train_step(state, bank, rng)
    float(mm["g_loss"])                       # true sync (relay)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, mm = exp._train_step(state, bank, rng)
    float(mm["g_loss"])
    dt = (time.perf_counter() - t0) / steps   # s/step

    tflops = flops / dt / 1e12
    gbs = byts / dt / 1e9
    mxu_util = tflops / PEAK_BF16_TFLOPS
    hbm_util = gbs / PEAK_HBM_GBS
    # Speed-of-light step time: whichever wall binds if the other were free.
    sol = max(flops / (PEAK_BF16_TFLOPS * 1e12), byts / (PEAK_HBM_GBS * 1e9))
    dsp_backend = _resolve(cfg.dsp.backend, cfg.dsp.n_fft,
                           cfg.dsp.hop_length)
    seg_s = cfg.segment_samples / cfg.dsp.sample_rate
    return {
        "preset": preset,
        "batch": cfg.train.batch_size,
        "ms_per_step": round(dt * 1e3, 2),
        "mix_s_per_s": round(cfg.train.batch_size * seg_s / dt, 1),
        "hlo_gflops_per_step": round(flops / 1e9, 1),
        "hlo_gb_per_step": round(byts / 1e9, 2),
        "hlo_logical_gb_per_step": round(logical_byts / 1e9, 2),
        "cost_analysis_gb_per_step": round(ca_bytes / 1e9, 2),
        "achieved_tflops": round(tflops, 1),
        "achieved_gbs": round(gbs, 1),
        "mxu_util_vs_bf16_peak": round(mxu_util, 3),
        "hbm_util_vs_peak": round(hbm_util, 3),
        "bound": ("compute" if mxu_util > hbm_util else "hbm"),
        "speed_of_light_ms": round(sol * 1e3, 2),
        "sol_headroom_x": round(dt / sol, 2) if sol > 0 else None,
        "dsp_backend": dsp_backend,
        "flops_undercounted": dsp_backend == "pallas",
    }


def calibrate_hbm(gb: float = 2.0, iters: int = 20) -> dict:
    """Measured practical HBM ceiling: a pure-streaming elementwise kernel
    (read + write `gb` GB per iteration) with fetch-synced timing.  The
    roofline's 819 GB/s is the paper peak; this is what a perfectly
    HBM-bound step could actually sustain on this chip."""
    import jax
    import jax.numpy as jnp

    n = int(gb * 1e9 / 4)

    @jax.jit
    def stream(x):
        return x * 1.000001 + 1e-9

    x = jnp.zeros((n,), jnp.float32)
    for _ in range(3):
        x = stream(x)
    float(x[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = stream(x)
    float(x[0])
    dt = (time.perf_counter() - t0) / iters
    moved = 2 * n * 4          # read + write
    return {"calibration": "hbm_stream", "gb_per_iter": round(moved / 1e9, 2),
            "measured_gbs": round(moved / dt / 1e9, 1),
            "pct_of_paper_peak": round(100 * moved / dt / 1e9 / PEAK_HBM_GBS,
                                       1)}


def main(argv) -> int:
    steps = 30
    batch = None
    calibrate = False
    presets, overrides = [], []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--steps" and i + 1 < len(argv):
            steps = int(argv[i + 1]); i += 2
        elif a == "--batch" and i + 1 < len(argv):
            batch = int(argv[i + 1]); i += 2
        elif a == "--calibrate":
            calibrate = True; i += 1
        elif a == "--set" and i + 1 < len(argv):
            overrides.append(argv[i + 1]); i += 2
        else:
            presets.append(a); i += 1
    if calibrate:
        print(json.dumps(calibrate_hbm()), flush=True)
    if not presets:
        presets = ["wsj0_logmel", "3src_pit", "music_complex_44k",
                   "stream_v5e8"]
    for p in presets:
        print(json.dumps(measure_preset(p, steps, batch, overrides)),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
