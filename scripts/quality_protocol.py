"""Quality protocol runner (VERDICT r2 items 1-2, r3 item 3): train a preset
on-chip, report eval SI-SDR improvement AND the oracle-mask ceiling for the
task — the gap is the modeling headroom future rounds optimize.

    python scripts/quality_protocol.py PRESET [STEPS] [--hard]
        [--seeds 0,7,13] [--set k=v ...]

--hard applies the headroom protocol (BASELINE.json:2 kept a live axis):
shared-f0 synthetic speakers (slot identity = timbre/modulation only, heavy
T-F overlap) + Gaussian noise at 10 dB SNR.  For music_complex_44k the
vocal/accomp slot profiles are applied automatically (BASELINE.json:10
stand-ins; no real corpora in this env).

--seeds runs the FULL train/eval once per seed (default: just seed 0) and
reports the mean ± half-range — the protocol owns seed averaging (measured
±1.3 dB task-seed variance on hard rows; single-seed deltas below that are
noise).  Seeds reuse the compiled step fns via Experiment.reseed, so extra
seeds cost train time only, not compile time.

Prints one JSON line:
  {"preset":..., "hard":..., "steps":..., "seeds":[...],
   "si_sdr_improvement":<mean>, "si_sdr_improvement_per_seed":[...],
   "si_sdr_improvement_half_range":..., "oracle_bound":<mean>,
   "headroom":..., "d_loss":...}
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def protocol_config(name: str, hard: bool, overrides=()):
    from gan_sass_tf_tpu import config as config_lib
    from gan_sass_tf_tpu.cli import _apply_overrides

    cfg = config_lib.get_config(name)
    data_kw = {"dataset": "synthetic"}
    if name == "music_complex_44k":
        data_kw["slot_profiles"] = ("vocal", "accomp")
    if hard:
        data_kw.update(f0_mode="shared", num_noise=1, snr_db=10.0)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, **data_kw),
        # Fit whatever devices exist (presets may pin a v5e-8 mesh).
        mesh=dataclasses.replace(cfg.mesh, data_axis_size=-1),
    )
    return _apply_overrides(cfg, list(overrides))


def oracle_bound_on_eval(exp, num_batches: int = 4) -> float:
    """Oracle-mask SI-SDRi on the SAME eval distribution evaluate() uses
    (same dataset stream contract: fresh batches, fixed per-batch keys)."""
    from gan_sass_tf_tpu.data.mixer import mix_sources
    from gan_sass_tf_tpu.losses import oracle_bound_si_sdr

    cfg = exp.cfg

    @jax.jit
    def bound(sources, rng):
        mixture, scaled = mix_sources(sources, rng, cfg.data)
        return oracle_bound_si_sdr(mixture, scaled, cfg.dsp)

    acc = 0.0
    for i in range(num_batches):
        sources = jnp.asarray(exp.eval_dataset.batch())
        out = bound(sources, jax.random.PRNGKey(20_000 + i))
        acc += float(out["si_sdr_improvement"]) / num_batches
    return acc


def main(argv) -> int:
    from gan_sass_tf_tpu.train import Experiment

    hard = "--hard" in argv
    overrides, seeds, skip = [], [0], set()
    for i, a in enumerate(argv):
        if a == "--set" and i + 1 < len(argv):
            overrides.append(argv[i + 1])
            skip.update((i, i + 1))
        elif a == "--seeds" and i + 1 < len(argv):
            seeds = [int(s) for s in argv[i + 1].split(",")]
            skip.update((i, i + 1))
        elif a.startswith("--"):
            skip.add(i)
    args = [a for i, a in enumerate(argv) if i not in skip]
    preset = args[0] if args else "stream_v5e8"
    steps = int(args[1]) if len(args) > 1 else 10_000

    cfg = protocol_config(preset, hard, overrides)
    exp = Experiment(cfg, workdir=None)

    d_traj: list = []   # (step, d_loss) at every log interval, current seed

    def log(step, m):
        d_traj.append((step, float(m["d_loss"])))
        if step % max(cfg.train.log_every * 10, 1) < cfg.train.log_every:
            print(f"step {step}: g={m['g_loss']:.3f} d={m['d_loss']:.3f} "
                  f"thr={m['mixture_sec_per_sec']:.0f}", file=sys.stderr,
                  flush=True)

    def traj_summary():
        """d_loss at ~25/50/75/100% of training — 'stays off the floor'
        is a trajectory claim, not a final-step one."""
        if not d_traj:
            return []
        # Evenly spaced distinct picks ending on the true final entry
        # (ADVICE r4: (len*q)//4 duplicated 75%/100% and skewed 25%).
        picks = [d_traj[round((len(d_traj) - 1) * q / 4)]
                 for q in (1, 2, 3, 4)]
        return [round(v, 4) for _, v in picks]

    from gan_sass_tf_tpu.data import make_dataset

    per_seed = []
    for seed in seeds:
        exp.reseed(seed)   # fresh state/bank/datasets, compiled fns reused
        d_traj.clear()
        metrics = exp.train(num_steps=steps, log_fn=log)
        ev = exp.evaluate(num_batches=8)
        bound = oracle_bound_on_eval(exp, num_batches=8)
        # Train-distribution eval alongside the held-out one: the gap
        # between them is the generalization gap, reported per row.
        tr_ds = make_dataset(cfg, seed=seed + 4242, split="train")
        ev_tr = exp.evaluate(num_batches=8, dataset=tr_ds)
        per_seed.append({
            "seed": seed,
            "si_sdr_improvement": ev["si_sdr_improvement"],
            "si_sdr_improvement_train_dist": ev_tr["si_sdr_improvement"],
            "oracle_bound": bound,
            "d_loss": metrics.get("d_loss", float("nan")),
            "d_loss_traj": traj_summary(),
            "throughput": metrics.get("mixture_sec_per_sec", 0.0),
        })
        print(f"seed {seed}: held-out "
              f"{ev['si_sdr_improvement']:+.2f} dB (train-dist "
              f"{ev_tr['si_sdr_improvement']:+.2f}, bound {bound:.2f})",
              file=sys.stderr, flush=True)

    def mean(key):
        return sum(r[key] for r in per_seed) / len(per_seed)

    def half_range(key):
        vals = [r[key] for r in per_seed]
        return (max(vals) - min(vals)) / 2.0

    out = {
        "preset": preset,
        "hard": hard,
        "steps": steps,
        "seeds": seeds,
        "si_sdr_improvement": round(mean("si_sdr_improvement"), 2),
        "si_sdr_improvement_per_seed": [
            round(r["si_sdr_improvement"], 2) for r in per_seed],
        "si_sdr_improvement_half_range": round(
            half_range("si_sdr_improvement"), 2),
        "si_sdr_improvement_train_dist": round(
            mean("si_sdr_improvement_train_dist"), 2),
        "oracle_bound": round(mean("oracle_bound"), 2),
        "headroom": round(
            mean("oracle_bound") - mean("si_sdr_improvement"), 2),
        "d_loss": round(mean("d_loss"), 4),
        "d_loss_traj_per_seed": [r["d_loss_traj"] for r in per_seed],
        "d_norm": cfg.model.d_norm,
        "throughput": round(mean("throughput"), 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
