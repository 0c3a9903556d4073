"""Profile the fused train step on the TPU and attribute device time per
model component (the round-2 optimization workflow, see CLAUDE.md):

1. capture an xplane trace of N steps (jax.profiler),
2. parse the Chrome trace (vm.trace.json.gz),
3. join fusion/op names against the compiled HLO's metadata={op_name=...}
   to bucket time into G fwd/bwd, D fwd/bwd, DSP, PIT, other.

Usage: python scripts/profile_step.py [preset] [batch_size] [--set k=v ...]
Prints the per-bucket ms/step and the top attributed ops.
"""

from __future__ import annotations

import os
import sys

# Runnable from anywhere: the package lives at the repo root, one level up.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import collections
import glob
import gzip
import json
import re
import tempfile

STEPS = 20


def main() -> None:
    import jax

    from gan_sass_tf_tpu import config
    from gan_sass_tf_tpu.train import Experiment

    from gan_sass_tf_tpu.cli import _apply_overrides

    argv, overrides = sys.argv[1:], []
    i = 0
    pos = []
    while i < len(argv):
        if argv[i] == "--set" and i + 1 < len(argv):
            overrides.append(argv[i + 1])
            i += 2
        else:
            pos.append(argv[i])
            i += 1
    preset = pos[0] if pos else "wsj0_logmel"
    batch = int(pos[1]) if len(pos) > 1 else 128

    cfg = _apply_overrides(config.get_config(preset), overrides)
    cfg = cfg.replace(
        data=cfg.data.__class__(**{**cfg.data.__dict__,
                                   "dataset": "synthetic"}),
        train=cfg.train.__class__(**{**cfg.train.__dict__,
                                     "batch_size": batch}),
        mesh=cfg.mesh.__class__(data_axis_size=-1),
    )
    exp = Experiment(cfg, workdir=None)

    # name -> op_name metadata from the optimized HLO
    hlo = exp._train_step.lower(
        exp.state, exp._bank, exp._train_rng).compile().as_text()
    meta = {}
    pat = re.compile(r"%([\w.\-]+) = .*?metadata=\{op_name=\"([^\"]*)\"")
    for line in hlo.splitlines():
        m = pat.search(line)
        if m:
            meta[m.group(1)] = m.group(2)

    state, rng, bank = exp.state, exp._train_rng, exp._bank
    for _ in range(5):
        state, mm = exp._train_step(state, bank, rng)
    float(mm["g_loss"])                          # true sync (relay)
    trace_dir = tempfile.mkdtemp(prefix="step_profile_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(STEPS):
        state, mm = exp._train_step(state, bank, rng)
    float(mm["g_loss"])
    jax.profiler.stop_trace()

    tj = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                          recursive=True))[-1]
    with gzip.open(tj) as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}

    def bucket(op: str) -> str:
        if "Discriminator" in op:
            return "D bwd" if "transpose(jvp" in op else "D fwd"
        if "Generator" in op or "MaskHead" in op:
            return "G bwd" if "transpose(jvp" in op else "G fwd"
        low = op.lower()
        for k in ("stft", "fft", "sample_bank", "mix_sources", "pallas",
                  "roll"):
            if k in low:
                return "DSP/data"
        if "pit" in low or "argmin" in low:
            return "PIT"
        return "other"

    agg: collections.Counter = collections.Counter()
    top: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            nm = e["name"]
            if nm.startswith("jit_") or nm.isdigit():
                continue
            op = meta.get(nm)
            agg[bucket(op) if op else "UNATTR"] += e.get("dur", 0)
            # Unattributed ops rank by raw HLO name (reverse.N, copy.N,
            # slice-start.N — data movement the bytes ledger flagged).
            top[(op or nm)[:100]] += e.get("dur", 0)

    tot = sum(agg.values())
    print(f"{preset} batch={batch}: {tot / STEPS / 1e3:.2f} ms/step "
          f"device time over {STEPS} steps")
    for k, v in agg.most_common():
        print(f"  {v / STEPS:9.1f} us  {k}")
    print("top attributed ops:")
    for op, v in top.most_common(20):
        print(f"  {v / STEPS:8.1f} us  {op}")
    print(json.dumps({
        "preset": preset, "batch": batch,
        "device_ms_per_step": round(tot / STEPS / 1e3, 2),
        "buckets_us_per_step": {k: round(v / STEPS, 1)
                                for k, v in agg.most_common()},
        "top_ops_us_per_step": {op: round(v / STEPS, 1)
                                for op, v in top.most_common(15)},
    }))


if __name__ == "__main__":
    main()
