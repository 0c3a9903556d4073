"""wav_dir end-to-end training on real TPU (VERDICT r1 item 5/8): generate a
fixture wav corpus on disk, train through WavDirDataset -> device-resident
bank -> fused train step, and assert finite losses + positive SI-SDR
improvement on held-out synthetic eval mixtures.

Run: plain `python scripts/train_wavdir_fixture.py [steps]` (axon TPU).
Prints one JSON line with the outcome for BASELINE.md.
"""

from __future__ import annotations

import os
import sys

# Runnable from anywhere: the package lives at the repo root, one level up.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys
import tempfile


def main() -> None:
    import numpy as np

    from gan_sass_tf_tpu import config
    from gan_sass_tf_tpu.data.fixtures import write_fixture_corpus
    from gan_sass_tf_tpu.train import Experiment

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 500

    root = tempfile.mkdtemp(prefix="wavdir_fixture_")
    write_fixture_corpus(root, n_speakers=6, utts_per_speaker=4,
                         seconds=4.0, sample_rate=8000, seed=7)

    cfg = config.get_config("wsj0_logmel")
    cfg = cfg.replace(
        data=cfg.data.__class__(**{**cfg.data.__dict__,
                                   "dataset": "wav_dir",
                                   "data_dir": root,
                                   "device_bank": True,
                                   "bank_utterances": 32}),
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "compute_dtype": "bfloat16",
                                     "d_norm": "spectral"}),
        train=cfg.train.__class__(**{**cfg.train.__dict__,
                                     "batch_size": 16, "d_lr": 1e-4,
                                     "steps_per_dispatch": 10,
                                     "log_every": 100,
                                     "eval_every": 10 ** 9}),
        mesh=cfg.mesh.__class__(data_axis_size=-1),
    )
    exp = Experiment(cfg, workdir=None)
    ev0 = exp.evaluate(num_batches=2)
    m = exp.train(num_steps=steps,
                  log_fn=lambda s, mm: print(
                      f"step {s}: g={mm['g_loss']:.4f} d={mm['d_loss']:.4f} "
                      f"({mm.get('mixture_sec_per_sec', 0):.0f} mix-s/s)"))
    ev1 = exp.evaluate(num_batches=2)
    ok = (all(np.isfinite(v) for v in m.values())
          and ev1["si_sdr_improvement"] > 0.0)
    print(json.dumps({
        "run": "wav_dir_fixture_train",
        "steps": steps,
        "si_sdr_improvement_before_db": round(ev0["si_sdr_improvement"], 2),
        "si_sdr_improvement_after_db": round(ev1["si_sdr_improvement"], 2),
        "final_g_loss": round(m["g_loss"], 4),
        "final_d_loss": round(m["d_loss"], 4),
        "ok": ok,
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
