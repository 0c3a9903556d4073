"""Quickstart: train a 2-source separator on synthetic mixtures, then
separate a mixture wav into per-source wavs.

    python examples/quickstart.py [workdir] [steps]

On a TPU host this runs the fused bf16 training step with the device-resident
data bank; on CPU it uses the same code path on the XLA DSP backend.
"""

import os
import sys

# Runnable from anywhere: the package lives at the repo root, one level up.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

import numpy as np

from gan_sass_tf_tpu import config
from gan_sass_tf_tpu.infer import separate
from gan_sass_tf_tpu.train import Experiment
from gan_sass_tf_tpu.utils.wav_io import write_wav


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "runs/quickstart"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    cfg = config.get_config("stream_v5e8")
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(data_axis_size=-1),
        train=cfg.train.__class__(**{**cfg.train.__dict__,
                                     "batch_size": 16, "log_every": 200}),
    )

    exp = Experiment(cfg, workdir=workdir, tensorboard=False)
    exp.train(num_steps=steps, log_fn=lambda s, m: print(
        f"step {s}: g={m['g_loss']:.3f} d={m['d_loss']:.4f} "
        f"recon={m['g_recon']:.4f} ({m['mixture_sec_per_sec']:.0f} mix-s/s)",
        flush=True,
    ))
    print("eval:", {k: round(v, 2) for k, v in exp.evaluate().items()})

    # Separate a fresh synthetic mixture and write the results.
    sr = cfg.dsp.sample_rate
    batch = exp.eval_dataset.batch(1)          # (1, S, T) sources
    mixture = batch.sum(axis=1)[0]
    # (builds a single-example jitted graph; exp.separate_fn is the
    #  mesh-batched variant and needs batch % mesh-size == 0)
    wavs = separate(exp.state.g_params, cfg, mixture)
    write_wav(f"{workdir}/mixture.wav", sr, mixture)
    for i, w in enumerate(np.asarray(wavs)):
        write_wav(f"{workdir}/source_{i}.wav", sr, w)
        print(f"wrote {workdir}/source_{i}.wav")
    exp.close()


if __name__ == "__main__":
    main()
