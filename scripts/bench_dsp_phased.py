"""A/B bench for the phased sub-128-hop Pallas DSP path (VERDICT r4 item 10).

The auto dispatcher routes hop < 128 to XLA because at the TOY geometry
(n_fft 256, hop 64) the phased decomposition measured ~1.5x slower than
XLA's small-FFT chain.  This script measures the one geometry family where
phased Pallas could plausibly win instead: LARGER n_fft at a sub-128 hop
(the phase count m = 128/hop is fixed, but the per-kernel matmul-DFT work
grows with n_fft, amortizing the phase interleave overhead).

Chains stft_features -> mask -> masked_istft back into the next round's
input (R rounds inside ONE jitted dispatch, so rounds serialize and cannot
be CSE'd away), fetch-synced (jax.block_until_ready is a no-op on the
relay).  Also reports the xla-vs-pallas output delta as an on-hardware
fidelity check at this geometry.

Usage:  python scripts/bench_dsp_phased.py [n_fft] [hop] [batch] [seconds]

Prints ONE final JSON line (queue-runner contract).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = 32
TIMED_DISPATCHES = 3


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_sass_tf_tpu import config
    from gan_sass_tf_tpu.ops import dispatch as ops

    n_fft = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    hop = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    seconds = float(sys.argv[4]) if len(sys.argv) > 4 else 3.0

    dcfg = config.DSPConfig(sample_rate=8000, n_fft=n_fft, hop_length=hop,
                            win_length=n_fft)
    t = int(seconds * dcfg.sample_rate)
    t = ((t - n_fft) // hop) * hop + n_fft   # frame-aligned => the istft
    #                                          roundtrip preserves length
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, t)), jnp.float32)

    def make_chain(backend: str):
        def one_round(_, w):
            out = ops.stft_features(w, dcfg, emit=("spec", "logmag"),
                                    backend=backend)
            m = jax.nn.sigmoid(out["logmag"])
            masks = jnp.stack([m, 1.0 - m], axis=-3)       # (B, 2, F, K)
            wavs = ops.masked_istft(out["spec"], masks, n_fft, hop,
                                    dcfg.window, length=t, backend=backend)
            return jnp.sum(wavs, axis=-2)                  # (B, T)

        return jax.jit(
            lambda w: jax.lax.fori_loop(0, ROUNDS, one_round, w))

    results = {}
    outs = {}
    for backend in ("xla", "pallas"):
        fn = make_chain(backend)
        out = fn(wav)
        float(jnp.sum(out))                                # compile + sync
        t0 = time.perf_counter()
        for _ in range(TIMED_DISPATCHES):
            out = fn(wav)
        float(jnp.sum(out))                                # true sync
        dt = time.perf_counter() - t0
        results[backend] = dt / (TIMED_DISPATCHES * ROUNDS) * 1e3  # ms/round
        outs[backend] = np.asarray(out)

    delta = float(np.max(np.abs(outs["xla"] - outs["pallas"])))
    scale = float(np.max(np.abs(outs["xla"])) + 1e-12)
    print(json.dumps({
        "bench": "dsp_phased", "n_fft": n_fft, "hop": hop,
        "phases": 128 // hop if 128 % hop == 0 else 1,
        "batch": batch, "seconds": seconds, "rounds": ROUNDS,
        "xla_ms_per_round": round(results["xla"], 4),
        "pallas_ms_per_round": round(results["pallas"], 4),
        "pallas_speedup_vs_xla": round(results["xla"] / results["pallas"], 3),
        "max_abs_delta": delta, "rel_delta": delta / scale,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
