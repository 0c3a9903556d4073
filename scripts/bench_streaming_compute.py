"""Transfer-independent streaming benchmark (VERDICT r2 item 8).

The end-to-end streaming numbers in BASELINE.md are bound by this
environment's relay transfer bandwidth, which swings ~3x run to run — a real
compute regression would vanish into that noise.  This benchmark pins the
COMPUTE-side latency: chunks live on device before the clock starts, one
warm-up compiles everything, and each timed repetition ends in a single tiny
scalar fetch (the only true sync through the relay; block_until_ready is a
no-op here).  The fixed ~25 ms fetch cost is measured separately and
subtracted.

    python scripts/bench_streaming_compute.py [seconds] [reps]

Prints one JSON line per mode:
  {"mode": "scan"|"batch", "ms_per_chunk": ..., "x_realtime": ...,
   "chunks": N, "reps": R}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gan_sass_tf_tpu import config, models
    from gan_sass_tf_tpu.infer.streaming import (
        _batched_separate_fn_for,
        _chunk_geometry,
        _finalize_stream,
        streaming_scan_fn_for,
    )
    from gan_sass_tf_tpu.parallel import make_mesh
    from gan_sass_tf_tpu.train.state import create_train_state

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    cfg = config.get_config("stream_v5e8")
    cfg = cfg.replace(mesh=cfg.mesh.__class__(data_axis_size=-1))
    sr = cfg.dsp.sample_rate
    t_in = int(seconds * sr)
    chunk, stride, overlap, n_chunks, padded, ext = _chunk_geometry(cfg, t_in)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal(padded).astype(np.float32) * 0.1
    idx = (np.arange(n_chunks)[:, None] * stride
           + np.arange(chunk + ext)[None, :])
    chunks_host = wav[idx]

    g = models.build_generator(cfg)
    d = models.build_discriminator(cfg)
    state = jax.jit(lambda r: create_train_state(cfg, g, d, r))(
        jax.random.PRNGKey(0)
    )
    g_params = state.g_params

    # Measure the fixed sync-fetch cost (fetch of an already-materialized
    # device scalar) to subtract from the per-rep times.
    zero = jnp.zeros(())
    float(zero)
    t0 = time.perf_counter()
    for _ in range(5):
        float(zero)
    fetch_ms = (time.perf_counter() - t0) / 5 * 1e3

    audio_sec = n_chunks * stride / sr
    results = []

    # -- scan mode: device-resident chunks, one fetch per rep --------------
    chunks_dev = jax.device_put(jnp.asarray(chunks_host))
    scan_fn = streaming_scan_fn_for(cfg)
    segs, tail = scan_fn(g_params, chunks_dev)      # warm-up compile
    float(tail[0, 0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        segs, tail = scan_fn(g_params, chunks_dev)
        float(tail[0, 0])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) - fetch_ms / 1e3
    results.append({
        "mode": "scan", "ms_per_chunk": round(med / n_chunks * 1e3, 2),
        "x_realtime": round(audio_sec / med, 1),
        "chunks": n_chunks, "reps": reps,
        "fetch_ms_subtracted": round(fetch_ms, 1),
    })

    # -- batch mode: pre-sharded device groups, finalize on device ---------
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(cfg.mesh)
    bc = cfg.stream.batch_chunks
    n_groups = -(-n_chunks // bc)
    chunks_pad = np.pad(chunks_host, ((0, n_groups * bc - n_chunks), (0, 0)))
    shard3 = NamedSharding(mesh, P(None, mesh.axis_names))
    groups_dev = jax.device_put(
        chunks_pad.reshape(n_groups, bc, -1), shard3
    )
    sep_fn = _batched_separate_fn_for(cfg, mesh)
    perm0 = jnp.tile(jnp.arange(cfg.data.num_sources), (n_chunks, 1))

    # ONE jitted dispatch for the whole utterance: per-group Python-loop
    # dispatches each pay a relay round-trip whose latency swings run to
    # run (measured 2.4x), which is exactly the noise this benchmark
    # exists to exclude.  Inlining the groups under a single jit leaves
    # only device compute on the clock.
    @jax.jit
    def run_batch(g_params, groups_dev):
        outs = [sep_fn(g_params, groups_dev[gi])[..., :chunk]
                for gi in range(n_groups)]
        est = jnp.concatenate(outs, axis=0)[:n_chunks]
        # identity permutation: the chaining fetch is part of the TRANSFER
        # path this benchmark deliberately excludes; the compute cost of
        # _finalize_stream (gather/fade/OLA) is included.
        return _finalize_stream(est, perm0, stride, overlap)

    full = run_batch(g_params, groups_dev)           # warm-up compile
    float(full[0, 0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        full = run_batch(g_params, groups_dev)
        float(full[0, 0])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) - fetch_ms / 1e3
    results.append({
        "mode": "batch", "ms_per_chunk": round(med / n_chunks * 1e3, 2),
        "x_realtime": round(audio_sec / med, 1),
        "chunks": n_chunks, "reps": reps,
        "fetch_ms_subtracted": round(fetch_ms, 1),
    })

    for r in results:
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
