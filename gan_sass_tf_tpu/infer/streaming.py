"""Streaming chunked separation (BASELINE.json:11; SURVEY.md §5.7 — this is
the contract's sequence-length scaling story, replacing attention-style
CP/ring machinery which the reference does not have).

Pipeline:
  1. Host slices the long mixture into overlapping chunks aligned to the
     STFT hop grid (overlap = stream.overlap_frames hops).
  2. Chunks are batched (stream.batch_chunks) and dispatched through the
     fused jitted separate graph, the batch dim sharded across the
     ('dcn','data') mesh — "batched pjit across a v5e-8".
  3. Per-source chunk outputs are permutation-aligned chunk-to-chunk (a PIT
     net has no canonical source order; neighbors are matched by L2 on the
     overlap region — tiny host-side S×S computation per boundary).
  4. Linear cross-fade + overlap-add reassembles the full waveforms on
     device via the same scatter-free OLA used by the DSP layer.
"""

from __future__ import annotations

import functools
import itertools
import jax
import jax.numpy as jnp
import numpy as np

from gan_sass_tf_tpu import models
from gan_sass_tf_tpu.dsp.stft import overlap_add
from gan_sass_tf_tpu.parallel import batch_sharding, make_mesh
from gan_sass_tf_tpu.train.step import build_separate_fn


def _chunk_geometry(cfg, total: int):
    sr, hop, n_fft = cfg.dsp.sample_rate, cfg.dsp.hop_length, cfg.dsp.n_fft
    chunk = int(cfg.stream.chunk_seconds * sr)
    chunk = max(n_fft, n_fft + ((chunk - n_fft) // hop) * hop)  # frame grid
    overlap = cfg.stream.overlap_frames * hop
    if overlap >= chunk:
        raise ValueError(f"overlap {overlap} >= chunk {chunk}")
    stride = chunk - overlap
    n_chunks = max(1, -(-(total - overlap) // stride))
    padded = n_chunks * stride + overlap
    return chunk, stride, overlap, n_chunks, padded


def _align_chunk_permutations(
    chunks: np.ndarray, stride: int, overlap: int
) -> np.ndarray:
    """chunks (N, S, T_c): reorder each chunk's sources to match the previous
    chunk on the shared overlap region (greedy chain, exact for S ≤ 3 via
    full permutation search)."""
    n, s, t_c = chunks.shape
    if s == 1 or n == 1 or overlap == 0:
        return chunks
    perms = list(itertools.permutations(range(s)))
    out = chunks.copy()
    for i in range(1, n):
        prev_tail = out[i - 1, :, stride:]          # (S, overlap)
        head = out[i, :, :overlap]                   # (S, overlap)
        best, best_err = None, None
        for p in perms:
            err = float(np.sum((head[list(p)] - prev_tail) ** 2))
            if best_err is None or err < best_err:
                best, best_err = p, err
        out[i] = out[i, list(best)]
    return out


def build_streaming_scan_fn(cfg, g):
    """Low-latency scan-carry streaming separation (SURVEY.md §5.7): ONE
    jitted program processes all chunks sequentially with lax.scan, carrying
    (a) the previous chunk's overlap tail for the on-device cross-fade and
    (b) nothing else — source consistency is enforced in-graph by matching
    each chunk's sources to the carried tail over all S! permutations
    (static unroll, S ≤ 3 per the contract).

    Returns scan_separate(g_params, chunks (N, T_c)) -> (N, S, stride)
    stride-aligned output segments (concatenate along time to reassemble;
    the final `overlap` samples live in the last chunk's tail and are
    dropped, matching the padded-stream geometry).
    """
    from gan_sass_tf_tpu.losses.pit import permutations_for

    separate = build_separate_fn(cfg, g)
    hop = cfg.dsp.hop_length
    overlap = cfg.stream.overlap_frames * hop
    s = cfg.data.num_sources
    perms = permutations_for(s)                     # (P, S) static

    def scan_separate(g_params, chunks):
        t_c = chunks.shape[-1]
        stride = t_c - overlap
        ramp = (jnp.arange(1, overlap + 1) / (overlap + 1)).astype(jnp.float32)

        def body(carry_tail, xs):
            # carry_tail: (S, overlap) — previous chunk's fade-out segment.
            chunk, i = xs
            wavs = separate(g_params, chunk[None])[0]           # (S, T_c)
            # Match source order to the carried tail (L2 over the overlap).
            head = wavs[:, :overlap]
            errs = jnp.stack(
                [jnp.sum((head[jnp.asarray(p)] - carry_tail) ** 2)
                 for p in perms]
            )
            wavs = wavs[jnp.asarray(perms)[jnp.argmin(errs)]]
            head = wavs[:, :overlap]
            # Cross-fade the overlap against the carried tail — except on
            # chunk 0, whose carry is the zero init (fading against it would
            # attenuate the stream's first `overlap` samples toward zero;
            # the batched path's w[0,:overlap]=1 is the matching behavior).
            faded = jnp.where(
                i == 0, head, carry_tail * (1.0 - ramp) + head * ramp
            )
            out_seg = jnp.concatenate(
                [faded, wavs[:, overlap:stride]], axis=-1
            )                                                    # (S, stride)
            return wavs[:, stride:], out_seg

        init_tail = jnp.zeros((s, overlap), jnp.float32)
        idx = jnp.arange(chunks.shape[0])
        final_tail, segs = jax.lax.scan(body, init_tail, (chunks, idx))
        return segs, final_tail          # (N, S, stride), (S, overlap)

    return scan_separate


@functools.lru_cache(maxsize=8)
def streaming_scan_fn_for(cfg):
    """Memoized jitted scan-streamer for a config — the 13.9 ms/chunk
    headline latency (BASELINE.md) requires the compiled fn to be reused
    across calls, not rebuilt per call (VERDICT r1 item 5).  The inner jit
    still specializes per distinct chunk-count shape (jit's own cache)."""
    g = models.build_generator(cfg)
    return jax.jit(build_streaming_scan_fn(cfg, g))


def separate_streaming_scan(g_params, cfg, mixture: np.ndarray) -> np.ndarray:
    """Host wrapper for the scan-carry streamer: (T,) -> (S, T)."""
    mixture = np.asarray(mixture, np.float32)
    t_in = mixture.shape[-1]
    chunk, stride, overlap, n_chunks, padded = _chunk_geometry(cfg, t_in)
    wav = np.pad(mixture, (0, padded - t_in))
    idx = np.arange(n_chunks)[:, None] * stride + np.arange(chunk)[None, :]
    chunks = jnp.asarray(wav[idx])
    fn = streaming_scan_fn_for(cfg)
    segs, tail = fn(g_params, chunks)                # (N,S,stride), (S,overlap)
    full = np.moveaxis(np.asarray(segs), 1, 0).reshape(cfg.data.num_sources, -1)
    full = np.concatenate([full, np.asarray(tail)], axis=-1)
    return full[..., :t_in]


_BATCH_FN_CACHE: dict = {}


def _batched_separate_fn_for(cfg, mesh):
    """Memoized mesh-sharded separate graph, keyed by (cfg, mesh) — both
    hashable.  shard_map (not GSPMD): the Pallas kernels inside the fused
    separate graph are opaque to the auto-partitioner."""
    key = (cfg, mesh)
    fn = _BATCH_FN_CACHE.get(key)
    if fn is None:
        from jax.sharding import PartitionSpec as P

        g = models.build_generator(cfg)
        fn = jax.jit(
            jax.shard_map(
                build_separate_fn(cfg, g), mesh=mesh,
                in_specs=(P(), P(mesh.axis_names)),
                out_specs=P(mesh.axis_names),
                check_vma=False,
            )
        )
        _BATCH_FN_CACHE[key] = fn
    return fn


def separate_streaming(
    g_params,
    cfg,
    mixture: np.ndarray,
    mesh=None,
    separate_fn=None,
) -> np.ndarray:
    """Long mixture (T,) float32 → (S, T) separated sources, processed in
    hop-aligned overlapping chunks batched over the mesh."""
    mixture = np.asarray(mixture, np.float32)
    if mixture.ndim != 1:
        raise ValueError("separate_streaming takes a single (T,) waveform")
    t_in = mixture.shape[-1]
    chunk, stride, overlap, n_chunks, padded = _chunk_geometry(cfg, t_in)
    mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
    if separate_fn is None:
        separate_fn = _batched_separate_fn_for(cfg, mesh)

    wav = np.pad(mixture, (0, padded - t_in))
    # (N, chunk) overlapped chunk matrix — same shift-reshape framing trick.
    idx = np.arange(n_chunks)[:, None] * stride + np.arange(chunk)[None, :]
    chunks = wav[idx]

    # Batch over the mesh in groups of batch_chunks (pad the tail group).
    # Dispatch EVERY group before fetching any: jax device arrays are
    # futures, so the device computes group k+1 while group k's result
    # downloads — a blocking np.asarray per group serialized the whole
    # pipeline through this environment's relay (VERDICT r1 item 4; 9x
    # slower than scan mode).  Host-side alignment happens after the fetch.
    bc = cfg.stream.batch_chunks
    n_groups = -(-n_chunks // bc)
    shard = batch_sharding(mesh)
    futures = []
    for gi in range(n_groups):
        grp = chunks[gi * bc : (gi + 1) * bc]
        pad_rows = bc - grp.shape[0]
        if pad_rows:
            grp = np.pad(grp, ((0, pad_rows), (0, 0)))
        grp_dev = jax.device_put(jnp.asarray(grp), shard)
        futures.append((separate_fn(g_params, grp_dev), pad_rows))
    outs = [
        np.asarray(out)[: bc - pad_rows] if pad_rows else np.asarray(out)
        for out, pad_rows in futures
    ]
    est = np.concatenate(outs, axis=0)                    # (N, S, T_c)
    t_c = est.shape[-1]

    est = _align_chunk_permutations(est, stride, overlap)

    # Linear cross-fade weights: fade-in over the overlap (except chunk 0),
    # fade-out over the tail overlap (except the last chunk); weights sum
    # to 1 everywhere.
    ramp = (np.arange(1, overlap + 1) / (overlap + 1)).astype(np.float32)
    w = np.ones((n_chunks, t_c), np.float32)
    w[1:, :overlap] = ramp
    w[:-1, t_c - overlap :] = ramp[::-1]
    # t_c may exceed `chunk` slightly?  No: separate_fn output length is the
    # chunk's frame grid == chunk.  Weighted chunks → scatter-free OLA.
    weighted = est * w[:, None, :]                        # (N, S, T_c)
    frames = jnp.asarray(np.moveaxis(weighted, 1, 0))     # (S, N, T_c)
    if t_c % stride == 0:
        full = overlap_add(frames, stride)
    else:
        # general OLA fallback (stride not dividing chunk length)
        full = jnp.zeros((frames.shape[0], (n_chunks - 1) * stride + t_c))
        for i in range(n_chunks):
            full = full.at[:, i * stride : i * stride + t_c].add(frames[:, i])
    return np.asarray(full)[..., :t_in]
