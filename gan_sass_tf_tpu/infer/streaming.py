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
from gan_sass_tf_tpu.parallel import make_mesh
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
    # win_length < n_fft: the tf-exact iSTFT cannot reconstruct the last
    # n_fft - win_length samples of any segment (no analysis frame covers
    # them; separate() zero-pads there).  Each chunk therefore READS a
    # hop-aligned extension beyond its OLA span and the output is cropped
    # back to `chunk`, so the silent tail never enters the cross-fade.
    ext = cfg.dsp.n_fft - cfg.dsp.win_length
    if ext:
        ext = -(-ext // hop) * hop
    padded = n_chunks * stride + overlap + ext
    return chunk, stride, overlap, n_chunks, padded, ext


def _chain_permutations(
    heads: np.ndarray, tails: np.ndarray, hysteresis: float = 1e-3,
    scale: float | None = None,
) -> np.ndarray:
    """heads/tails (N, S, overlap): per-chunk source permutation (N, S) that
    aligns each chunk to the previous chunk's (aligned) tail on the shared
    overlap region — greedy chain, exact for S ≤ 3 via full permutation
    search.  Operates on the small overlap strips only, so the full chunk
    tensor can stay on device (the per-chunk host fetches were the batch
    streamer's bottleneck through this environment's relay).

    `hysteresis`: keep the PREVIOUS chunk's assignment unless a competing
    permutation improves the L2 by more than hysteresis * scale * (S *
    overlap).  `scale` must be the STREAM's typical per-sample energy (mean
    squared amplitude over whole chunks — defaults to the strips' own, but
    callers pass the full-chunk statistic): a near-silent overlap (pause
    between notes/words — routine in the hard protocol's noisy material)
    carries no matching evidence, and pure argmin would let noise-level L2
    differences flip sources mid-stream.  The margin therefore must NOT
    shrink with the strip energy — it is the stream's loudness that defines
    "near-silent".  A deterministic separator's output order is stable
    across chunks, so keeping the previous assignment is the right prior
    exactly when the evidence vanishes; genuine (loud) swaps exceed the
    margin by orders of magnitude and are still corrected."""
    n, s, _ = heads.shape
    out = np.tile(np.arange(s), (n, 1))
    if s == 1 or n == 1 or heads.shape[-1] == 0:
        return out
    if scale is None:
        scale = float(np.mean(heads ** 2) + np.mean(tails ** 2)) / 2.0
    margin = hysteresis * scale * s * heads.shape[-1]
    perms = list(itertools.permutations(range(s)))
    for i in range(1, n):
        prev_tail = tails[i - 1][out[i - 1]]         # aligned (S, overlap)
        head = heads[i]                              # (S, overlap)
        errs = {p: float(np.sum((head[list(p)] - prev_tail) ** 2))
                for p in perms}
        best = min(errs, key=errs.get)
        keep = tuple(out[i - 1])                     # previous assignment
        out[i] = best if errs[best] < errs[keep] - margin else keep
    return out


def _align_chunk_permutations(
    chunks: np.ndarray, stride: int, overlap: int, hysteresis: float = 1e-3
) -> np.ndarray:
    """chunks (N, S, T_c): reorder each chunk's sources to match the previous
    chunk on the shared overlap region (host-array convenience wrapper
    around _chain_permutations)."""
    perm = _chain_permutations(chunks[:, :, :overlap],
                               chunks[:, :, stride : stride + overlap],
                               hysteresis,
                               scale=float(np.mean(chunks ** 2)))
    return np.take_along_axis(chunks, perm[:, :, None], axis=1)


@functools.partial(jax.jit, static_argnames=("stride", "overlap"))
def _finalize_stream(est, perm, stride: int, overlap: int):
    """(N, S, T_c) chunk outputs + (N, S) source permutations -> (S, T)
    full waveforms: permutation gather, linear cross-fade weights (built
    in-graph — an (N, T_c) host-built weight matrix would be another relay
    upload), and scatter-free overlap-add, all in ONE device dispatch."""
    n, s, t_c = est.shape
    est = jnp.take_along_axis(est, perm[:, :, None], axis=1)
    ramp = (jnp.arange(1, overlap + 1) / (overlap + 1)).astype(jnp.float32)
    w = jnp.ones((n, t_c), jnp.float32)
    if overlap:
        w = w.at[1:, :overlap].set(ramp)
        w = w.at[:-1, t_c - overlap :].set(ramp[::-1])
    frames = jnp.moveaxis(est * w[:, None, :], 1, 0)      # (S, N, T_c)
    if t_c % stride == 0:
        return overlap_add(frames, stride)
    full = jnp.zeros((s, (n - 1) * stride + t_c), est.dtype)
    for i in range(n):
        full = full.at[:, i * stride : i * stride + t_c].add(frames[:, i])
    return full


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
    ext = cfg.dsp.n_fft - cfg.dsp.win_length        # see _chunk_geometry
    if ext:
        ext = -(-ext // hop) * hop

    hyst = float(cfg.stream.perm_hysteresis)

    def scan_separate(g_params, chunks):
        t_c = chunks.shape[-1] - ext                # OLA span of each chunk
        stride = t_c - overlap
        ramp = (jnp.arange(1, overlap + 1) / (overlap + 1)).astype(jnp.float32)

        def body(carry, xs):
            # carry: (prev fade-out tail (S, overlap), prev perm index,
            # running stream loudness) — the perm index gives the chaining
            # its hysteresis: a deterministic separator's output order is
            # stable, so when the overlap is near-silent (no matching
            # evidence) we keep the previous assignment instead of letting
            # noise-level L2 differences flip sources mid-stream
            # (hard-protocol material).
            carry_tail, prev_idx, loud = carry
            chunk, i = xs
            wavs = separate(g_params, chunk[None])[0][:, :t_c]  # (S, T_c)
            # Match source order to the carried tail (L2 over the overlap).
            head = wavs[:, :overlap]
            errs = jnp.stack(
                [jnp.sum((head[jnp.asarray(p)] - carry_tail) ** 2)
                 for p in perms]
            )
            best = jnp.argmin(errs)
            # Margin scale = the STREAM's loudness (running max of per-chunk
            # power), NOT the current chunk's or the strip's: a WHOLLY
            # silent chunk inside a pause would zero a current-chunk margin
            # and let noise flip sources mid-gap (caught end-to-end by
            # tests/test_infer.py::test_streaming_silent_gap_end_to_end;
            # the batched path's whole-stream scale never had the hole).
            loud = jnp.maximum(loud, jnp.mean(chunk ** 2))
            margin = hyst * loud * (s * overlap)
            sel = jnp.where(errs[best] < errs[prev_idx] - margin,
                            best, prev_idx)
            wavs = wavs[jnp.asarray(perms)[sel]]
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
            return (wavs[:, stride:], sel, loud), out_seg

        init = (jnp.zeros((s, overlap), jnp.float32),
                jnp.zeros((), jnp.int32),            # identity perm index
                jnp.zeros((), jnp.float32))          # running loudness
        idx = jnp.arange(chunks.shape[0])
        (final_tail, _, _), segs = jax.lax.scan(body, init, (chunks, idx))
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
    chunk, stride, overlap, n_chunks, padded, ext = _chunk_geometry(cfg, t_in)
    idx = (np.arange(n_chunks)[:, None] * stride
           + np.arange(chunk + ext)[None, :])
    wav = np.pad(mixture, (0, padded - t_in))
    chunks = jnp.asarray(wav[idx])
    fn = streaming_scan_fn_for(cfg)
    segs, tail = fn(g_params, chunks)                # (N,S,stride), (S,overlap)
    full = np.moveaxis(np.asarray(segs), 1, 0).reshape(cfg.data.num_sources, -1)
    full = np.concatenate([full, np.asarray(tail)], axis=-1)
    return full[..., :t_in]


@functools.lru_cache(maxsize=8)
def _batched_separate_fn_for(cfg, mesh):
    """Memoized mesh-sharded separate graph, keyed by (cfg, mesh) — both
    hashable.  shard_map (not GSPMD): the Pallas kernels inside the fused
    separate graph are opaque to the auto-partitioner."""
    from jax.sharding import PartitionSpec as P

    g = models.build_generator(cfg)
    return jax.jit(
        jax.shard_map(
            build_separate_fn(cfg, g), mesh=mesh,
            in_specs=(P(), P(mesh.axis_names)),
            out_specs=P(mesh.axis_names),
            check_vma=False,
        )
    )


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
    chunk, stride, overlap, n_chunks, padded, ext = _chunk_geometry(cfg, t_in)
    mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
    if separate_fn is None:
        separate_fn = _batched_separate_fn_for(cfg, mesh)

    wav = np.pad(mixture, (0, padded - t_in))
    # (N, chunk+ext) overlapped chunk matrix — shift-reshape framing trick;
    # outputs are cropped back to `chunk` below (win_length extension).
    idx = (np.arange(n_chunks)[:, None] * stride
           + np.arange(chunk + ext)[None, :])
    chunks = wav[idx]

    # Host<->device traffic is the bottleneck through this environment's
    # relay (~hundreds of ms per transfer; VERDICT r1 item 4) — the whole
    # pipeline makes exactly THREE crossings:
    #   1. ONE upload of all chunks; groups are sliced on device,
    #   2. one small fetch of the overlap strips for permutation chaining,
    #   3. one fetch of the final overlap-added (S, T) waveforms
    # (alignment gather, cross-fade, and OLA all run on device).
    bc = cfg.stream.batch_chunks
    n_groups = -(-n_chunks // bc)
    chunks_pad = np.pad(chunks, ((0, n_groups * bc - n_chunks), (0, 0)))
    # (n_groups, bc, T_c) with the bc axis sharded over the mesh, so each
    # on-device group slice chunks_dev[gi] is already laid out the way the
    # shard_map'd separate graph wants it (no per-group reshard).
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard3 = NamedSharding(mesh, P(None, mesh.axis_names))
    # device_put straight from the numpy array: ONE host->device transfer
    # (jnp.asarray first would upload unsharded and then reshard).
    chunks_dev = jax.device_put(
        chunks_pad.reshape(n_groups, bc, -1).astype(np.float32), shard3
    )
    outs = [separate_fn(g_params, chunks_dev[gi])[..., :chunk]
            for gi in range(n_groups)]
    est = jnp.concatenate(outs, axis=0)[:n_chunks]        # (N, S, chunk) dev

    strips = np.asarray(jnp.concatenate(
        [est[:, :, :overlap], est[:, :, stride : stride + overlap]], axis=-1
    ))                                                    # (N, S, 2*overlap)
    # Margin scale = the INPUT stream's loudness (host-resident already;
    # the separated strips can be near-silent exactly when matching
    # evidence vanishes, which is when the margin must hold firm).
    perm = _chain_permutations(strips[..., :overlap], strips[..., overlap:],
                               cfg.stream.perm_hysteresis,
                               scale=float(np.mean(chunks ** 2)))
    full = _finalize_stream(est, jnp.asarray(perm), stride, overlap)
    return np.asarray(full)[..., :t_in]
