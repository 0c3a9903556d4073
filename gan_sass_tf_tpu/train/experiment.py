"""Experiment driver (reference layer L6, SURVEY.md §2.1 "Training driver"):
owns the mesh, the jitted train/eval steps, the host data iterator, orbax
checkpointing with auto-resume (§5.3/§5.4), and the JSONL metrics sink
(§5.5).

Train-loop shape (SURVEY.md §3.1b): the host only yields raw waveform
batches; ONE device_put per step is the only host→device crossing; the whole
mix→STFT→G→D→losses→update pipeline is a single jitted XLA program.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from gan_sass_tf_tpu import models
from gan_sass_tf_tpu.config import Config
from gan_sass_tf_tpu.data import make_dataset
from gan_sass_tf_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
from gan_sass_tf_tpu.train.state import TrainState, create_train_state
from gan_sass_tf_tpu.train.step import (
    build_eval_step,
    build_separate_fn,
    build_train_step,
)
from gan_sass_tf_tpu.utils import MetricsWriter


class Experiment:
    def __init__(
        self,
        cfg: Config,
        workdir: Optional[str] = None,
        mesh=None,
        resume: bool = True,
        debug_nans: bool = False,
        debug_leaks: bool = False,
        tensorboard: bool = False,
    ):
        if debug_nans:
            # NaN tripwire (SURVEY.md §5.2): recompile-and-locate on the
            # first non-finite value anywhere in the jitted step.
            jax.config.update("jax_debug_nans", True)
        if debug_leaks:
            # Tracer-leak tripwire (SURVEY.md §5.2, jax.checking_leaks):
            # error if a trace-time value escapes a jitted function.
            jax.config.update("jax_check_tracer_leaks", True)
        self.cfg = cfg
        self.workdir = workdir
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        n_shards = self.mesh.devices.size
        if cfg.train.batch_size % n_shards != 0:
            raise ValueError(
                f"global batch_size {cfg.train.batch_size} must be divisible "
                f"by the mesh size {n_shards} (dcn×data)"
            )
        self.generator = models.build_generator(cfg)
        self.discriminator = models.build_discriminator(cfg)

        repl = replicated_sharding(self.mesh)
        bshard = batch_sharding(self.mesh)
        self._batch_sharding = bshard

        # The step runs under jax.shard_map with explicit collectives
        # (pmean of grads / BN stats / metrics inside the step) rather than
        # GSPMD auto-partitioning: the Pallas DSP kernels are opaque to the
        # SPMD partitioner, but per-shard they are embarrassingly parallel
        # along the batch (SURVEY.md §2.4).  check_vma=False because
        # replication of the post-pmean outputs cannot be inferred through
        # the opaque kernels.
        from jax.sharding import PartitionSpec as P

        axes = self.mesh.axis_names
        bspec = P(axes)

        # Device-bank mode: the utterance bank lives in HBM (replicated) and
        # each step samples batches in-graph — no per-step host->device
        # transfer at all (BASELINE.json:5 "no host round-trips").
        self._use_bank = cfg.data.device_bank
        local_batch = cfg.train.batch_size // n_shards
        step_fn = build_train_step(
            cfg, self.generator, self.discriminator, axis_names=axes,
            from_bank=self._use_bank, local_batch=local_batch,
        )
        # Multi-step dispatch (bank mode): scan K optimizer steps inside one
        # jitted call — per-dispatch host/relay overhead amortizes K-fold.
        # Step fns are memoized per scan length so train(N) with
        # N % steps_per_dispatch != 0 can run an exact shorter final
        # dispatch instead of silently overshooting N.
        self._spd = cfg.train.steps_per_dispatch if self._use_bank else 1
        self._base_step = step_fn
        self._data_spec = P() if self._use_bank else bspec
        self._step_fns: Dict[int, object] = {}
        self._train_step = self._train_step_for(self._spd)
        eval_fn = build_eval_step(cfg, self.generator, axis_names=axes)
        self._eval_step = jax.jit(
            jax.shard_map(
                eval_fn, mesh=self.mesh,
                in_specs=(P(), bspec, P()), out_specs=P(),
                check_vma=False,
            )
        )
        self.separate_fn = jax.jit(
            jax.shard_map(
                build_separate_fn(cfg, self.generator), mesh=self.mesh,
                in_specs=(P(), bspec), out_specs=bspec,
                check_vma=False,
            )
        )

        self._repl_sharding = repl
        self._init_fn = jax.jit(
            lambda r: create_train_state(
                cfg, self.generator, self.discriminator, r
            ),
            out_shardings=repl,
        )
        self.reseed(cfg.train.seed)
        self.metrics = MetricsWriter(
            os.path.join(workdir, "metrics.jsonl") if workdir else None,
            tensorboard_dir=(
                os.path.join(workdir, "tb") if workdir and tensorboard else None
            ),
        )
        self._ckpt_mngr = None
        # Best-checkpoint retention (train.keep_best): the held-out eval
        # metric peaks well before training ends on every preset measured
        # (wsj0 easy: +22.3 dB at 10k steps vs +19.8 at 50k — the
        # generalization gap grows with training length), so the latest
        # checkpoint is usually NOT the one to deploy.
        self._best_mngr = None
        self._best_metric = float("-inf")
        if workdir:
            self._init_checkpointing(resume)
            best_path = os.path.join(workdir, "best.json")
            if os.path.exists(best_path):
                import json

                with open(best_path) as f:
                    self._best_metric = json.load(f)[
                        "eval_si_sdr_improvement"]

    def reseed(self, seed: int) -> None:
        """Re-initialize everything seed-dependent — model/opt state, the
        train rng, the data bank/iterators — WITHOUT retracing any jitted
        step (shapes are unchanged, so the compiled fns are reused).  This
        is what makes a multi-seed quality protocol affordable: the music
        preset's step compile is ~60 s and the BiLSTM scan ~200 s, paid
        once per process instead of once per seed.  Overrides
        cfg.train.seed for this run; the config object itself is frozen."""
        cfg, repl = self.cfg, self._repl_sharding
        with jax.default_device(jax.devices()[0]):
            self.state = self._init_fn(jax.random.PRNGKey(seed))
        self._train_rng = jax.device_put(jax.random.PRNGKey(seed + 1), repl)
        self.dataset = None if self._use_bank else make_dataset(
            cfg, seed=seed
        )
        # split="eval" (default) holds out latent pitch bins (synthetic) /
        # speakers (wav_dir) never seen in training — genuine generalization
        # eval, not the train distribution at a different seed.
        self.eval_dataset = make_dataset(
            cfg, seed=seed + 9999, split=cfg.data.eval_split
        )
        self._bank = None
        if self._use_bank:
            from gan_sass_tf_tpu.data.device_bank import build_bank

            self._bank = jax.device_put(build_bank(cfg, seed=seed), repl)
        self._best_metric = float("-inf")

    def _train_step_for(self, length: int):
        """Jitted sharded step running `length` optimizer steps per dispatch
        (lax.scan over the base step; length is trace-static, so each
        distinct remainder compiles once and is memoized)."""
        if length in self._step_fns:
            return self._step_fns[length]
        from jax.sharding import PartitionSpec as P

        base_step = self._base_step
        if length > 1:

            def fn(state, bank, rng):
                def body(s, _):
                    return base_step(s, bank, rng)

                state, ms = jax.lax.scan(body, state, None, length=length)
                return state, {k: v[-1] for k, v in ms.items()}
        else:
            fn = base_step
        jitted = jax.jit(
            jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=(P(), self._data_spec, P()),
                out_specs=(P(), P()),
                check_vma=False,
            ),
            donate_argnums=(0,),
        )
        self._step_fns[length] = jitted
        return jitted

    # ------------------------------------------------------------------
    # Checkpointing (SURVEY.md §5.4): async orbax, auto-resume, config
    # fingerprint guard.
    # ------------------------------------------------------------------

    def _init_checkpointing(self, resume: bool) -> None:
        import orbax.checkpoint as ocp

        ckpt_dir = os.path.abspath(os.path.join(self.workdir, "checkpoints"))
        os.makedirs(ckpt_dir, exist_ok=True)
        cfg_path = os.path.join(self.workdir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                saved = f.read()
            # Compare through from_json so fields ADDED since the workdir
            # was created (absent in the saved JSON, carrying their dataclass
            # default) don't invalidate a semantically compatible run
            # (ADVICE r4).  Fields REMOVED from the schema make from_json
            # raise TypeError — that genuinely is a different config.
            try:
                compatible = (
                    type(self.cfg).from_json(saved).to_json()
                    == self.cfg.to_json())
            except (TypeError, KeyError):
                compatible = False
            if not compatible:
                raise ValueError(
                    f"workdir {self.workdir!r} was created with a different "
                    "config (fingerprint mismatch); refusing to mix runs"
                )
        else:
            with open(cfg_path, "w") as f:
                f.write(self.cfg.to_json())
        self._ckpt_mngr = ocp.CheckpointManager(
            ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=3, enable_async_checkpointing=True
            ),
        )
        if resume and self._ckpt_mngr.latest_step() is not None:
            self.restore()

    def save(self) -> None:
        if self._ckpt_mngr is None:
            return
        import orbax.checkpoint as ocp

        step = int(self.state.step)
        self._ckpt_mngr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(self.state),
                rng=ocp.args.ArraySave(self._train_rng),
            ),
        )

    def _best_manager(self):
        import orbax.checkpoint as ocp

        if self._best_mngr is None:
            best_dir = os.path.abspath(os.path.join(self.workdir, "best"))
            os.makedirs(best_dir, exist_ok=True)
            # Separate manager/directory so auto-resume keeps restoring the
            # LATEST step (training continuity) while deployment reads the
            # best-held-out-metric one.
            self._best_mngr = ocp.CheckpointManager(
                best_dir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, enable_async_checkpointing=True
                ),
            )
        return self._best_mngr

    def _save_best(self, step: int, metric: float) -> None:
        import json

        import orbax.checkpoint as ocp

        self._best_manager().save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(self.state),
                rng=ocp.args.ArraySave(self._train_rng),
            ),
        )
        with open(os.path.join(self.workdir, "best.json"), "w") as f:
            json.dump({"step": step, "eval_si_sdr_improvement": metric}, f)

    def restore_best(self) -> int:
        """Load the best-held-out-eval checkpoint (train.keep_best).
        Returns the step it was written at."""
        import orbax.checkpoint as ocp

        mngr = self._best_manager()
        step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no best checkpoint under {self.workdir!r} "
                "(train.keep_best off, or no eval ran yet)"
            )
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, self.state
        )
        restored = mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                rng=ocp.args.ArrayRestore(self._train_rng),
            ),
        )
        repl = replicated_sharding(self.mesh)
        self.state = jax.device_put(restored["state"], repl)
        self._train_rng = jax.device_put(restored["rng"], repl)
        return step

    def restore(self, step: Optional[int] = None) -> None:
        import orbax.checkpoint as ocp

        step = step if step is not None else self._ckpt_mngr.latest_step()
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, self.state
        )
        restored = self._ckpt_mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                rng=ocp.args.ArrayRestore(self._train_rng),
            ),
        )
        repl = replicated_sharding(self.mesh)
        self.state = jax.device_put(restored["state"], repl)
        self._train_rng = jax.device_put(restored["rng"], repl)

    # ------------------------------------------------------------------
    # Train / eval loops
    # ------------------------------------------------------------------

    def train(
        self,
        num_steps: Optional[int] = None,
        profile_steps: Optional[tuple] = None,
        log_fn=None,
    ) -> Dict[str, float]:
        cfg = self.cfg
        total = num_steps if num_steps is not None else cfg.train.total_steps
        last_metrics: Dict[str, float] = {}
        t_start = time.perf_counter()
        steps_timed = 0
        samples_per_step = cfg.train.batch_size * self.cfg.segment_samples
        profiling = False

        # Host-side prefetch (host-batch mode only): overlap data
        # generation/decoding with device execution.  In device-bank mode
        # there is no per-step host data at all.
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()
        thread = None
        if not self._use_bank:

            def producer():
                while not stop.is_set():
                    batch = self.dataset.batch()
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue

            thread = threading.Thread(target=producer, daemon=True)
            thread.start()

        # Host-side step counter: reading state.step from the device every
        # iteration would force a full sync per step (~25 ms through the
        # TPU relay) and serialize the async dispatch pipeline.
        step_base = int(self.state.step)
        spd = self._spd
        # Exact step count: full spd-length dispatches plus one shorter
        # remainder dispatch (its scan length compiles once, memoized) —
        # train(N) never overshoots N.
        n_full, rem = divmod(total, spd)
        lengths = [spd] * n_full + ([rem] if rem else [])

        def crossed(completed: int, every: int, length: int) -> bool:
            """True when a cadence boundary falls inside this dispatch."""
            return (completed // every) > ((completed - length) // every)

        step_now = step_base
        for i, disp_len in enumerate(lengths):
            if i == 1:
                # Restart the throughput clock after dispatch 0 so the
                # reported mixture-sec/sec excludes XLA compilation.
                t_start = time.perf_counter()
                steps_timed = 0
            if profile_steps and self.workdir:
                if step_now >= profile_steps[0] and not profiling:
                    jax.profiler.start_trace(
                        os.path.join(self.workdir, "profile")
                    )
                    profiling = True
                elif step_now >= profile_steps[1] and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
            data = (
                self._bank if self._use_bank
                else jax.device_put(q.get(), self._batch_sharding)
            )
            self.state, metrics = self._train_step_for(disp_len)(
                self.state, data, self._train_rng
            )
            steps_timed += disp_len
            completed = step_now + disp_len
            if crossed(completed, cfg.train.log_every, disp_len) \
                    or i == len(lengths) - 1:
                last_metrics = {k: float(v) for k, v in metrics.items()}
                elapsed = time.perf_counter() - t_start
                mix_sec = steps_timed * samples_per_step / cfg.dsp.sample_rate
                last_metrics["mixture_sec_per_sec"] = mix_sec / elapsed
                self.metrics.write(completed, last_metrics)
                if log_fn:
                    log_fn(completed, last_metrics)
            if self.workdir and crossed(completed, cfg.train.ckpt_every,
                                        disp_len):
                self.save()
            if crossed(completed, cfg.train.eval_every, disp_len):
                # eval_batches (not evaluate()'s default): this metric
                # drives keep_best selection, so it must average enough
                # eval sampling noise to rank checkpoints (r3 verdict).
                ev = self.evaluate(num_batches=cfg.train.eval_batches)
                self.metrics.write(completed, {"eval_" + k: v for k, v in ev.items()})
                si = ev.get("si_sdr_improvement")
                if (self.workdir and cfg.train.keep_best
                        and si is not None and si > self._best_metric):
                    self._best_metric = si
                    self._save_best(completed, si)
            step_now = completed
        stop.set()
        if thread is not None:
            thread.join(timeout=5)
        if profiling:
            jax.profiler.stop_trace()
        if self.workdir:
            self.save()
            self._ckpt_mngr.wait_until_finished()
            if self._best_mngr is not None:
                self._best_mngr.wait_until_finished()
        return last_metrics

    @property
    def eval_g_params(self):
        """G params for eval/inference: the EMA shadow when train.g_ema > 0
        (averaged weights integrate out G/D oscillation), else the live ones."""
        ema = self.state.g_ema_params
        return ema if ema is not None else self.state.g_params

    def evaluate(self, num_batches: int = 4,
                 dataset=None) -> Dict[str, float]:
        """SI-SDR eval on `dataset` (defaults to the held-out eval split)."""
        dataset = dataset if dataset is not None else self.eval_dataset
        repl = replicated_sharding(self.mesh)
        acc: Dict[str, float] = {}
        for i in range(num_batches):
            sources = dataset.batch()
            sources = jax.device_put(sources, self._batch_sharding)
            rng = jax.device_put(
                jax.random.PRNGKey(10_000 + i), repl
            )
            out = self._eval_step(self.eval_g_params, sources, rng)
            for k, v in out.items():
                acc[k] = acc.get(k, 0.0) + float(v) / num_batches
        return acc

    def close(self) -> None:
        self.metrics.close()
        if self._ckpt_mngr is not None:
            self._ckpt_mngr.wait_until_finished()
            self._ckpt_mngr.close()
        if self._best_mngr is not None:
            self._best_mngr.wait_until_finished()
            self._best_mngr.close()
