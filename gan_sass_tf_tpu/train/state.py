"""Train state + optimizer construction (reference Experiment's two-optimizer
G/D setup, SURVEY.md §2.1 "Training driver"; optax replaces the reference's
native apply-gradients kernels, SURVEY.md §2.2)."""

from __future__ import annotations

from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    """Everything that evolves during training — one pytree, replicated over
    the mesh, checkpointed as a unit (SURVEY.md §5.4)."""

    step: jax.Array              # int32 scalar
    g_params: Any
    d_params: Any
    d_batch_stats: Any           # {} when the D norm is stateless
    g_opt_state: Any
    d_opt_state: Any
    g_ema_params: Any = None     # EMA shadow of g_params (train.g_ema > 0);
    #                              None when disabled — a leafless pytree
    #                              node, so checkpoints/sharding ignore it


def _lr_schedule(cfg, base_lr: float, kind: str):
    """Per-optimizer learning-rate schedule (TrainConfig.{g,d}_lr_schedule).
    The decayed schedules run over train.lr_decay_steps down to
    base_lr * train.lr_end_factor and hold there (optax counts the
    optimizer's own update steps, so G and D each follow their own clock)."""
    if kind == "constant":
        return base_lr
    end = base_lr * cfg.train.lr_end_factor
    n = cfg.train.lr_decay_steps
    if kind == "cosine":
        return optax.cosine_decay_schedule(
            base_lr, n, alpha=cfg.train.lr_end_factor
        )
    if kind == "linear":
        return optax.linear_schedule(base_lr, end, n)
    raise ValueError(f"unknown lr schedule {kind!r}")


def make_optimizers(cfg) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    def tx(lr, kind):
        return optax.chain(
            optax.clip_by_global_norm(cfg.train.grad_clip),
            optax.adam(_lr_schedule(cfg, lr, kind),
                       b1=cfg.train.beta1, b2=cfg.train.beta2),
        )

    return (tx(cfg.train.g_lr, cfg.train.g_lr_schedule),
            tx(cfg.train.d_lr, cfg.train.d_lr_schedule))


def create_train_state(cfg, g, d, rng: jax.Array) -> TrainState:
    """Initialize G/D params + optimizer states from abstract batch shapes
    (no data needed — jax.eval_shape-style init, SURVEY.md §3.4)."""
    b = cfg.train.batch_size
    t, f_feat = cfg.num_frames, cfg.dsp.feature_dim
    k = cfg.dsp.n_bins
    s = cfg.data.num_sources
    rng_g, rng_d = jax.random.split(rng)
    feats = jnp.zeros((b, t, f_feat), jnp.float32)
    g_vars = g.init(rng_g, feats, train=False)
    fold = getattr(cfg.model, "d_input_fold", 1)
    d_in = jnp.zeros((b * s, t // fold, k, 2 * fold), jnp.float32)
    d_vars = d.init(rng_d, d_in, train=False)
    g_tx, d_tx = make_optimizers(cfg)
    g_params = g_vars["params"]
    d_params = d_vars["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        d_batch_stats=d_vars.get("batch_stats", {}),
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        # EMA starts AT the init point (not zeros): unbiased from step 0.
        g_ema_params=(jax.tree_util.tree_map(jnp.copy, g_params)
                      if cfg.train.g_ema > 0.0 else None),
    )
