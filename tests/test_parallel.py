"""Distributed tests without a real cluster (SURVEY.md §4.2.5): the virtual
8-device CPU mesh runs the same sharded-jit code path as a v5e-8 ICI slice;
sharded step must equal the single-device step numerically."""

import jax
import numpy as np
import pytest

from gan_sass_tf_tpu import config
from gan_sass_tf_tpu.data import make_dataset
from gan_sass_tf_tpu.parallel import batch_sharding, make_mesh
from gan_sass_tf_tpu.train import Experiment


def _cfg(device_bank=False):
    cfg = config.get_config("2src_toy_cpu")
    return cfg.replace(
        train=cfg.train.__class__(**{**cfg.train.__dict__, "batch_size": 8}),
        data=cfg.data.__class__(**{**cfg.data.__dict__,
                                   "segment_seconds": 0.25,
                                   "device_bank": device_bank,
                                   "bank_utterances": 8}),
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "g_channels": (8,), "d_channels": (8,),
                                     "d_norm": "group"}),
    )


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = make_mesh(config.get_config("2src_toy_cpu").mesh)
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.devices.shape == (1, 8)


def test_mesh_too_large_raises():
    from gan_sass_tf_tpu.config import MeshConfig

    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data_axis_size=64))


def test_batch_actually_sharded():
    cfg = _cfg()
    mesh = make_mesh(cfg.mesh)
    ds = make_dataset(cfg, seed=0)
    batch = jax.device_put(ds.batch(), batch_sharding(mesh))
    assert len(batch.sharding.device_set) == 8


def test_sharded_step_matches_single_device():
    """The binding DP-correctness test: identical batch + params → identical
    metrics and params whether run on a 1-device or 8-device mesh.
    Uses group-norm D so there are no batch-size-dependent BN statistics
    (with per-shard BN, stats would legitimately differ — documented)."""
    cfg = _cfg()
    mesh8 = make_mesh(cfg.mesh)
    mesh1 = make_mesh(cfg.mesh.__class__(data_axis_size=1),
                      devices=jax.devices()[:1])
    exp8 = Experiment(cfg, workdir=None, mesh=mesh8)
    exp1 = Experiment(cfg, workdir=None, mesh=mesh1)
    # Same init seed → identical starting params.
    ds = make_dataset(cfg, seed=3)
    batch = ds.batch()
    for _ in range(2):
        b8 = jax.device_put(batch, batch_sharding(mesh8))
        b1 = jax.device_put(batch, batch_sharding(mesh1))
        exp8.state, m8 = exp8._train_step(exp8.state, b8, exp8._train_rng)
        exp1.state, m1 = exp1._train_step(exp1.state, b1, exp1._train_rng)
    for k in m8:
        np.testing.assert_allclose(
            float(m8[k]), float(m1[k]), rtol=2e-4, atol=1e-5,
            err_msg=f"metric {k} diverged between 8-dev and 1-dev mesh",
        )
    g8 = jax.tree_util.tree_leaves(exp8.state.g_params)
    g1 = jax.tree_util.tree_leaves(exp1.state.g_params)
    for a, b in zip(g8, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_batch_not_divisible_raises():
    cfg = _cfg()
    bad = cfg.replace(train=cfg.train.__class__(**{**cfg.train.__dict__,
                                                   "batch_size": 6}))
    with pytest.raises(ValueError):
        Experiment(bad, workdir=None)


def test_bank_mode_matches_across_mesh_sizes():
    """Device-bank in-graph sampling must also be mesh-size-invariant:
    per-global-example keys make the sampled batches identical."""
    cfg = _cfg(device_bank=True)
    mesh8 = make_mesh(cfg.mesh)
    mesh1 = make_mesh(cfg.mesh.__class__(data_axis_size=1),
                      devices=jax.devices()[:1])
    exp8 = Experiment(cfg, workdir=None, mesh=mesh8)
    exp1 = Experiment(cfg, workdir=None, mesh=mesh1)
    for _ in range(2):
        exp8.state, m8 = exp8._train_step(exp8.state, exp8._bank, exp8._train_rng)
        exp1.state, m1 = exp1._train_step(exp1.state, exp1._bank, exp1._train_rng)
    for k in m8:
        np.testing.assert_allclose(
            float(m8[k]), float(m1[k]), rtol=2e-4, atol=1e-5,
            err_msg=f"bank-mode metric {k} diverged across mesh sizes",
        )


def test_initialize_distributed_noop_single_host(monkeypatch):
    from gan_sass_tf_tpu.parallel import initialize_distributed

    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False
    # configured but single process → still a no-op
    assert initialize_distributed("localhost:1234", num_processes=1,
                                  process_id=0) is False
