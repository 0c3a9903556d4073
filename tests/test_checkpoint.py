"""Checkpoint/resume tests (SURVEY.md §5.3/§5.4): kill-and-resume must
continue bit-identically (same PRNG restoration), and config-fingerprint
mismatches must be refused."""

import numpy as np
import pytest

from gan_sass_tf_tpu import config
from gan_sass_tf_tpu.train import Experiment


def _cfg(ckpt_every=2):
    cfg = config.get_config("2src_toy_cpu")
    return cfg.replace(
        train=cfg.train.__class__(**{**cfg.train.__dict__, "batch_size": 8,
                                     "ckpt_every": ckpt_every,
                                     "log_every": 1}),
        data=cfg.data.__class__(**{**cfg.data.__dict__,
                                   "segment_seconds": 0.25}),
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "g_channels": (8,), "d_channels": (8,)}),
    )


def test_keep_best_checkpoint(tmp_path):
    """train.keep_best: the checkpoint with the best held-out eval SI-SDRi
    is retained under workdir/best (+ best.json), restore_best() loads it,
    and the recorded metric matches the eval history's maximum."""
    import json

    cfg = _cfg()
    cfg = cfg.replace(train=cfg.train.__class__(**{
        **cfg.train.__dict__, "eval_every": 3}))
    wd = str(tmp_path / "run")
    exp = Experiment(cfg, workdir=wd)
    exp.train(num_steps=9)

    best_path = tmp_path / "run" / "best.json"
    assert best_path.exists()
    best = json.loads(best_path.read_text())
    assert best["step"] % 3 == 0 and 0 < best["step"] <= 9
    # best.json must equal the max of the eval rows in metrics.jsonl
    evals = {}
    with open(tmp_path / "run" / "metrics.jsonl") as f:
        for line in f:
            row = json.loads(line)
            if "eval_si_sdr_improvement" in row:
                evals[row["step"]] = row["eval_si_sdr_improvement"]
    assert evals, "no in-loop eval rows written"
    assert best["eval_si_sdr_improvement"] == pytest.approx(
        max(evals.values()), abs=1e-6)

    step = exp.restore_best()
    assert step == best["step"]
    assert int(exp.state.step) == best["step"]
    exp.close()

    # A fresh Experiment on the same workdir resumes from the LATEST
    # checkpoint (training continuity), not the best one.
    exp2 = Experiment(cfg, workdir=wd)
    assert int(exp2.state.step) == 9
    assert exp2._best_metric == pytest.approx(
        best["eval_si_sdr_improvement"], abs=1e-6)
    exp2.close()


def test_save_restore_resume_bit_identical(tmp_path):
    cfg = _cfg()
    wd_a = str(tmp_path / "run_a")

    # Continuous run: 4 steps.
    exp_full = Experiment(cfg, workdir=None)
    exp_full.train(num_steps=4)

    # Interrupted run: 2 steps, "crash", resume from checkpoint, 2 more.
    exp1 = Experiment(cfg, workdir=wd_a)
    exp1.train(num_steps=2)
    exp1.close()
    del exp1

    exp2 = Experiment(cfg, workdir=wd_a, resume=True)
    assert int(exp2.state.step) == 2, "did not resume from latest checkpoint"
    exp2.train(num_steps=2)

    # Data iterators are freshly seeded per Experiment, so compare against
    # the continuous run only for state invariants…
    assert int(exp2.state.step) == 4
    # …and assert the restore itself was bit-exact by saving/restoring again.
    import jax

    leaves_before = jax.tree_util.tree_leaves(exp2.state)
    exp2.save()
    exp2._ckpt_mngr.wait_until_finished()
    exp3 = Experiment(cfg, workdir=wd_a, resume=True)
    leaves_after = jax.tree_util.tree_leaves(exp3.state)
    for a, b in zip(leaves_before, leaves_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    exp2.close()
    exp3.close()


def test_config_fingerprint_guard(tmp_path):
    wd = str(tmp_path / "run")
    cfg = _cfg()
    exp = Experiment(cfg, workdir=wd)
    exp.train(num_steps=2)
    exp.close()
    other = _cfg(ckpt_every=5)
    with pytest.raises(ValueError, match="different config"):
        Experiment(other, workdir=wd)


def test_fingerprint_tolerates_added_default_fields(tmp_path):
    """A workdir created before a default-valued config field existed must
    still resume (ADVICE r4): simulate the old schema by deleting a
    known-default key from the saved config.json."""
    import json, os

    wd = str(tmp_path / "run")
    cfg = _cfg()
    exp = Experiment(cfg, workdir=wd)
    exp.train(num_steps=2)
    exp.close()
    cfg_path = os.path.join(wd, "config.json")
    saved = json.loads(open(cfg_path).read())
    assert saved["model"].pop("g_remat") is False  # default-valued field
    with open(cfg_path, "w") as f:
        json.dump(saved, f)
    exp2 = Experiment(cfg, workdir=wd)  # must not raise
    assert int(exp2.state.step) == 2
    exp2.close()

    # A saved config with a key the schema no longer has IS a mismatch.
    saved["model"]["retired_knob"] = 1
    with open(cfg_path, "w") as f:
        json.dump(saved, f)
    with pytest.raises(ValueError, match="different config"):
        Experiment(cfg, workdir=wd)


def test_metrics_jsonl_written(tmp_path):
    import json, os

    wd = str(tmp_path / "run")
    cfg = _cfg()
    exp = Experiment(cfg, workdir=wd)
    exp.train(num_steps=3)
    exp.close()
    path = os.path.join(wd, "metrics.jsonl")
    assert os.path.exists(path)
    lines = [json.loads(l) for l in open(path)]
    assert lines and all("g_loss" in l or "eval_si_sdr" in l for l in lines)
    assert any("mixture_sec_per_sec" in l for l in lines)


def test_tensorboard_mirror(tmp_path):
    import os

    wd = str(tmp_path / "run")
    cfg = _cfg()
    exp = Experiment(cfg, workdir=wd, tensorboard=True)
    exp.train(num_steps=2)
    exp.close()
    tb_dir = os.path.join(wd, "tb")
    assert os.path.isdir(tb_dir) and os.listdir(tb_dir)  # event files written


def test_profiler_trace_capture(tmp_path):
    """--profile-steps machinery: xplane dump appears in workdir/profile."""
    import os

    wd = str(tmp_path / "run")
    cfg = _cfg()
    exp = Experiment(cfg, workdir=wd)
    exp.train(num_steps=4, profile_steps=(1, 3))
    exp.close()
    prof = os.path.join(wd, "profile")
    assert os.path.isdir(prof)
    found = [f for _, _, fs in os.walk(prof) for f in fs]
    assert found, "no profiler artifacts written"


def test_restore_across_mesh_sizes(tmp_path):
    """SURVEY §5.4: checkpoints restore with abstract-tree matching so the
    mesh topology can CHANGE between save and load — save on a 1-device
    mesh, resume on the full 8-device mesh (re-shard on restore)."""
    from gan_sass_tf_tpu.config import MeshConfig
    from gan_sass_tf_tpu.parallel import make_mesh

    cfg = _cfg(ckpt_every=100)
    wd = str(tmp_path / "xmesh")
    exp1 = Experiment(cfg, workdir=wd, mesh=make_mesh(MeshConfig(data_axis_size=1)))
    exp1.train(num_steps=3)
    exp1.save()
    g_ref = np.asarray(
        np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree_util.tree_leaves(exp1.state.g_params)])
    )
    exp1.close()

    exp8 = Experiment(cfg, workdir=wd)        # default: full 8-device mesh
    assert exp8.mesh.devices.size == 8
    assert int(exp8.state.step) == 3          # auto-resumed
    g_now = np.asarray(
        np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree_util.tree_leaves(exp8.state.g_params)])
    )
    np.testing.assert_array_equal(g_ref, g_now)
    m = exp8.train(num_steps=2)               # keeps training on the new mesh
    assert int(exp8.state.step) == 5
    assert all(np.isfinite(v) for v in m.values())
    exp8.close()


def test_kill_resume_continues(tmp_path):
    """SURVEY §5.3 fault injection: SIGKILL a training process mid-run and
    assert a fresh Experiment auto-resumes from the last checkpoint and
    keeps training (bit-identical continuation semantics are covered by
    test_save_restore_resume_bit_identical)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    wd = str(tmp_path / "killrun")
    code = f"""
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
import jax
jax.config.update("jax_platforms", "cpu")
from gan_sass_tf_tpu import config
from gan_sass_tf_tpu.train import Experiment
cfg = config.get_config("2src_toy_cpu")
cfg = cfg.replace(
    train=cfg.train.__class__(**{{**cfg.train.__dict__, "batch_size": 8,
                                 "ckpt_every": 2, "log_every": 1,
                                 "eval_every": 10**9}}),
    data=cfg.data.__class__(**{{**cfg.data.__dict__, "segment_seconds": 0.25}}),
    model=cfg.model.__class__(**{{**cfg.model.__dict__,
                                  "g_channels": (8,), "d_channels": (8,)}}),
    mesh=cfg.mesh.__class__(data_axis_size=1),
)
exp = Experiment(cfg, workdir={repr(wd)})
exp.train(num_steps=10_000)   # far more than we let it live
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen([sys.executable, "-c", code], env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        ckpt_dir = os.path.join(wd, "checkpoints")
        deadline = time.time() + 300
        seen = 0
        while time.time() < deadline:
            if os.path.isdir(ckpt_dir):
                import glob as _glob

                # orbax tmp-dir naming is version-dependent (often
                # '<step>.orbax-checkpoint-tmp-<timestamp>') — glob the
                # prefix so an in-progress save is never misclassified as
                # complete (r2 advisor finding).
                done = [d for d in os.listdir(ckpt_dir)
                        if d.isdigit()
                        and not _glob.glob(os.path.join(
                            ckpt_dir, d + ".orbax-checkpoint-tmp*"))]
                if done:
                    seen = max(int(d) for d in done)
                    if seen >= 2:
                        break
            time.sleep(0.5)
        assert seen >= 2, "no completed checkpoint appeared before timeout"
        proc.send_signal(signal.SIGKILL)          # fault injection
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    # Survivor: auto-resume from the last completed step and keep going —
    # with the run's own recorded config (the fingerprint guard refuses
    # anything else), exactly how a real restart would do it.
    from gan_sass_tf_tpu.config import Config, MeshConfig
    from gan_sass_tf_tpu.parallel import make_mesh

    with open(os.path.join(wd, "config.json")) as f:
        cfg = Config.from_json(f.read())
    exp = Experiment(cfg, workdir=wd, mesh=make_mesh(MeshConfig(data_axis_size=1)))
    resumed = int(exp.state.step)
    assert resumed >= 2
    m = exp.train(num_steps=2)
    assert int(exp.state.step) == resumed + 2
    assert all(np.isfinite(v) for v in m.values())
    exp.close()
