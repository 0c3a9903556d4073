"""Driver-contract regression tests for __graft_entry__ (VERDICT r1 item 1).

The round-1 driver dryrun failed because dryrun_multichip assumed the
virtual mesh already existed.  These tests run the entry points the way the
driver does — a plain subprocess with the session environment (axon/TPU
platform pinned, NO conftest CPU forcing) — so a regression in the
self-provisioning logic fails here before it fails in the driver.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env() -> dict:
    """Reconstruct the driver's environment: undo conftest's CPU forcing so
    the subprocess starts exactly like the session default (sitecustomize
    imports jax with the axon/TPU platform pinned)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def _run(code: str, timeout: int = 480) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=_driver_env(), timeout=timeout,
        capture_output=True, text=True,
    )


def test_dryrun_multichip_self_provisions_virtual_mesh():
    """dryrun_multichip(8) must pass with ONE (or zero) real devices — it
    provisions its own 8-device virtual CPU mesh (MULTICHIP contract)."""
    proc = _run("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-3000:]}"
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_dryrun_multichip_odd_device_count():
    """Device counts that are not the session's 8 must also provision."""
    proc = _run("import __graft_entry__ as g; g.dryrun_multichip(4)")
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-3000:]}"
    assert "dryrun_multichip(4): ok" in proc.stdout


@pytest.mark.slow
def test_entry_then_dryrun_same_process():
    """entry() may initialize the real backend first; dryrun_multichip must
    still re-provision (clear_backends + jax_num_cpu_devices path)."""
    proc = _run(
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "import jax\n"
        "out = jax.jit(fn)(*args)\n"
        "g.dryrun_multichip(8)\n",
        timeout=570,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-3000:]}"
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_bench_json_contract():
    """bench.py must print ONE parseable JSON line with the contract keys
    (the driver runs it after every round) — exercised the way the driver
    does, in a subprocess on the session's default backend, shrunk via the
    env overrides."""
    import json

    env = _driver_env()
    env.update({"BENCH_WARMUP_STEPS": "1", "BENCH_STEPS": "3",
                "BENCH_BATCH": "8"})
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env, timeout=560,
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-3000:]}"
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {lines}"
    row = json.loads(lines[0])
    assert set(row) == {"metric", "value", "unit", "vs_baseline"}
    assert row["value"] > 0 and row["vs_baseline"] > 0
