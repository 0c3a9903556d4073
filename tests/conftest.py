"""Test harness setup (SURVEY.md §4.2.5).

Forces JAX onto a virtual 8-device CPU backend BEFORE jax initializes, so the
same sharded-jit code path that targets a v5e-8 ICI mesh runs in CI without
TPU hardware.  Also pins float32 matmuls so fidelity tests are not perturbed
by bf16 MXU passthrough defaults.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU tunnel
# ("axon"), but unit tests must run the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep TF (oracle) quiet and off any accelerator.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

import jax  # noqa: E402

# The interpreter-startup sitecustomize imports jax with JAX_PLATFORMS=axon
# already in config, so the env var alone is too late — update the config
# directly (backends initialize lazily, so this takes effect).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _slow_test_ids():
    """tests/slow_tests.txt — measured-duration slow tier (VERDICT r3
    item 8: the full suite runs ~40 min on the CPU mesh; the default inner
    loop should be `pytest -m "not slow"` at ~5 min).  Regenerate the list
    from `pytest --durations=0` when the suite's shape changes."""
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(path) as f:
            return {
                line.strip() for line in f
                if line.strip() and not line.startswith("#")
            }
    except FileNotFoundError:
        return set()


def pytest_collection_modifyitems(config, items):
    slow = _slow_test_ids()
    for item in items:
        if item.nodeid in slow:
            item.add_marker(pytest.mark.slow)
