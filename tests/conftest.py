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
