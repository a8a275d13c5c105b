"""Test harness: force an 8-device virtual CPU mesh.

All correctness tests run on CPU (SURVEY §4): kernels against the numpy
oracle, golden statistics, gradients, and multi-chip sharding on a simulated
8-device mesh — no TPU needed for CI.
"""

import os

# Force CPU even if the session env points at a TPU (set SRT_TEST_TPU=1 to
# run the suite against real hardware). jax may already be imported by a
# sitecustomize hook, so set both the env var and the live config.
if not os.environ.get("SRT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def data_dir():
    from sexy_raytracer_tpu.models.presets import default_data_dir

    d = default_data_dir()
    if not os.path.isdir(d):
        pytest.skip("reference data assets not available")
    return d


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(1234)
