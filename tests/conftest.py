"""Test configuration: force CPU with an 8-device virtual mesh.

Tests run on CPU for speed and determinism; multi-chip sharding tests use
the virtual device mesh. The env vars must be set before jax initializes.

Set ``POLYBLUR_HW_TESTS=1`` to keep the real backend instead — that
enables tests/test_hardware.py (TPU numerics/dispatch checks) and skips
the virtual-mesh sharding tests.
"""

import os

_HW = os.environ.get("POLYBLUR_HW_TESTS", "") == "1"

if not _HW:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax (registering the TPU backend)
# before conftest runs, so the env var alone is captured too early — update
# the live config as well.
import jax

if not _HW:
    jax.config.update("jax_platforms", "cpu")
else:
    # Hardware runs: persist compiled executables across runs. Mega-kernel
    # variants take 10-20 min each through the remote-compile relay; with
    # the cache a re-run of the full hardware suite is minutes, not an
    # hour+ of recompiles.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="session")
def ref():
    """Golden outputs generated from the reference torch implementation
    (tests/make_fixtures.py)."""
    return np.load(os.path.join(DATA, "reference_fixtures.npz"))


@pytest.fixture(scope="session")
def peacock():
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(DATA, "peacock_defocus.png")))
    return (img / 255.0).astype(np.float32)


def psnr(a, b, peak=1.0):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10.0 * np.log10(peak * peak / max(mse, 1e-12))
