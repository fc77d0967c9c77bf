"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that mesh/pjit/collective code
paths are exercised without TPU hardware (SURVEY.md §4: distributed tests via
``xla_force_host_platform_device_count``).

The environment variables must be set before JAX initializes, hence this file
mutates ``os.environ`` at import time — conftest.py is imported by pytest
before any test module imports jax.
"""

import os

# Force CPU (the ambient environment pins JAX_PLATFORMS to the TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize registers the TPU-tunnel plugin and pins
# jax_platforms to "axon,cpu" regardless of the env var, so override the
# config directly after import as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    A full-suite run in one process accumulates hundreds of XLA:CPU
    executables; at that watermark the compiler segfaulted reproducibly
    (LLVM JIT state, not repo code — the crashing test passes in isolation
    and in any half-suite subset). Clearing the compilation caches between
    modules keeps the per-process compile population bounded. Costs a few
    re-compiles for fixtures shared across modules; measured suite-time
    impact is small because modules rarely share program shapes.
    """
    yield
    import jax

    jax.clear_caches()
