"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must set env vars before the first jax import (parity with the reference's
single-init-point rule, ``common/jax_init.py``).
"""

import os

# GC_TESTS_TPU=1 runs the suite on the real device (for the TPU-gated kernel
# tests in test_tpu_kernels.py); default is CPU with 8 virtual devices.
_ON_TPU = os.environ.get("GC_TESTS_TPU") == "1"
if not _ON_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # No persistent compile cache under the suite: cache WRITES
    # (compilation_cache.put_executable_and_time, XLA:CPU executable
    # serialization) segfault/abort nondeterministically late in a
    # long-lived many-program process (reproduced 3x at the same stack with
    # both shared and isolated cache dirs; the same test passes standalone).
    # Suite compiles are small; correctness of the gate beats warm starts.
    os.environ.setdefault("GC_COMPILE_CACHE", "off")

import jax  # noqa: E402

# This environment pre-seeds jax_platforms with a TPU plugin ("axon,cpu"),
# which overrides the JAX_PLATFORMS env var — force CPU explicitly before any
# backend is initialized.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process compiled-program accumulation.

    XLA:CPU compilation segfaults nondeterministically LATE in a long-lived
    many-program process (observed at test ~120 of the full suite inside
    ``backend_compile_and_load``; the same tests pass standalone — same
    failure family as the cache-write crash above and the hermetic
    segmented-replay test). Dropping the pjit/executable caches at module
    boundaries keeps the backend's live-program population small. Costs a
    few repeated helper compiles per module; suite-level correctness of the
    gate beats the warm start.
    """
    yield
    jax.clear_caches()
