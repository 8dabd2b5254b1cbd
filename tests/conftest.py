"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests run on CPU with Pallas interpret mode (bit-compatible semantics) and
an 8-device virtual mesh for sharding tests, per the multi-chip test plan in
SURVEY.md §4 ("CPU-jax vs TPU, 1-chip vs N-chip equality").
"""
import os

# CLI entry points invoked inside tests call enable_compilation_cache(),
# which flips jax's persistent cache on PROCESS-WIDE for every later
# compile in the suite; serializing one of the larger executables
# segfaulted jaxlib's cache writer mid-suite (observed r5: crash inside
# compilation_cache.put_executable_and_time at ~80%).  Tests gain nothing
# from a disk cache and should not write to ~/.cache — disable it via the
# documented env knob.
os.environ.setdefault("MIRACULIX_TPU_COMPILE_CACHE", "off")

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test draws from a fresh, identical stream so
    # test selection/order can never change another test's random data
    return np.random.default_rng(42)
