"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths compile
and execute without TPU hardware (mirrors the reference's QUERY_MODE=HOST CPU
fallback strategy, SURVEY.md §4).
"""

import os

# Force CPU even when the environment points JAX at real TPU hardware.
# The environment's TPU plugin calls jax.config.update("jax_platforms", ...)
# at interpreter start, so the env var alone is not enough — re-update the
# config here, before any backend is initialized. Unit tests must be hermetic
# and fast; bench.py is the only entry point that targets the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def tmp_root(tmp_path):
    """A scratch ares root directory (diskstore + metastore layout)."""
    return str(tmp_path)


if os.environ.get("ARES_MESH") == "1":
    # The mesh variant compiles every (plan, shape) over an 8-device
    # virtual CPU mesh; by ~600 tests the accumulated native executables
    # crash the XLA CPU client (SIGSEGV/SIGABRT in its thread pool, no
    # Python frames — first seen round 4 when the suite grew past ~830
    # tests). Dropping the in-process executable caches periodically keeps
    # the client healthy; recompiles are cheap on CPU.
    _mesh_test_count = {"n": 0}

    @pytest.fixture(autouse=True)
    def _mesh_cache_relief():
        yield
        _mesh_test_count["n"] += 1
        if _mesh_test_count["n"] % 40 == 0:
            jax.clear_caches()
