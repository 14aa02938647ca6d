"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths compile
and execute without TPU hardware (mirrors the reference's QUERY_MODE=HOST CPU
fallback strategy, SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture
def tmp_root(tmp_path):
    """A scratch ares root directory (diskstore + metastore layout)."""
    return str(tmp_path)
