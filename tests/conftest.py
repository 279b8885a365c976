"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding logic
(jax.sharding.Mesh + shard_map) is exercised without TPU hardware.  The real
single-chip TPU path is covered by bench.py and the driver's compile checks.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# Persistent compilation cache makes repeated test runs compile-free.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_svtpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
