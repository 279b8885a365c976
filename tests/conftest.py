"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding logic
(jax.sharding.Mesh + shard_map) is exercised without TPU hardware, and so
that unit tests do not contend for the single tunneled TPU chip.  The real
TPU path is covered by bench.py and the driver's compile checks.

NOTE: this environment registers an 'axon' TPU plugin from sitecustomize at
interpreter startup (importing jax), so JAX_PLATFORMS env tweaks are too
late — we must force the platform through jax.config before any backend
initialization.
"""

import os

# Must be set before the first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import hashlib  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _machine_tag() -> str:
    """Key the persistent cache by the host's CPU feature set: XLA:CPU AOT
    artifacts compiled with features the current host lacks SIGILL/segfault
    on load (observed after a VM migration), so a migrated host must get a
    fresh cache directory."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nocpuinfo"


# Persistent compilation cache makes repeated test runs compile-free.
jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/jax_cache_svtpu_cpu_{_machine_tag()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop in-memory compiled executables after every test module.

    A full single-process run reliably segfaulted inside XLA:CPU
    compilation after ~130 tests (compile-state accumulation; every file
    passes in isolation).  Clearing the in-memory caches between modules
    keeps the compiler state bounded; recompiles hit the persistent disk
    cache, so the runtime cost is deserialization only.
    """
    yield
    jax.clear_caches()
