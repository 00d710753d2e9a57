"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on a host-platform device mesh
(SURVEY.md §4: JAX's CPU multi-device simulation is the 'multi-node without a
cluster' mechanism); real-TPU benchmarks run through bench.py instead.

Note: this environment preloads a TPU plugin via sitecustomize and ignores
the JAX_PLATFORMS env var, so the platform is forced through jax.config
(backends initialize lazily, making this effective if done before first use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test — deselect with -m 'not slow' for the "
        "smoke subset (full suite stays the CI gate)",
    )
