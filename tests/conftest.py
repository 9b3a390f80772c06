"""Test harness setup.

Forces JAX onto a virtual 8-device CPU mesh BEFORE jax is imported anywhere,
so sharding/pjit tests exercise real multi-device partitioning without TPU
hardware (the driver separately dry-runs the multi-chip path via
__graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

# The axon TPU plugin registers itself even when JAX_PLATFORMS=cpu is set in
# the environment, so force the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def eight_cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
