"""Test configuration: force CPU backend with 8 virtual devices.

This is the TPU-world equivalent of "test multi-node without a cluster"
(SURVEY.md §4): every mesh/pjit test runs against an 8-device host mesh so
sharding logic is exercised without TPU hardware. Must run before jax import.
"""

import os

# Force CPU even when the ambient environment selects a TPU platform
# (e.g. JAX_PLATFORMS=axon set by a sitecustomize hook that registers a
# TPU plugin and overrides the env var): this suite is the deterministic
# multi-device CPU tier; TPU-hardware tests live in tests_tpu/ and opt in
# explicitly. jax.config.update wins over the plugin's env override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices[:8]
