"""Test harness: force JAX onto a virtual 8-device CPU platform.

The box has one real TPU chip (platform 'axon'); multi-device (ICI-sharded)
paths are validated on the standard JAX fake backend:
``--xla_force_host_platform_device_count=8`` + platform cpu.  The axon
sitecustomize pins jax_platforms to 'axon,cpu', so the env var alone is not
enough — we must also call ``jax.config.update`` after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected 8 virtual cpu devices, got {len(devs)}"
    return devs[:8]
