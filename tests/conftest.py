"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding paths (parallel/) are exercised on CPU with
``--xla_force_host_platform_device_count=8`` per SURVEY §4(c); real-TPU
benchmark runs use bench.py instead.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize module imports jax before conftest runs, so plain env-var
# overrides are too late for jax's config.  Backends initialize lazily,
# though, so jax.config.update still wins as long as no computation has run.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}")
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
