"""Test harness configuration.

Forces the CPU backend with 8 virtual XLA devices, so multi-chip sharding
paths run and are validated without TPU hardware.  Note: this environment's
TPU plugin registers itself in sitecustomize and overrides the JAX_PLATFORMS
env var, so the env var alone is NOT enough — jax.config.update after import
is the authoritative override.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

DATA = "/root/reference/data"


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.devices()[0].platform == "cpu"
    assert jax.device_count() == 8


@pytest.fixture(scope="session")
def data_dir() -> str:
    return DATA


@pytest.fixture(scope="session")
def subset1_db() -> str:
    return f"{DATA}/xdb_subset1.db"


@pytest.fixture(scope="session")
def subset2_db() -> str:
    return f"{DATA}/xdb_subset2.db"


@pytest.fixture(scope="session")
def combo12_db() -> str:
    return f"{DATA}/xdb_subset_combo12.db"
