"""Test config: force an 8-device virtual CPU platform BEFORE jax imports.

Mirrors SURVEY.md §4's recommendation: multi-host code paths (mesh, psum,
all_gather in distributed BA) run in CI on one machine via
``--xla_force_host_platform_device_count``.
"""

import os

# Force-set (not setdefault): the environment pins JAX_PLATFORMS=axon via
# sitecustomize, which runs before pytest; overriding here (pre-jax-import)
# wins.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
