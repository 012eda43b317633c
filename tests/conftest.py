"""Test config: force an 8-device virtual CPU platform BEFORE jax imports.

Mirrors SURVEY.md §4's recommendation: multi-host code paths (mesh, psum,
all_gather in distributed BA) run in CI on one machine via
``--xla_force_host_platform_device_count``.
"""

import os

# The environment's sitecustomize imports jax at interpreter startup and pins
# JAX_PLATFORMS to the hardware backend, so mutating os.environ here is too
# late for jax's config — but XLA_FLAGS is still read lazily at backend init,
# and jax.config.update can override the platform post-import as long as no
# backend has been initialized yet.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: the suite is dominated by XLA compiles on
# this small CPU host; cache hits make reruns cheap.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
