"""Numerical-safety hooks (SURVEY.md §5 "race detection / sanitizers" row).

The reference has no sanitizers; under JAX's functional model data races are
moot, so the TPU-native equivalent is NaN surveillance: `nan_guard` turns on
``jax_debug_nans`` for a scope (compiled functions re-run op-by-op on a NaN
and raise at the producing primitive), and `assert_finite` is a cheap
always-on output check for pipeline results.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp


@contextmanager
def nan_guard():
    """Enable ``jax_debug_nans`` within the scope (re-traces; debug only)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name: str = "outputs") -> None:
    """Host-side check that every float leaf of a pytree is finite."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating) and not bool(
            jnp.all(jnp.isfinite(arr))
        ):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
