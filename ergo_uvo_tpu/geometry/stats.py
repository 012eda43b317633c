"""Masked statistics — fixed-shape replacements for the reference's vector math.

The reference computes medians and mean/variance over dynamically-sized
``std::vector``s (``compute_median`` math_utility.cpp:65-86,
``compute_mean_and_variance`` :35-58).  On TPU all arrays are fixed-shape with
validity masks, so every statistic here takes a boolean mask and ignores
invalid lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_median(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Median over the valid lanes of the last axis.

    Matches the reference semantics (math_utility.cpp:65-86): sort, take the
    middle element (odd count) or the average of the two middle elements (even
    count).  Invalid lanes are sorted to +inf and never selected.  If no lane
    is valid, returns 0.
    """
    big = jnp.asarray(jnp.finfo(values.dtype).max, values.dtype)
    filled = jnp.where(mask, values, big)
    sorted_vals = jnp.sort(filled, axis=-1)
    n = jnp.sum(mask, axis=-1).astype(jnp.int32)
    lo_idx = jnp.maximum((n - 1) // 2, 0)
    hi_idx = jnp.maximum(n // 2, 0)
    lo = jnp.take_along_axis(sorted_vals, lo_idx[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(sorted_vals, hi_idx[..., None], axis=-1)[..., 0]
    med = 0.5 * (lo + hi)
    return jnp.where(n > 0, med, jnp.zeros_like(med))


def masked_mean(values: jax.Array, mask: jax.Array, axis=-1) -> jax.Array:
    n = jnp.sum(mask, axis=axis)
    s = jnp.sum(jnp.where(mask, values, 0.0), axis=axis)
    return s / jnp.maximum(n, 1)


def masked_mean_and_variance(values: jax.Array, mask: jax.Array):
    """(mean, variance) over valid lanes of the last axis.

    Population variance (divide by n), as the reference does
    (math_utility.cpp:35-58).
    """
    n = jnp.sum(mask, axis=-1)
    mean = masked_mean(values, mask)
    sq = jnp.where(mask, (values - mean[..., None]) ** 2, 0.0)
    var = jnp.sum(sq, axis=-1) / jnp.maximum(n, 1)
    return mean, var
