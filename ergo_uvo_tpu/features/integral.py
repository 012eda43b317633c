"""Integral images and static-offset box sums.

The SURF detector's entire dense phase reduces to box-filter responses over an
integral image.  On TPU the key trick is that every box corner offset is a
*compile-time constant* per (octave, layer), so box sums become static slices
of a zero-padded integral image — pure VPU adds, no gathers (SURVEY.md §2.1
row 1: "integral image, box-filter Hessian pyramid").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def integral_image(img: jax.Array) -> jax.Array:
    """Summed-area table with a leading zero row/col.

    ii[y, x] = sum(img[:y, :x]); shape (H+1, W+1).  float32 is accurate enough
    for 640x480 uint8-range images (max sum ~7.8e7 < 2^24 * 4.7 — relative
    error stays < 1e-5 of the box values used by the Hessian).
    """
    ii = jnp.cumsum(jnp.cumsum(img, axis=-2), axis=-1)
    pad = [(0, 0)] * (img.ndim - 2) + [(1, 0), (1, 0)]
    return jnp.pad(ii, pad)


def pad_integral(ii: jax.Array, margin: int) -> jax.Array:
    """Edge-pad an integral image by `margin` on all sides.

    Edge-padding the *integral* clamps out-of-bounds box corners to the image
    border, which is exactly "treat outside pixels as zero" for box sums —
    matching OpenCV's border handling in the SURF Hessian.
    """
    pad = [(0, 0)] * (ii.ndim - 2) + [(margin, margin), (margin, margin)]
    return jnp.pad(ii, pad, mode="edge")


def box_sum(
    ii_padded: jax.Array,
    margin: int,
    h: int,
    w: int,
    y0: int,
    x0: int,
    y1: int,
    x1: int,
) -> jax.Array:
    """Box sum of img[y+y0 : y+y1, x+x0 : x+x1] for every pixel (y, x).

    `ii_padded` is `pad_integral(integral_image(img), margin)`; offsets are
    relative to the pixel and must satisfy |offset| <= margin.  Returns (h, w).
    Four static slices — XLA fuses the adds into one elementwise kernel.
    """

    def corner(dy, dx):
        return jax.lax.slice(
            ii_padded,
            [margin + dy, margin + dx],
            [margin + dy + h, margin + dx + w],
        )

    return corner(y1, x1) - corner(y0, x1) - corner(y1, x0) + corner(y0, x0)
