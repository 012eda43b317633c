"""Gather-free patch sampling: bilinear interpolation as MXU matmuls.

TPU gathers serialize, and per-sample ``jnp.take`` sampling is the dominant
cost of the ORB/SIFT description stages (r4 TPU profiling: ORB 7.6 fps /
SIFT 7.5 fps vs SURF's 72 — the SURF path already samples its descriptor
through separable interpolation matmuls, features/descriptor.py).  The
bilinear hat identity

    bilinear(img, y, x) = sum_r relu(1-|y-r|) . sum_c relu(1-|x-c|) . img[r,c]

turns K-patch extraction into two dense matmuls and in-patch resampling into
one small batched einsum — everything rides the MXU:

  * :func:`extract_patches` — (K,) subpixel centers + per-keypoint spacing
    -> (K, P, P) axis-aligned patches: `(K*P, H) @ (H, W)` then a K-batched
    `(P, W) @ (W, P)`.
  * :func:`sample_patch` — arbitrary float positions INSIDE those patches
    (e.g. a rotated descriptor grid) as one `ksa,kab,ksb->ks` einsum over
    the small P x P patch.

Rotation therefore costs one extra small interpolation instead of K*S image
gathers; positions outside the image contribute ZERO (hat weights vanish),
whereas a gather-based sampler clamps to the border — so every detector must
gate keypoints by its descriptor's FULL patch support, not just its own
detection window: ORB gates at ``_BRIEF_MARGIN`` = 23 level-pixels (the 45-
wide steered-BRIEF grid, ADVICE r4); SIFT's border of 8 covers its 26-wide
descriptor patch only up to spacing ~0.6, so large-scale keypoints near
octave borders sample a zero-padded (rather than clamped) tail — a
statistical-parity deviation confined to the outer band, documented here
because it is NOT gated away.  Replaces the reference's per-keypoint OpenCV
sampling loops
(descriptor extraction inside ``detectAndCompute``, VO_utility.cpp:91-126).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hat_matrix(pos: jax.Array, n: int) -> jax.Array:
    """(..., S) float positions -> (..., S, n) bilinear hat weights.

    Row s holds relu(1 - |pos_s - i|) over grid i = 0..n-1: exactly the
    two nonzero bilinear interpolation weights (or all-zero out of range).
    """
    grid = jnp.arange(n, dtype=pos.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - grid))


def extract_patches(
    img: jax.Array,  # (H, W)
    cx: jax.Array,  # (K,) subpixel centers, x
    cy: jax.Array,  # (K,)
    spacing: jax.Array,  # (K,) patch-grid step in image pixels
    P: int,
) -> jax.Array:
    """(K, P, P) patches; patch[k, a, b] = bilinear sample of `img` at
    (cy[k] + (a - (P-1)/2) * spacing[k], cx[k] + (b - (P-1)/2) * spacing[k]).
    """
    h, w = img.shape
    off = jnp.arange(P, dtype=img.dtype) - (P - 1) / 2.0
    ys = cy[:, None] + off[None] * spacing[:, None]  # (K, P)
    xs = cx[:, None] + off[None] * spacing[:, None]
    R = hat_matrix(ys, h)  # (K, P, H)
    C = hat_matrix(xs, w)  # (K, P, W)
    rows = jnp.einsum("kph,hw->kpw", R, img)
    return jnp.einsum("kpw,kqw->kpq", rows, C)


def sample_patch(patches: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Bilinear samples inside (K, P, P) patches at patch-space float coords.

    u: (K, S) row coordinate (patch index units); v: (K, S) column.
    Returns (K, S).
    """
    P = patches.shape[-1]
    RU = hat_matrix(u, P)  # (K, S, P)
    CV = hat_matrix(v, P)
    return jnp.einsum("ksa,kab,ksb->ks", RU, patches, CV)


def _resize_weights(out_n: int, n: int, antialias: bool, dtype) -> jax.Array:
    """(out_n, n) row-normalized triangle weights at half-pixel centers."""
    pos = jnp.clip(
        (jnp.arange(out_n, dtype=dtype) + 0.5) * (n / out_n) - 0.5,
        0.0, n - 1.0,
    )
    s = max(n / out_n, 1.0) if antialias else 1.0
    grid = jnp.arange(n, dtype=dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - grid[None]) / s)
    return w / jnp.sum(w, axis=1, keepdims=True)


def resize_bilinear(
    img: jax.Array, out_h: int, out_w: int, antialias: bool = False
) -> jax.Array:
    """Gather-free linear resize: two triangle-weight matmuls.

    ``antialias=False`` is plain 2-tap bilinear at half-pixel source centers
    — OpenCV ``INTER_LINEAR`` semantics (what the reference's ORB pyramid
    uses; cv::resize does not antialias), equal to
    ``jax.image.resize(..., "linear", antialias=False)``.  ``antialias=True``
    widens the triangle by the downscale ratio — equal to jax's antialiased
    linear, a close stand-in for INTER_AREA at non-integer ratios.

    Lowers to `R @ img @ C^T` on the MXU instead of the gather program XLA
    emits for the generic resize.  Beyond throughput this is a WORKAROUND
    for an axon-TPU runtime fault (r5): the gather-based resize executable
    reproducibly crashed the worker when traced inside a ``lax.scan`` body
    (the ORB pyramid was the only in-scan user — SURF/SIFT/AKAZE downsample
    by strided slicing).
    """
    h, w = img.shape
    R = _resize_weights(out_h, h, antialias, img.dtype)  # (out_h, h)
    C = _resize_weights(out_w, w, antialias, img.dtype)  # (out_w, w)
    return R @ img @ C.T


def conv2d_same(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Dense 2-D 'SAME' correlation of one image with one static kernel.

    Used for whole-image moment maps (e.g. ORB's intensity-centroid disc
    moments): one conv on the MXU replaces K x |disc| per-keypoint gathers.
    """
    return jax.lax.conv_general_dilated(
        img[None, None],
        kernel[None, None].astype(img.dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
