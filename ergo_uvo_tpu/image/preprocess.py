"""Per-frame preprocessing ops: gray, area resize, bilinear remap, full plan.

Device-side half of the reference's ``get_image`` (VO_utility.cpp:337-379);
the init-time half (grids, camera matrices) is :mod:`ergo_uvo_tpu.image.undistort`.
All ops are pure JAX on float32 images in [0, 255], batchable with `vmap`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ergo_uvo_tpu.image import undistort as _und
from ergo_uvo_tpu.image.clahe import clahe


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """(..., H, W, 3) RGB -> (..., H, W) gray with OpenCV's BT.601 weights.

    (ref: ``cvtColor(..., COLOR_RGB2GRAY)`` VO_utility.cpp:345,364.)
    """
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return img @ w


def resize_area(img: jax.Array, new_h: int, new_w: int) -> jax.Array:
    """INTER_AREA resize (ref: VO_utility.cpp:361).

    For integer downscale factors this is exact OpenCV INTER_AREA — plain
    box-average pooling, implemented as two reshape-mean contractions (VPU
    friendly, no gathers).  Non-integer ratios use the antialiased
    triangle-weight matmul resize (features/sampling.resize_bilinear, equal
    to jax.image.resize's antialiased linear — area behavior differs only at
    the margins; the standard 2x/4x downscales take the exact path).
    """
    *batch, h, w = img.shape
    if h % new_h == 0 and w % new_w == 0:
        fh, fw = h // new_h, w // new_w
        x = img.reshape(*batch, new_h, fh, new_w, fw)
        return x.mean(axis=(-3, -1))
    # Non-integer ratio: gather-free bilinear via hat-weight matmuls (same
    # semantics as jax.image.resize linear; see features/sampling.py for the
    # MXU rationale + the axon scan-fault workaround it doubles as).
    from ergo_uvo_tpu.features.sampling import resize_bilinear

    if not batch:
        return resize_bilinear(img, new_h, new_w, antialias=True)
    flat = img.reshape(-1, h, w)
    out = jax.vmap(
        lambda im: resize_bilinear(im, new_h, new_w, antialias=True)
    )(flat)
    return out.reshape(*batch, new_h, new_w)


def remap_bilinear_shifts(img: jax.Array, disp: jax.Array, max_shift: int) -> jax.Array:
    """Gather-free bilinear remap for bounded displacement fields.

    TPU gathers serialize (measured ~11 ms for a 640x480 remap); but an
    undistortion map is identity + a smooth displacement `disp` (H, W, 2)
    bounded by `max_shift`.  Exact bilinear resampling then decomposes into a
    weighted sum over STATIC integer shifts:

        out[v,u] = sum_{s} hat(dx - sx) * hat(dy - sy) * img[v+sy, u+sx]

    with hat(z) = max(0, 1-|z|) — nonzero only for the two integer shifts
    bracketing each displacement, so the sum over the (2D+2)^2 static shifts
    reproduces the gather exactly.  Pure slices + VPU fma: ~0.1 ms.
    Out-of-image taps contribute 0 (zero padding) = BORDER_CONSTANT(0).
    """
    h, w = img.shape
    D = int(max_shift)
    pad = jnp.pad(img, D + 1)
    dx = disp[..., 0]
    dy = disp[..., 1]
    out = jnp.zeros_like(img)
    for sy in range(-D, D + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - sy))
        for sx in range(-D, D + 2):
            wgt = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - sx))
            shifted = jax.lax.slice(
                pad, [D + 1 + sy, D + 1 + sx], [D + 1 + sy + h, D + 1 + sx + w]
            )
            out = out + wgt * shifted
    return out


def remap_bilinear(img: jax.Array, grid: jax.Array) -> jax.Array:
    """Sample `img` (H, W) at `grid` (H', W', 2) (x, y) with bilinear weights.

    Out-of-range samples produce 0, matching cv::undistort's
    BORDER_CONSTANT(0) fill.  Four flat gathers — kept as the fallback for
    unbounded/large warps; the undistortion path uses
    :func:`remap_bilinear_shifts` (TPU gathers are the slowest op in the
    whole pipeline).
    """
    h, w = img.shape[-2], img.shape[-1]
    x, y = grid[..., 0], grid[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = img.reshape(*img.shape[:-2], h * w)
        vals = jnp.take(flat, yc * w + xc, axis=-1)
        return jnp.where(valid, vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


class PreprocessPlan(NamedTuple):
    """Init-time state for the per-frame preprocess (finalized from the first
    frame's size, as the reference does — SURVEY.md §3.3)."""

    new_h: int
    new_w: int
    grid: jax.Array  # (new_h, new_w, 2) undistortion sampling grid
    disp: jax.Array  # (new_h, new_w, 2) grid - identity (shift-remap path)
    max_shift: int  # ceil(max |disp|); shift path used when small enough
    K_resized: jax.Array  # (3, 3) resized original K
    new_K: jax.Array  # (3, 3) alpha=0 optimal camera — the pipeline's K
    clahe_enabled: bool
    clip_limit: float


# Above this displacement bound the (2D+2)^2 shift decomposition costs more
# than the gather it replaces; fall back to remap_bilinear.
MAX_SHIFT_FOR_DECOMP = 24


def build_preprocess_plan(
    K: np.ndarray,
    dist: np.ndarray,
    orig_width: int,
    orig_height: int,
    desired_width: int,
    clahe_enabled: bool,
    clip_limit: float,
) -> PreprocessPlan:
    """Host-side plan construction (once, from the first frame's dimensions).

    Mirrors mono init (visual_odometry.h:221-222): rescale K by the width
    ratio, derive the alpha=0 optimal new camera, precompute the undistortion
    grid for the resized geometry.
    """
    K = np.asarray(K, np.float64)
    dist = np.asarray(dist, np.float64)
    ratio = orig_width / desired_width
    new_h = int(orig_height / ratio)
    new_w = desired_width
    K_resized = K / ratio
    K_resized[0, 1] = K[0, 1]
    K_resized[2, 2] = 1.0
    new_K = _und.optimal_new_camera(K_resized, dist, new_w, new_h)
    grid = _und.build_undistort_grid(K_resized, dist, new_K, new_w, new_h)
    ys, xs = np.mgrid[0:new_h, 0:new_w].astype(np.float64)
    disp = grid - np.stack([xs, ys], -1)
    max_shift = int(np.ceil(np.abs(disp).max())) if disp.size else 0
    return PreprocessPlan(
        new_h=new_h,
        new_w=new_w,
        grid=jnp.asarray(grid),
        disp=jnp.asarray(disp, jnp.float32),
        max_shift=max_shift,
        K_resized=jnp.asarray(K_resized, jnp.float32),
        new_K=jnp.asarray(new_K, jnp.float32),
        clahe_enabled=bool(clahe_enabled),
        clip_limit=float(clip_limit),
    )


def preprocess_frame(plan: PreprocessPlan, img: jax.Array) -> jax.Array:
    """Full ``get_image`` path: resize -> gray -> undistort -> CLAHE.

    `img`: (H, W, 3) RGB or (H, W) gray, float32 in [0, 255].
    Returns (new_h, new_w) float32 gray in [0, 255].
    """
    if img.ndim == 3:
        img = rgb_to_gray(img)
    if img.shape != (plan.new_h, plan.new_w):
        img = resize_area(img, plan.new_h, plan.new_w)
    if plan.max_shift <= MAX_SHIFT_FOR_DECOMP:
        img = remap_bilinear_shifts(img, plan.disp, plan.max_shift)
    else:
        img = remap_bilinear(img, plan.grid)
    # Stage boundary: keep the remap materialized instead of re-fused into
    # CLAHE's reductions.
    img = jax.lax.optimization_barrier(img)
    if plan.clahe_enabled:
        img = clahe(img, clip_limit=plan.clip_limit)
    return img
