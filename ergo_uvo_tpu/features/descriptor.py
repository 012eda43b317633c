"""SURF-64/128 descriptors (upright and oriented) — batched patch sampling.

Implements the descriptor stage of OpenCV's SURF as used by the reference
(``detect_features`` VO_utility.cpp:110-117; the shipped configs set
SURF_UPRIGHT=true / SURF_EXTENDED=false per mono_VO_parameters.yaml:48-49 —
i.e. U-SURF, 64-d — but both flags are honored: `describe_surf` adds the
dominant-orientation estimate (sliding 60-degree Haar-response window, Bay
et al. §4.1) and samples the patch in the rotated frame).

Algorithm (Bay et al. §4.2 / OpenCV surf.cpp structure): sample a
(PATCH+1)x(PATCH+1) patch around the keypoint at spacing sigma (bilinear here;
OpenCV uses nearest), take 2x2 Haar differences dx, dy weighted by a Gaussian,
aggregate 5x5 sample blocks into a 4x4 grid of subregions with
(sum dx, sum |dx|, sum dy, sum |dy|) each, L2-normalize the result.
`extended=True` splits sums by the sign of the co-gradient (128-d SURF).

All keypoints are processed in one batched computation: one bilinear gather of
K*(21*21) samples, then reshapes/reductions — no per-keypoint loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.features.detector import Keypoints

PATCH = 20  # PATCH_SZ, 4x4 subregions of 5x5 samples
_GAUSS_SIGMA = 3.3  # Bay et al.: sigma = 3.3s over the 20s window


def _sample_patches_matmul(
    img: jax.Array, xy: jax.Array, scale: jax.Array
) -> jax.Array:
    """(K, P1, P1) axis-aligned patches at spacing `scale`, via MXU matmuls.

    Patch grids are axis-aligned (upright SURF), so bilinear sampling is
    separable: per keypoint build row/column interpolation matrices (two
    hat-function taps per sample) and contract them against the image —
    two batched matmuls instead of K*P1^2 gathers (TPU gathers measured
    ~8 ms/frame for this stage; the matmul form is ~0.2 ms).  Coordinates
    are clamped to the border first, reproducing clamped-bilinear exactly.
    """
    h, w = img.shape
    P1 = PATCH + 1
    g = jnp.arange(P1, dtype=img.dtype) - PATCH / 2.0
    sy = jnp.clip(xy[:, 1:2] + g[None] * scale[:, None], 0, h - 1)  # (K, P1)
    sx = jnp.clip(xy[:, 0:1] + g[None] * scale[:, None], 0, w - 1)
    iy = jnp.arange(h, dtype=img.dtype)
    ix = jnp.arange(w, dtype=img.dtype)
    rows = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, :, None] - iy[None, None, :]))
    cols = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, :, None] - ix[None, None, :]))
    tmp = jnp.einsum(
        "hw,kqw->khq", img, cols, preferred_element_type=img.dtype
    )  # (K, H, P1)
    return jnp.einsum(
        "kph,khq->kpq", rows, tmp, preferred_element_type=img.dtype
    )  # (K, P1, P1)


def _sample_patches_rotated(
    img: jax.Array, xy: jax.Array, scale: jax.Array,
    cos_t: jax.Array, sin_t: jax.Array,
) -> jax.Array:
    """(K, P1, P1) patches sampled on a rotated grid (bilinear gathers).

    Rotated grids are not axis-aligned, so the separable-matmul trick does
    not apply — oriented SURF pays the gather cost (it is off by default:
    the reference configs run upright)."""
    h, w = img.shape
    P1 = PATCH + 1
    g = jnp.arange(P1, dtype=img.dtype) - PATCH / 2.0
    gy, gx = jnp.meshgrid(g, g, indexing="ij")  # (P1, P1)
    rx = cos_t[:, None, None] * gx[None] - sin_t[:, None, None] * gy[None]
    ry = sin_t[:, None, None] * gx[None] + cos_t[:, None, None] * gy[None]
    sx = jnp.clip(xy[:, 0:1, None] + rx * scale[:, None, None], 0, w - 1)
    sy = jnp.clip(xy[:, 1:2, None] + ry * scale[:, None, None], 0, h - 1)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    flat = img.reshape(-1)

    def at(yi, xi):
        return jnp.take(flat, yi * w + xi)

    top = at(y0i, x0i) * (1 - wx) + at(y0i, x1i) * wx
    bot = at(y1i, x0i) * (1 - wx) + at(y1i, x1i) * wx
    return top * (1 - wy) + bot * wy


def surf_orientations(img: jax.Array, kpts: Keypoints) -> jax.Array:
    """(K,) dominant orientation per keypoint (Bay et al. §4.1).

    Haar responses (dx, dy) on a sigma-spaced patch inside a 6-sigma disc,
    Gaussian weighted (sigma = 2.5 s); the orientation is the angle of the
    longest summed response vector over a sliding 60-degree window (64
    window starts, evaluated as one masked matmul)."""
    patch = _sample_patches_matmul(img, kpts.xy, kpts.scale)
    dx = (
        patch[:, :-1, 1:] - patch[:, :-1, :-1]
        + patch[:, 1:, 1:] - patch[:, 1:, :-1]
    )
    dy = (
        patch[:, 1:, :-1] - patch[:, :-1, :-1]
        + patch[:, 1:, 1:] - patch[:, :-1, 1:]
    )
    c = jnp.arange(PATCH, dtype=img.dtype) - (PATCH - 1) / 2.0
    yy, xx = jnp.meshgrid(c, c, indexing="ij")
    disc = ((xx**2 + yy**2) <= (PATCH / 2.0) ** 2).astype(img.dtype)
    gauss = jnp.exp(-(xx**2 + yy**2) / (2.0 * 2.5**2)) * disc
    dx = (dx * gauss[None]).reshape(kpts.xy.shape[0], -1)  # (K, S)
    dy = (dy * gauss[None]).reshape(kpts.xy.shape[0], -1)
    phi = jnp.arctan2(dy, dx)  # (K, S)
    n_win = 64
    starts = jnp.linspace(-jnp.pi, jnp.pi, n_win, endpoint=False)
    # in-window mask with wraparound: (K, S, n_win)
    d = jnp.mod(phi[..., None] - starts[None, None, :], 2 * jnp.pi)
    in_win = (d < jnp.pi / 3.0).astype(img.dtype)
    sx = jnp.einsum("ks,ksw->kw", dx, in_win)
    sy = jnp.einsum("ks,ksw->kw", dy, in_win)
    best = jnp.argmax(sx * sx + sy * sy, axis=-1)
    k_idx = jnp.arange(kpts.xy.shape[0])
    return jnp.arctan2(sy[k_idx, best], sx[k_idx, best])


def describe_surf(
    img: jax.Array,
    kpts: Keypoints,
    extended: bool = False,
    upright: bool = True,
) -> jax.Array:
    """(K, 64|128) unit descriptors; oriented when `upright=False`."""
    if upright:
        return describe_upright_surf(img, kpts, extended)
    theta = surf_orientations(img, kpts)
    patch = _sample_patches_rotated(
        img, kpts.xy, kpts.scale, jnp.cos(theta), jnp.sin(theta)
    )
    return _descriptor_from_patch(patch, kpts.mask, extended)


def describe_upright_surf(
    img: jax.Array, kpts: Keypoints, extended: bool = False
) -> jax.Array:
    """(K, 64) (or (K, 128) if extended) unit descriptors; invalid rows -> 0."""
    # (K, P1, P1) patches at spacing sigma, via separable interpolation
    # matmuls (no gathers — see _sample_patches_matmul).
    patch = _sample_patches_matmul(img, kpts.xy, kpts.scale)
    return _descriptor_from_patch(patch, kpts.mask, extended)


def _descriptor_from_patch(
    patch: jax.Array, mask: jax.Array, extended: bool
) -> jax.Array:
    K = patch.shape[0]

    # 2x2 Haar responses on the sampled patch (OpenCV surf.cpp inner loop).
    dx = (
        patch[:, :-1, 1:] - patch[:, :-1, :-1]
        + patch[:, 1:, 1:] - patch[:, 1:, :-1]
    )
    dy = (
        patch[:, 1:, :-1] - patch[:, :-1, :-1]
        + patch[:, 1:, 1:] - patch[:, :-1, 1:]
    )

    # Gaussian weighting over the 20x20 response grid.
    c = jnp.arange(PATCH, dtype=jnp.float32) - (PATCH - 1) / 2.0
    wy_, wx_ = jnp.meshgrid(c, c, indexing="ij")
    gauss = jnp.exp(-(wx_**2 + wy_**2) / (2.0 * _GAUSS_SIGMA**2))
    dx = dx * gauss[None]
    dy = dy * gauss[None]

    # Aggregate 5x5 blocks into the 4x4 subregion grid.
    def blocks(v):
        return v.reshape(K, 4, 5, 4, 5).transpose(0, 1, 3, 2, 4).reshape(K, 16, 25)

    bdx, bdy = blocks(dx), blocks(dy)
    if not extended:
        feats = jnp.stack(
            [
                bdx.sum(-1),
                jnp.abs(bdx).sum(-1),
                bdy.sum(-1),
                jnp.abs(bdy).sum(-1),
            ],
            -1,
        ).reshape(K, 64)
    else:
        # 128-d: split each sum by the sign of the other gradient component.
        neg_y, pos_y = bdy < 0, bdy >= 0
        neg_x, pos_x = bdx < 0, bdx >= 0
        feats = jnp.stack(
            [
                (bdx * neg_y).sum(-1),
                (jnp.abs(bdx) * neg_y).sum(-1),
                (bdx * pos_y).sum(-1),
                (jnp.abs(bdx) * pos_y).sum(-1),
                (bdy * neg_x).sum(-1),
                (jnp.abs(bdy) * neg_x).sum(-1),
                (bdy * pos_x).sum(-1),
                (jnp.abs(bdy) * pos_x).sum(-1),
            ],
            -1,
        ).reshape(K, 128)

    norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
    feats = feats / jnp.maximum(norm, 1e-12)
    return jnp.where(mask[:, None], feats, 0.0)
