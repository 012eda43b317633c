"""Upright SURF-64/128 descriptors — batched patch sampling + Haar aggregation.

Implements the descriptor stage of OpenCV's SURF as used by the reference
(``detect_features`` VO_utility.cpp:110-117 with SURF_UPRIGHT=true,
SURF_EXTENDED=false per mono_VO_parameters.yaml:48-49 — i.e. U-SURF, 64-d).

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


def _bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample (H, W) image at float coords; clamped borders."""
    h, w = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
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


def describe_upright_surf(
    img: jax.Array, kpts: Keypoints, extended: bool = False
) -> jax.Array:
    """(K, 64) (or (K, 128) if extended) unit descriptors; invalid rows -> 0."""
    K = kpts.xy.shape[0]
    P1 = PATCH + 1

    # Sample grid: (P1, P1) offsets in sigma units, centered on the keypoint.
    g = jnp.arange(P1, dtype=jnp.float32) - PATCH / 2.0  # -10..10
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    # (K, P1, P1) absolute image coords at spacing sigma.
    sx = kpts.xy[:, 0:1, None] + gx[None] * kpts.scale[:, None, None]
    sy = kpts.xy[:, 1:2, None] + gy[None] * kpts.scale[:, None, None]
    patch = _bilinear_sample(img, sx.reshape(-1), sy.reshape(-1)).reshape(K, P1, P1)

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
    return jnp.where(kpts.mask[:, None], feats, 0.0)
