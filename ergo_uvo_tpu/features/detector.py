"""SURF-style fast-Hessian keypoint detector — fixed-K, mask-carrying.

TPU-native re-design of OpenCV's SURF detection as dispatched by the
reference's ``detect_features`` (VO_utility.cpp:91-126; SURF params loaded at
:502-506: min_hessian, n_octaves, n_octave_layers, extended, upright).

Algorithm (Bay et al., "Speeded-Up Robust Features", CVIU 2008 — the same
one OpenCV implements):
  * box-filter approximations of the Hessian (Dxx, Dyy, Dxy) at filter sizes
    (9 + 6*l) << o for layer l, octave o, evaluated over an integral image;
  * det(H) = Dxx*Dyy - (0.9*Dxy)^2, with each box normalized by its area so
    the configured `min_hessian` thresholds transfer;
  * 3x3x3 scale-space non-max suppression within each octave;
  * top-K candidates (fixed budget) + batched quadratic sub-pixel/sub-scale
    refinement.

Deviations from OpenCV (statistical parity per SURVEY.md §7.3): responses are
computed at stride 1 for every octave (OpenCV samples at 2^o), so higher
octaves are denser here; center alignment uses floor(s/2) offsets and the
sub-pixel fit absorbs the sub-pixel bias.

Everything is static-shaped: the dense phase is slice arithmetic (no gathers),
selection is one `top_k`, refinement gathers exactly 27 values per keypoint.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.features.integral import box_sum, integral_image, pad_integral
from ergo_uvo_tpu.geometry.triangulation import _solve33

# SURF 9x9 base patterns: (x0, y0, x1, y1, weight), coords relative to the
# filter's top-left corner, half-open boxes.  (Bay et al. Fig. 2; identical
# layout to OpenCV's dx_s/dy_s/dxy_s tables.)
_DXX = ((0, 2, 3, 7, 1.0), (3, 2, 6, 7, -2.0), (6, 2, 9, 7, 1.0))
_DYY = ((2, 0, 7, 3, 1.0), (2, 3, 7, 6, -2.0), (2, 6, 7, 9, 1.0))
_DXY = (
    (1, 1, 4, 4, 1.0),
    (5, 1, 8, 4, -1.0),
    (1, 5, 4, 8, -1.0),
    (5, 5, 8, 8, 1.0),
)


class Keypoints(NamedTuple):
    """Fixed-budget keypoint set with validity mask (SURVEY.md §7.1)."""

    xy: jax.Array  # (K, 2) float32 pixel coords (x, y)
    scale: jax.Array  # (K,) float32 SURF sigma = 1.2 * size / 9
    score: jax.Array  # (K,) float32 det-of-Hessian response
    laplacian: jax.Array  # (K,) float32 sign of the trace
    mask: jax.Array  # (K,) bool

    @property
    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))


def _scaled_pattern(pattern, size: int):
    """Scale a 9x9 base pattern to `size`, rounding corners, area-normalizing
    weights, and centering offsets on the pixel (floor(size/2))."""
    ratio = size / 9.0
    c = size // 2
    out = []
    for x0, y0, x1, y1, w in pattern:
        sx0 = int(round(x0 * ratio))
        sy0 = int(round(y0 * ratio))
        sx1 = int(round(x1 * ratio))
        sy1 = int(round(y1 * ratio))
        area = max((sx1 - sx0) * (sy1 - sy0), 1)
        out.append((sy0 - c, sx0 - c, sy1 - c, sx1 - c, w / area))
    return out


def _haar_response(iip, margin, h, w, boxes):
    acc = None
    for y0, x0, y1, x1, wgt in boxes:
        s = box_sum(iip, margin, h, w, y0, x0, y1, x1) * wgt
        acc = s if acc is None else acc + s
    return acc


def filter_sizes(n_octaves: int, n_layers: int):
    """Filter size table: sizes[o][l] = (9 + 6*l) << o, l in [0, n_layers+2)."""
    return [
        [(9 + 6 * layer) << octave for layer in range(n_layers + 2)]
        for octave in range(n_octaves)
    ]


def hessian_pyramid(img: jax.Array, n_octaves: int = 4, n_layers: int = 3):
    """Dense det/trace stacks: (n_octaves, n_layers+2, H, W) each.

    Also returns the per-layer validity margin table (filter fits in image).
    """
    h, w = img.shape
    sizes = filter_sizes(n_octaves, n_layers)
    max_size = sizes[-1][-1]
    # Pattern corner offsets are in [-size//2, size - size//2]; +2 slack.
    margin = max_size // 2 + 2
    ii = integral_image(img)
    iip = pad_integral(ii, margin)

    dets, traces = [], []
    for octave in range(n_octaves):
        d_o, t_o = [], []
        for layer in range(n_layers + 2):
            s = sizes[octave][layer]
            dx = _haar_response(iip, margin, h, w, _scaled_pattern(_DXX, s))
            dy = _haar_response(iip, margin, h, w, _scaled_pattern(_DYY, s))
            dxy = _haar_response(iip, margin, h, w, _scaled_pattern(_DXY, s))
            det = dx * dy - 0.81 * dxy * dxy
            trace = dx + dy
            d_o.append(det)
            t_o.append(trace)
        dets.append(jnp.stack(d_o))
        traces.append(jnp.stack(t_o))
    return jnp.stack(dets), jnp.stack(traces), sizes


def _layer_valid_mask(h, w, size):
    """Centers where the `size` filter fits entirely inside the image."""
    m = size // 2 + 1
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (ys >= m) & (ys < h - m) & (xs >= m) & (xs < w - m)


def detect_surf(
    img: jax.Array,
    max_keypoints: int = 512,
    min_hessian: float = 50.0,
    n_octaves: int = 4,
    n_layers: int = 3,
) -> Keypoints:
    """Detect up to `max_keypoints` SURF keypoints on a (H, W) float image.

    Returns a fixed-shape :class:`Keypoints`; slots beyond the number of
    detections have mask=False.  Fully jittable; `vmap` for frame batches.
    """
    h, w = img.shape
    dets, traces, sizes = hessian_pyramid(img, n_octaves, n_layers)
    n_middle = n_layers  # layers 1..n_layers are NMS candidates

    # ---- 3x3x3 NMS within each octave (over the full L+2 layer stack).
    neighborhood_max = jax.lax.reduce_window(
        dets,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 3),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (1, 1)),
    )
    is_peak = (dets >= neighborhood_max) & (dets > min_hessian)

    # Validity: middle layers only, filter-fit margins (use the layer above's
    # size, as NMS compares against it).
    valid = jnp.zeros_like(is_peak)
    for octave in range(len(sizes)):
        for layer in range(1, n_middle + 1):
            lay_valid = _layer_valid_mask(h, w, sizes[octave][layer + 1])
            valid = valid.at[octave, layer].set(lay_valid)
    candidates = is_peak & valid

    # ---- top-K across all octaves/layers.
    flat_scores = jnp.where(candidates, dets, -jnp.inf).reshape(-1)
    scores, idx = jax.lax.top_k(flat_scores, max_keypoints)
    n_l = dets.shape[1]
    o_idx = idx // (n_l * h * w)
    rem = idx % (n_l * h * w)
    l_idx = rem // (h * w)
    rem = rem % (h * w)
    y_idx = rem // w
    x_idx = rem % w
    mask = jnp.isfinite(scores) & (scores > min_hessian)

    # ---- batched quadratic sub-pixel / sub-scale refinement.
    def neighborhood(dl, dy, dx):
        ll = jnp.clip(l_idx + dl, 0, n_l - 1)
        yy = jnp.clip(y_idx + dy, 1, h - 2)
        xx = jnp.clip(x_idx + dx, 1, w - 2)
        return dets[o_idx, ll, yy, xx]

    # derivative stencils (layer, y, x)
    d_l = 0.5 * (neighborhood(1, 0, 0) - neighborhood(-1, 0, 0))
    d_y = 0.5 * (neighborhood(0, 1, 0) - neighborhood(0, -1, 0))
    d_x = 0.5 * (neighborhood(0, 0, 1) - neighborhood(0, 0, -1))
    c = neighborhood(0, 0, 0)
    d_ll = neighborhood(1, 0, 0) + neighborhood(-1, 0, 0) - 2 * c
    d_yy = neighborhood(0, 1, 0) + neighborhood(0, -1, 0) - 2 * c
    d_xx = neighborhood(0, 0, 1) + neighborhood(0, 0, -1) - 2 * c
    d_ly = 0.25 * (
        neighborhood(1, 1, 0) - neighborhood(1, -1, 0)
        - neighborhood(-1, 1, 0) + neighborhood(-1, -1, 0)
    )
    d_lx = 0.25 * (
        neighborhood(1, 0, 1) - neighborhood(1, 0, -1)
        - neighborhood(-1, 0, 1) + neighborhood(-1, 0, -1)
    )
    d_yx = 0.25 * (
        neighborhood(0, 1, 1) - neighborhood(0, 1, -1)
        - neighborhood(0, -1, 1) + neighborhood(0, -1, -1)
    )
    H3 = jnp.stack(
        [
            jnp.stack([d_ll, d_ly, d_lx], -1),
            jnp.stack([d_ly, d_yy, d_yx], -1),
            jnp.stack([d_lx, d_yx, d_xx], -1),
        ],
        -2,
    )
    g = jnp.stack([d_l, d_y, d_x], -1)
    offset = -_solve33(H3, g)  # (K, 3) in (layer, y, x) units
    offset = jnp.clip(offset, -1.0, 1.0)

    # ---- assemble keypoints.
    sizes_arr = jnp.asarray(sizes, jnp.float32)  # (O, L)
    base_size = sizes_arr[o_idx, l_idx]
    size_step = jnp.asarray([6 << o for o in range(len(sizes))], jnp.float32)[o_idx]
    size_interp = base_size + offset[:, 0] * size_step
    sigma = 1.2 * size_interp / 9.0
    xy = jnp.stack(
        [x_idx.astype(jnp.float32) + offset[:, 2],
         y_idx.astype(jnp.float32) + offset[:, 1]],
        -1,
    )
    lap = jnp.sign(traces[o_idx, l_idx, y_idx, x_idx])
    zero = jnp.zeros_like(sigma)
    return Keypoints(
        xy=jnp.where(mask[:, None], xy, 0.0),
        scale=jnp.where(mask, sigma, zero),
        score=jnp.where(mask, scores, zero),
        laplacian=jnp.where(mask, lap, zero),
        mask=mask,
    )
