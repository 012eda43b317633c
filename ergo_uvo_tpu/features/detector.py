"""SURF-style fast-Hessian keypoint detector — fixed-K, mask-carrying.

TPU-native re-design of OpenCV's SURF detection as dispatched by the
reference's ``detect_features`` (VO_utility.cpp:91-126; SURF params loaded at
:502-506: min_hessian, n_octaves, n_octave_layers, extended, upright).

Algorithm (Bay et al., "Speeded-Up Robust Features", CVIU 2008 — the same
one OpenCV implements):
  * box-filter approximations of the Hessian (Dxx, Dyy, Dxy) at filter sizes
    (9 + 6*l) << o for layer l, octave o, evaluated over an integral image
    at sample stride 2^o per octave (OpenCV's sampleStep);
  * det(H) = Dxx*Dyy - (0.9*Dxy)^2, with each box normalized by its area so
    the configured `min_hessian` thresholds transfer;
  * 3x3x3 scale-space non-max suppression within each octave;
  * per-octave top-K candidates + batched quadratic sub-pixel/sub-scale
    refinement, then a global top-K merge (fixed budget).

Everything is static-shaped: the dense phase is strided-slice arithmetic (no
gathers); selection is `top_k` per octave + one merge `top_k`; refinement
gathers exactly 27 values per candidate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.features.integral import integral_image, pad_integral
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


def _strided_box_sum(iip, margin, h, w, step, y0, x0, y1, x1):
    """Box sum of img[y+y0 : y+y1, x+x0 : x+x1] for pixels (y, x) on the
    stride-`step` grid.  Returns (ceil(h/step), ceil(w/step)).

    Four strided slices of the padded integral image — pure VPU adds."""

    def corner(dy, dx):
        return jax.lax.slice(
            iip,
            [margin + dy, margin + dx],
            [margin + dy + h, margin + dx + w],
            [step, step],
        )

    return corner(y1, x1) - corner(y0, x1) - corner(y1, x0) + corner(y0, x0)


def _haar_response(iip, margin, h, w, step, boxes):
    acc = None
    for y0, x0, y1, x1, wgt in boxes:
        s = _strided_box_sum(iip, margin, h, w, step, y0, x0, y1, x1) * wgt
        acc = s if acc is None else acc + s
    return acc


def filter_sizes(n_octaves: int, n_layers: int):
    """Filter size table: sizes[o][l] = (9 + 6*l) << o, l in [0, n_layers+2)."""
    return [
        [(9 + 6 * layer) << octave for layer in range(n_layers + 2)]
        for octave in range(n_octaves)
    ]


def hessian_octave(iip, margin: int, h: int, w: int, octave: int, sizes_o):
    """Dense det/trace stacks for one octave at stride 2^octave.

    Returns (det, trace), each (n_layers+2, ceil(h/2^o), ceil(w/2^o))."""
    step = 1 << octave
    dets, traces = [], []
    for s in sizes_o:
        dx = _haar_response(iip, margin, h, w, step, _scaled_pattern(_DXX, s))
        dy = _haar_response(iip, margin, h, w, step, _scaled_pattern(_DYY, s))
        dxy = _haar_response(iip, margin, h, w, step, _scaled_pattern(_DXY, s))
        dets.append(dx * dy - 0.81 * dxy * dxy)
        traces.append(dx + dy)
    return jnp.stack(dets), jnp.stack(traces)


def _octave_candidates(
    dets, traces, octave: int, sizes_o, h: int, w: int,
    max_keypoints: int, min_hessian: float,
):
    """Top-K refined candidates for one octave.

    Returns per-candidate (score, xy, sigma, laplacian, mask), each (K, ...).
    """
    n_l, h_o, w_o = dets.shape
    step = 1 << octave
    n_middle = n_l - 2

    # ---- 3x3x3 NMS over the octave's layer stack.
    neighborhood_max = jax.lax.reduce_window(
        dets,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(3, 3, 3),
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
    )
    is_peak = (dets >= neighborhood_max) & (dets > min_hessian)

    # Validity: middle layers only, filter-fit margins (use the layer above's
    # size, as NMS compares against it), interior of the strided grid.
    ys = jax.lax.broadcasted_iota(jnp.int32, (h_o, w_o), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h_o, w_o), 1)
    valid_layers = []
    for layer in range(n_l):
        if 1 <= layer <= n_middle:
            m = sizes_o[layer + 1] // 2 + 1
            lv = (
                (ys * step >= m) & (ys * step < h - m)
                & (xs * step >= m) & (xs * step < w - m)
                & (ys >= 1) & (ys < h_o - 1) & (xs >= 1) & (xs < w_o - 1)
            )
        else:
            lv = jnp.zeros((h_o, w_o), bool)
        valid_layers.append(lv)
    candidates = is_peak & jnp.stack(valid_layers)

    # ---- top-K within the octave.
    flat_scores = jnp.where(candidates, dets, -jnp.inf).reshape(-1)
    k = min(max_keypoints, flat_scores.shape[0])
    scores, idx = jax.lax.top_k(flat_scores, k)
    if k < max_keypoints:
        pad = max_keypoints - k
        scores = jnp.pad(scores, (0, pad), constant_values=-jnp.inf)
        idx = jnp.pad(idx, (0, pad))
    l_idx = idx // (h_o * w_o)
    rem = idx % (h_o * w_o)
    y_idx = rem // w_o
    x_idx = rem % w_o
    mask = jnp.isfinite(scores) & (scores > min_hessian)

    # ---- batched quadratic sub-pixel / sub-scale refinement.
    def neighborhood(dl, dy, dx):
        ll = jnp.clip(l_idx + dl, 0, n_l - 1)
        yy = jnp.clip(y_idx + dy, 1, h_o - 2)
        xx = jnp.clip(x_idx + dx, 1, w_o - 2)
        return dets[ll, yy, xx]

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
    offset = jnp.clip(-_solve33(H3, g), -1.0, 1.0)  # (K, 3) in (layer, y, x)

    # ---- assemble in image coordinates (strided-grid units * step).
    sizes_arr = jnp.asarray(sizes_o, jnp.float32)
    base_size = sizes_arr[l_idx]
    size_step = float(6 << octave)
    sigma = 1.2 * (base_size + offset[:, 0] * size_step) / 9.0
    xy = jnp.stack(
        [
            (x_idx.astype(jnp.float32) + offset[:, 2]) * step,
            (y_idx.astype(jnp.float32) + offset[:, 1]) * step,
        ],
        -1,
    )
    lap = jnp.sign(traces[l_idx, y_idx, x_idx])
    return scores, xy, sigma, lap, mask


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
    sizes = filter_sizes(n_octaves, n_layers)
    max_size = sizes[-1][-1]
    # Pattern corner offsets are in [-size//2, size - size//2]; +2 slack.
    margin = max_size // 2 + 2
    # Barrier the integral image: dozens of strided-slice consumers follow;
    # fusing the cumsum into each would recompute it per box corner.
    iip = jax.lax.optimization_barrier(pad_integral(integral_image(img), margin))

    per_octave = []
    for octave in range(n_octaves):
        dets, traces = hessian_octave(iip, margin, h, w, octave, sizes[octave])
        # Stage boundary: the refinement gathers 27 neighbors per candidate
        # from `dets`; without a barrier XLA fuses the whole box-filter chain
        # into each gather and recomputes it per sample.
        dets, traces = jax.lax.optimization_barrier((dets, traces))
        per_octave.append(
            _octave_candidates(
                dets, traces, octave, sizes[octave], h, w,
                max_keypoints, min_hessian,
            )
        )

    # ---- global top-K merge across octaves.
    scores = jnp.concatenate([p[0] for p in per_octave])
    xy = jnp.concatenate([p[1] for p in per_octave])
    sigma = jnp.concatenate([p[2] for p in per_octave])
    lap = jnp.concatenate([p[3] for p in per_octave])
    mask = jnp.concatenate([p[4] for p in per_octave])

    merged = jnp.where(mask, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(merged, max_keypoints)
    top_mask = jnp.isfinite(top_scores)
    xy = jnp.take(xy, top_idx, axis=0)
    sigma = jnp.take(sigma, top_idx)
    lap = jnp.take(lap, top_idx)
    zero = jnp.zeros_like(sigma)
    return Keypoints(
        xy=jnp.where(top_mask[:, None], xy, 0.0),
        scale=jnp.where(top_mask, sigma, zero),
        score=jnp.where(top_mask, top_scores, zero),
        laplacian=jnp.where(top_mask, lap, zero),
        mask=top_mask,
    )
