"""AKAZE — nonlinear-diffusion scale space + M-LDB binary descriptor.

TPU-native implementation of the first branch of the reference's
``detect_features`` dispatch (``cv::AKAZE::create()`` with its stock
defaults: M-LDB descriptor, threshold 1e-3, 4 octaves x 4 sublevels,
Perona-Malik g2 diffusivity — VO_utility.cpp:93-98).  Re-designed per
SURVEY.md §7.1 rather than translated:

  * the nonlinear scale space (Alcantarilla et al., "Fast Explicit Diffusion
    for Accelerated Features in Nonlinear Scale Spaces", BMVC 2013) is built
    with explicit diffusion steps — each step is one 3x3 stencil
    ``L += tau * div(g * grad L)`` of pure shifted-slice VPU arithmetic, a
    shape XLA fuses aggressively; step counts come from the (static) sigma
    schedule, so the whole pyramid is one straight-line compiled program;
  * the contrast factor k is the 70th percentile of |grad L| on the smoothed
    base image (the paper's estimator), computed with a sort, not a 300-bin
    histogram;
  * detection is the sigma^4-normalized determinant of the Hessian on each
    evolution level, 3x3x3 NMS across each octave's sublevel stack, fixed
    top-K per octave + global merge + batched quadratic subpixel refinement
    — the same fixed-shape machinery as the SURF detector;
  * M-LDB samples cell means of (L, Lx, Ly) on 2x2 / 3x3 / 4x4 grids over a
    rotated pattern of extent ~5 sigma and emits all C(n^2,2) pairwise
    comparisons per channel: (6 + 36 + 120) * 3 = 486 bits, zero-padded to
    512 for MXU tile alignment.  Gradients are rotated into the keypoint
    frame as OpenCV does.  Cell means are estimated from a 3x3 bilinear
    sample grid per cell instead of every pixel, so descriptors are
    statistically — not bitwise — comparable (same tolerance-band parity
    stance as ORB/SURF, SURVEY.md §4).

Binary descriptors are carried as (K, 512) float32 in {0, 1}; squared L2 on
bits = Hamming, so the MXU matmul matcher serves the reference's
NORM_HAMMING branch (``match_descriptors(..., binary=True)``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ergo_uvo_tpu.features.detector import Keypoints
from ergo_uvo_tpu.geometry.triangulation import _solve33

SIGMA0 = 1.6  # base scale after initial smoothing (paper §3)
TAU_MAX = 0.25  # 2-D explicit-diffusion stability limit
DESCRIPTOR_BITS = 512  # 486 M-LDB bits zero-padded to an MXU-friendly width


def _gaussian_blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian via two 1-D convolutions (static kernel)."""
    radius = max(int(math.ceil(3.0 * sigma)), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = jnp.asarray(k / k.sum(), img.dtype)
    pad = jnp.pad(img, ((radius, radius), (0, 0)), mode="edge")
    img = sum(k[i] * jax.lax.slice_in_dim(pad, i, i + img.shape[0], axis=0)
              for i in range(2 * radius + 1))
    pad = jnp.pad(img, ((0, 0), (radius, radius)), mode="edge")
    return sum(k[i] * jax.lax.slice_in_dim(pad, i, i + img.shape[1], axis=1)
               for i in range(2 * radius + 1))


def _grad(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Central-difference gradient with edge-replicated borders."""
    pad = jnp.pad(img, 1, mode="edge")
    h, w = img.shape
    gx = 0.5 * (pad[1:h + 1, 2:] - pad[1:h + 1, :w])
    gy = 0.5 * (pad[2:, 1:w + 1] - pad[:h, 1:w + 1])
    return gx, gy


def _diffusion_step(L: jax.Array, g: jax.Array, tau: float) -> jax.Array:
    """One explicit step of  dL/dt = div(g * grad L)  on the pixel grid.

    Flux form with conductivities averaged onto half-grid edges; Neumann
    (zero-flux) boundaries via edge padding.  Pure shifted adds/multiplies.
    """
    h, w = L.shape
    Lp = jnp.pad(L, 1, mode="edge")
    gp = jnp.pad(g, 1, mode="edge")

    def sh(dy, dx, a):
        return jax.lax.slice(a, [1 + dy, 1 + dx], [1 + dy + h, 1 + dx + w])

    c = sh(0, 0, gp)
    flux = (
        (sh(0, 1, gp) + c) * (sh(0, 1, Lp) - L)
        + (sh(0, -1, gp) + c) * (sh(0, -1, Lp) - L)
        + (sh(1, 0, gp) + c) * (sh(1, 0, Lp) - L)
        + (sh(-1, 0, gp) + c) * (sh(-1, 0, Lp) - L)
    )
    return L + (0.5 * tau) * flux


def _contrast_factor(img: jax.Array, percentile: float = 70.0) -> jax.Array:
    """k = `percentile` of gradient magnitude over the smoothed image
    (paper §3.2; OpenCV uses a 300-bin histogram — a sort is exact)."""
    gx, gy = _grad(_gaussian_blur(img, SIGMA0))
    mag = jnp.sqrt(gx * gx + gy * gy).reshape(-1)
    # nanpercentile ignores the NaN-masked flat pixels; plain percentile would
    # return NaN whenever ANY pixel is flat, silently collapsing k to the
    # fallback (ADVICE r3).  nan_to_num now only covers all-flat images.
    k = jnp.nanpercentile(jnp.where(mag > 1e-8, mag, jnp.nan), percentile)
    return jnp.maximum(jnp.nan_to_num(k, nan=0.01), 1e-3)


def _sigma_schedule(n_octaves: int, n_sublevels: int):
    """Global sigmas sigma0 * 2^(o + s/S) for every evolution level."""
    return [
        [SIGMA0 * 2.0 ** (o + s / n_sublevels) for s in range(n_sublevels)]
        for o in range(n_octaves)
    ]


def build_nonlinear_scale_space(
    img: jax.Array, n_octaves: int = 4, n_sublevels: int = 4
):
    """Evolution pyramid: per octave a (S, h_o, w_o) stack of diffused images.

    The image is normalized to [0, 1] (AKAZE's convention — the default
    detection threshold 1e-3 is calibrated to it).  Step counts are static:
    between consecutive levels the local diffusion-time gap is split into
    ceil(dt / TAU_MAX) explicit steps.  Octave transitions downsample 2x
    (diffusion time rescales by 1/4 in the new pixel units).  The g2
    conductivity ``1 / (1 + |grad L|^2 / k^2)`` is recomputed at each level
    from the current image.
    """
    L = _gaussian_blur(img.astype(jnp.float32) / 255.0, SIGMA0)
    k = _contrast_factor(img.astype(jnp.float32) / 255.0)
    k2 = k * k
    sigmas = _sigma_schedule(n_octaves, n_sublevels)

    octave_stacks = []
    t_local = 0.5 * SIGMA0 * SIGMA0  # accumulated time in current-octave units
    for o in range(n_octaves):
        if o > 0:
            L = L[::2, ::2]
            t_local = t_local / 4.0
            # Gradients measured on the halved grid double (same physical
            # edge, twice the pixel spacing), so |grad|^2 grows 4x; scale k^2
            # with it to keep the conductance of an edge octave-invariant.
            k2 = k2 * 4.0
        levels = []
        for s in range(n_sublevels):
            t_target = 0.5 * (sigmas[o][s] / (1 << o)) ** 2
            dt = t_target - t_local
            n_steps = max(int(math.ceil(dt / TAU_MAX)), 0)
            if n_steps:
                tau = dt / n_steps
                gx, gy = _grad(L)
                g = 1.0 / (1.0 + (gx * gx + gy * gy) / k2)
                for _ in range(n_steps):
                    L = _diffusion_step(L, g, tau)
            t_local = t_target
            levels.append(L)
        octave_stacks.append(jnp.stack(levels))
    return octave_stacks


def _level_derivatives(L: jax.Array, delta: int):
    """First/second differences at step `delta` (scale-matched aperture)."""
    h, w = L.shape
    p = jnp.pad(L, delta, mode="edge")

    def sh(dy, dx):
        return jax.lax.slice(
            p, [delta + dy, delta + dx], [delta + dy + h, delta + dx + w]
        )

    inv = 1.0 / (2.0 * delta)
    lx = (sh(0, delta) - sh(0, -delta)) * inv
    ly = (sh(delta, 0) - sh(-delta, 0)) * inv
    lxx = (sh(0, delta) + sh(0, -delta) - 2.0 * L) / (delta * delta)
    lyy = (sh(delta, 0) + sh(-delta, 0) - 2.0 * L) / (delta * delta)
    lxy = (
        sh(delta, delta) - sh(delta, -delta)
        - sh(-delta, delta) + sh(-delta, -delta)
    ) / (4.0 * delta * delta)
    return lx, ly, lxx, lyy, lxy


def _octave_response(stack: jax.Array, o: int, sigmas_o):
    """(S, h_o, w_o) sigma^4-normalized det-Hessian + per-level (Lx, Ly)."""
    dets, lxs, lys = [], [], []
    for s in range(stack.shape[0]):
        sig_local = sigmas_o[s] / (1 << o)
        delta = max(int(round(sig_local)), 1)
        lx, ly, lxx, lyy, lxy = _level_derivatives(stack[s], delta)
        norm = sig_local**4
        dets.append(norm * (lxx * lyy - lxy * lxy))
        lxs.append(lx)
        lys.append(ly)
    return jnp.stack(dets), jnp.stack(lxs), jnp.stack(lys)


def _octave_candidates_akaze(
    dets, o: int, sigmas_o, max_keypoints: int, threshold: float
):
    """Fixed top-K NMS peaks of one octave stack, subpixel-refined.

    Same structure as the SURF detector's candidate stage (detector.py):
    3x3x3 reduce_window NMS, top_k, batched quadratic refinement.  All S
    sublevels participate (edge levels compare against a 2-deep slab)."""
    S, h_o, w_o = dets.shape
    step = 1 << o
    nmax = jax.lax.reduce_window(
        dets, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1),
        ((1, 1), (1, 1), (1, 1)),
    )
    is_peak = (dets >= nmax) & (dets > threshold)
    ys = jax.lax.broadcasted_iota(jnp.int32, (S, h_o, w_o), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (S, h_o, w_o), 2)
    border = max(int(round(sigmas_o[-1] / step)) + 1, 2)
    interior = (
        (ys >= border) & (ys < h_o - border)
        & (xs >= border) & (xs < w_o - border)
    )
    flat = jnp.where(is_peak & interior, dets, -jnp.inf).reshape(-1)
    k = min(max_keypoints, flat.shape[0])
    scores, idx = jax.lax.top_k(flat, k)
    if k < max_keypoints:
        pad = max_keypoints - k
        scores = jnp.pad(scores, (0, pad), constant_values=-jnp.inf)
        idx = jnp.pad(idx, (0, pad))
    s_idx = idx // (h_o * w_o)
    rem = idx % (h_o * w_o)
    y_idx = rem // w_o
    x_idx = rem % w_o
    mask = jnp.isfinite(scores)

    def nb(ds, dy, dx):
        ss = jnp.clip(s_idx + ds, 0, S - 1)
        yy = jnp.clip(y_idx + dy, 1, h_o - 2)
        xx = jnp.clip(x_idx + dx, 1, w_o - 2)
        return dets[ss, yy, xx]

    c = nb(0, 0, 0)
    d_s = 0.5 * (nb(1, 0, 0) - nb(-1, 0, 0))
    d_y = 0.5 * (nb(0, 1, 0) - nb(0, -1, 0))
    d_x = 0.5 * (nb(0, 0, 1) - nb(0, 0, -1))
    d_ss = nb(1, 0, 0) + nb(-1, 0, 0) - 2 * c
    d_yy = nb(0, 1, 0) + nb(0, -1, 0) - 2 * c
    d_xx = nb(0, 0, 1) + nb(0, 0, -1) - 2 * c
    d_sy = 0.25 * (nb(1, 1, 0) - nb(1, -1, 0) - nb(-1, 1, 0) + nb(-1, -1, 0))
    d_sx = 0.25 * (nb(1, 0, 1) - nb(1, 0, -1) - nb(-1, 0, 1) + nb(-1, 0, -1))
    d_yx = 0.25 * (nb(0, 1, 1) - nb(0, 1, -1) - nb(0, -1, 1) + nb(0, -1, -1))
    H3 = jnp.stack(
        [
            jnp.stack([d_ss, d_sy, d_sx], -1),
            jnp.stack([d_sy, d_yy, d_yx], -1),
            jnp.stack([d_sx, d_yx, d_xx], -1),
        ],
        -2,
    )
    g = jnp.stack([d_s, d_y, d_x], -1)
    off = jnp.clip(-_solve33(H3, g), -1.0, 1.0)

    sig_arr = jnp.asarray(sigmas_o, jnp.float32)
    sub_ratio = 2.0 ** (1.0 / len(sigmas_o))
    sigma = sig_arr[s_idx] * sub_ratio ** off[:, 0]
    xy = jnp.stack(
        [
            (x_idx.astype(jnp.float32) + off[:, 2]) * step,
            (y_idx.astype(jnp.float32) + off[:, 1]) * step,
        ],
        -1,
    )
    return scores, xy, sigma, s_idx, mask


def detect_akaze(
    img: jax.Array,
    max_keypoints: int = 512,
    threshold: float = 1e-3,
    n_octaves: int = 4,
    n_sublevels: int = 4,
):
    """AKAZE keypoints on a (H, W) float image (0..255 gray).

    Returns (Keypoints, scale_space) where scale_space is the per-octave
    evolution data needed by :func:`describe_akaze` — (L stack, Lx stack,
    Ly stack) per octave.  `laplacian` carries the keypoint's global
    evolution-level index (octave * S + sublevel) as a float.
    """
    h, w = img.shape
    stacks = build_nonlinear_scale_space(img, n_octaves, n_sublevels)
    sigmas = _sigma_schedule(n_octaves, n_sublevels)

    per_octave, space = [], []
    for o in range(n_octaves):
        dets, lxs, lys = _octave_response(stacks[o], o, sigmas[o])
        dets = jax.lax.optimization_barrier(dets)
        space.append((stacks[o], lxs, lys))
        sc, xy, sg, s_idx, m = _octave_candidates_akaze(
            dets, o, sigmas[o], max_keypoints, threshold
        )
        level = (o * n_sublevels + s_idx).astype(jnp.float32)
        per_octave.append((jnp.where(m, sc, -jnp.inf), xy, sg, level, m))

    scores = jnp.concatenate([p[0] for p in per_octave])
    xy = jnp.concatenate([p[1] for p in per_octave])
    sigma = jnp.concatenate([p[2] for p in per_octave])
    level = jnp.concatenate([p[3] for p in per_octave])
    mask = jnp.concatenate([p[4] for p in per_octave])
    top_scores, top_idx = jax.lax.top_k(
        jnp.where(mask, scores, -jnp.inf), max_keypoints
    )
    top_mask = jnp.isfinite(top_scores)
    zero = jnp.zeros((max_keypoints,), jnp.float32)
    kpts = Keypoints(
        xy=jnp.where(top_mask[:, None], jnp.take(xy, top_idx, axis=0), 0.0),
        scale=jnp.where(top_mask, jnp.take(sigma, top_idx), zero),
        score=jnp.where(top_mask, top_scores, zero),
        laplacian=jnp.where(top_mask, jnp.take(level, top_idx), zero),
        mask=top_mask,
    )
    return kpts, space


def _bilinear_stack(stack: jax.Array, s_idx: jax.Array, x: jax.Array,
                    y: jax.Array) -> jax.Array:
    """Bilinear sample of a (S, h, w) stack at integer sublevel s_idx."""
    S, h, w = stack.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    flat = stack.reshape(-1)
    base = s_idx * (h * w)

    def at(yi, xi):
        return jnp.take(flat, base + yi * w + xi)

    top = at(y0i, x0i) * (1 - wx) + at(y0i, x1i) * wx
    bot = at(y1i, x0i) * (1 - wx) + at(y1i, x1i) * wx
    return top * (1 - wy) + bot * wy


def _mldb_cells():
    """Static cell-center offsets (unit pattern, extent [-1, 1]) and the
    3x3 intra-cell sample offsets, plus the C(n^2, 2) pair index table."""
    cells = []
    for n in (2, 3, 4):
        edges = np.linspace(-1.0, 1.0, n + 1)
        c = 0.5 * (edges[:-1] + edges[1:])
        half = 1.0 / n  # half cell width
        for cy in c:
            for cx in c:
                cells.append((cx, cy, half))
    centers = np.asarray([(c[0], c[1]) for c in cells], np.float32)  # (29, 2)
    halves = np.asarray([c[2] for c in cells], np.float32)  # (29,)
    # 3x3 sample offsets within a unit half-width cell (interior points).
    g = np.asarray([-0.6, 0.0, 0.6], np.float32)
    sub = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)  # (9,2)
    pairs = []
    off = 0
    for n in (2, 3, 4):
        m = n * n
        for i in range(m):
            for j in range(i + 1, m):
                pairs.append((off + i, off + j))
        off += m
    return centers, halves, sub, np.asarray(pairs, np.int32)  # 162 pairs


_CENTERS, _HALVES, _SUB, _PAIRS = _mldb_cells()
PATTERN_EXTENT = 5.0  # pattern half-width in units of sigma (M-LDB scale 10s)


def _orientation(space, kpts: Keypoints, n_sublevels: int) -> jax.Array:
    """Dominant gradient direction per keypoint: Gaussian-weighted mean of
    (Lx, Ly) over a radius-6sigma disc at the keypoint's evolution level
    (a smooth analogue of AKAZE's sliding-arc vote; SURVEY.md §4
    tolerance-band parity)."""
    g = np.linspace(-1.0, 1.0, 7, dtype=np.float32)
    gy, gx = np.meshgrid(g, g, indexing="ij")
    disc = (gx**2 + gy**2) <= 1.0
    wgt = jnp.asarray(np.exp(-(gx**2 + gy**2) / 0.5) * disc, jnp.float32)
    gx = jnp.asarray(gx, jnp.float32)
    gy = jnp.asarray(gy, jnp.float32)

    K = kpts.xy.shape[0]
    level = kpts.laplacian.astype(jnp.int32)
    sum_x = jnp.zeros((K,), jnp.float32)
    sum_y = jnp.zeros((K,), jnp.float32)
    for o, (_, lxs, lys) in enumerate(space):
        sel = (level // n_sublevels) == o
        s_idx = jnp.clip(level - o * n_sublevels, 0, lxs.shape[0] - 1)
        step = float(1 << o)
        r = 6.0 * kpts.scale / step  # disc radius, octave-local pixels
        sx = kpts.xy[:, 0:1, None] / step + r[:, None, None] * gx[None]
        sy = kpts.xy[:, 1:2, None] / step + r[:, None, None] * gy[None]
        sflat = jnp.broadcast_to(s_idx[:, None, None], sx.shape).reshape(-1)
        vx = _bilinear_stack(lxs, sflat, sx.reshape(-1), sy.reshape(-1))
        vy = _bilinear_stack(lys, sflat, sx.reshape(-1), sy.reshape(-1))
        wx = jnp.sum(vx.reshape(K, -1) * wgt.reshape(-1)[None], -1)
        wy = jnp.sum(vy.reshape(K, -1) * wgt.reshape(-1)[None], -1)
        sum_x = jnp.where(sel, wx, sum_x)
        sum_y = jnp.where(sel, wy, sum_y)
    return jnp.arctan2(sum_y, sum_x)


def describe_akaze(
    space,
    kpts: Keypoints,
    n_sublevels: int = 4,
    upright: bool = False,
) -> jax.Array:
    """(K, 512) float32 {0,1} M-LDB bits; invalid rows -> 0.

    For each keypoint: sample 29 grid cells (2x2 + 3x3 + 4x4) of the rotated
    pattern, estimate per-cell means of (L, Lx', Ly') — gradients rotated
    into the keypoint frame — from the evolution level the point was
    detected at, then emit 162 pairwise comparisons x 3 channels = 486 bits
    (OpenCV's full-size M-LDB layout), zero-padded to 512.
    """
    K = kpts.xy.shape[0]
    angle = (
        jnp.zeros((K,), jnp.float32)
        if upright
        else _orientation(space, kpts, n_sublevels)
    )
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    level = kpts.laplacian.astype(jnp.int32)

    centers = jnp.asarray(_CENTERS)  # (C, 2) unit-pattern cell centers
    halves = jnp.asarray(_HALVES)  # (C,)
    sub = jnp.asarray(_SUB)  # (P, 2)
    # (C, P, 2) unit-pattern sample points.
    pts = centers[:, None, :] + halves[:, None, None] * sub[None]
    C, Pn, _ = pts.shape

    means = jnp.zeros((K, C, 3), jnp.float32)
    for o, (ls, lxs, lys) in enumerate(space):
        sel = (level // n_sublevels) == o
        s_idx = jnp.clip(level - o * n_sublevels, 0, ls.shape[0] - 1)
        step = float(1 << o)
        ext = PATTERN_EXTENT * kpts.scale  # (K,) pattern half-width, px
        # Rotate the unit pattern into the keypoint frame, scale, offset.
        px = pts[None, ..., 0] * ext[:, None, None]  # (K, C, P)
        py = pts[None, ..., 1] * ext[:, None, None]
        rx = ca[:, None, None] * px - sa[:, None, None] * py
        ry = sa[:, None, None] * px + ca[:, None, None] * py
        sx = (kpts.xy[:, 0, None, None] + rx) / step
        sy = (kpts.xy[:, 1, None, None] + ry) / step
        sflat = jnp.broadcast_to(s_idx[:, None, None], sx.shape).reshape(-1)
        vL = _bilinear_stack(ls, sflat, sx.reshape(-1), sy.reshape(-1))
        vx = _bilinear_stack(lxs, sflat, sx.reshape(-1), sy.reshape(-1))
        vy = _bilinear_stack(lys, sflat, sx.reshape(-1), sy.reshape(-1))
        mL = jnp.mean(vL.reshape(K, C, Pn), -1)
        mx = jnp.mean(vx.reshape(K, C, Pn), -1)
        my = jnp.mean(vy.reshape(K, C, Pn), -1)
        # Rotate gradients into the keypoint frame (OpenCV M-LDB).
        mxr = ca[:, None] * mx + sa[:, None] * my
        myr = -sa[:, None] * mx + ca[:, None] * my
        m_o = jnp.stack([mL, mxr, myr], -1)  # (K, C, 3)
        means = jnp.where(sel[:, None, None], m_o, means)

    pi = jnp.asarray(_PAIRS[:, 0])
    pj = jnp.asarray(_PAIRS[:, 1])
    diff = jnp.take(means, pi, axis=1) - jnp.take(means, pj, axis=1)
    bits = (diff > 0).astype(jnp.float32).reshape(K, -1)  # (K, 486)
    bits = jnp.pad(bits, ((0, 0), (0, DESCRIPTOR_BITS - bits.shape[1])))
    return jnp.where(kpts.mask[:, None], bits, 0.0)


def detect_and_describe_akaze(
    img: jax.Array,
    max_keypoints: int = 512,
    threshold: float = 1e-3,
    n_octaves: int = 4,
    n_sublevels: int = 4,
    upright: bool = False,
):
    """One-call AKAZE frontend: (Keypoints, (K, 512) binary descriptors)."""
    kpts, space = detect_akaze(
        img, max_keypoints, threshold, n_octaves, n_sublevels
    )
    kpts = jax.lax.optimization_barrier(kpts)
    desc = describe_akaze(space, kpts, n_sublevels, upright)
    return kpts, desc
