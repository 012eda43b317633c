"""SIFT — DoG pyramid detector + 128-d gradient descriptor, TPU-native.

Third branch of the reference's ``detect_features`` dispatch
(``cv::SIFT::create(10000, 3, 0.03, 10, 1.6)``, VO_utility.cpp:101-104),
re-designed with the same fixed-shape/masked principles as the SURF path:

  * Gaussian scale space via separable 1-D convolutions (MXU/VPU friendly;
    each octave downsamples 2x, so per-octave work shrinks geometrically);
  * DoG extrema as a pair of 3x3x3 ``reduce_window`` min/max scans with
    contrast and edge-response (spatial Hessian ratio) gates — Lowe's tests;
  * per-octave top-K + batched quadratic sub-pixel refinement, global merge;
  * dominant orientation from a 36-bin Gaussian-weighted gradient histogram
    (one strongest peak per keypoint — fixed shapes);
  * 4x4x8 descriptor from a rotated 16x16 gradient patch with bilinear
    spatial and soft orientation binning, normalized + 0.2-clipped +
    renormalized (Lowe §6).

Descriptor distributions are statistically comparable to OpenCV's, not
bitwise (SURVEY.md §4 tolerance-band parity).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ergo_uvo_tpu.features.detector import Keypoints
from ergo_uvo_tpu.geometry.triangulation import _solve33

_N_SPLITS = 8  # orientation bins in the descriptor
_PATCH = 16  # descriptor sample grid (4x4 cells of 4x4 samples)


def _gauss_kernel(sigma: float):
    r = max(int(math.ceil(3.0 * sigma)), 1)
    x = np.arange(-r, r + 1)
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur (edge-padded, matching cv2 BORDER_REFLECT-ish
    behavior closely enough for detection)."""
    if sigma <= 0:
        return img
    k = jnp.asarray(_gauss_kernel(sigma))
    r = (k.shape[0] - 1) // 2
    h, w = img.shape
    p = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    rows = sum(k[i] * jax.lax.slice(p, [i, 0], [i + h, w]) for i in range(2 * r + 1))
    p = jnp.pad(rows, ((0, 0), (r, r)), mode="edge")
    return sum(
        k[i] * jax.lax.slice(p, [0, i], [h, i + w]) for i in range(2 * r + 1)
    )


def _downsample2(img: jax.Array) -> jax.Array:
    return img[::2, ::2]


def build_scale_space(
    img: jax.Array, n_octaves: int, n_scales: int, sigma0: float
):
    """List per octave of (gaussians (S+3, h, w), dog (S+2, h, w))."""
    k = 2.0 ** (1.0 / n_scales)
    # incremental sigmas so each level blurs from the previous
    sig_prev = 0.5  # assumed base-image blur
    base = _blur(img, math.sqrt(max(sigma0**2 - sig_prev**2, 1e-6)))
    octaves = []
    level0 = base
    for o in range(n_octaves):
        gs = [level0]
        sig = sigma0
        for s in range(1, n_scales + 3):
            sig_next = sigma0 * k**s
            inc = math.sqrt(max(sig_next**2 - sig**2, 1e-6))
            gs.append(_blur(gs[-1], inc))
            sig = sig_next
        g = jnp.stack(gs)
        dog = g[1:] - g[:-1]
        octaves.append((g, dog))
        level0 = _downsample2(gs[n_scales])  # the 2*sigma0 level
    return octaves


def _octave_keypoints(
    dog, octave: int, n_scales: int, sigma0: float,
    max_keypoints: int, contrast_thresh: float, edge_thresh: float,
):
    """Top-K refined (score, xy, sigma, layer_idx, mask) for one octave."""
    n_l, h, w = dog.shape

    def window(f, init):
        return jax.lax.reduce_window(
            dog, init, f, (3, 3, 3), (1, 1, 1), [(1, 1)] * 3
        )

    nmax = window(jax.lax.max, -jnp.inf)
    nmin = window(jax.lax.min, jnp.inf)
    # OpenCV's prefilter: floor(0.5 * contrastThreshold / nOctaveLayers * 255)
    thr = 0.5 * contrast_thresh / n_scales * 255.0  # images are [0, 255]
    is_ext = ((dog >= nmax) & (dog > thr)) | ((dog <= nmin) & (dog < -thr))

    # Edge response: 2x2 spatial Hessian ratio gate (Lowe §4.1).
    dxx = jnp.roll(dog, -1, 2) + jnp.roll(dog, 1, 2) - 2 * dog
    dyy = jnp.roll(dog, -1, 1) + jnp.roll(dog, 1, 1) - 2 * dog
    dxy = 0.25 * (
        jnp.roll(jnp.roll(dog, 1, 1), 1, 2)
        + jnp.roll(jnp.roll(dog, -1, 1), -1, 2)
        - jnp.roll(jnp.roll(dog, 1, 1), -1, 2)
        - jnp.roll(jnp.roll(dog, -1, 1), 1, 2)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_thresh
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = 8
    interior = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    layer_ok = jnp.zeros((n_l, 1, 1), bool).at[1 : n_scales + 1].set(True)
    cand = is_ext & edge_ok & interior[None] & layer_ok

    score = jnp.where(cand, jnp.abs(dog), -jnp.inf).reshape(-1)
    kk = min(max_keypoints, score.shape[0])
    scores, idx = jax.lax.top_k(score, kk)
    if kk < max_keypoints:
        scores = jnp.pad(scores, (0, max_keypoints - kk), constant_values=-jnp.inf)
        idx = jnp.pad(idx, (0, max_keypoints - kk))
    l_i = idx // (h * w)
    rem = idx % (h * w)
    y_i = rem // w
    x_i = rem % w
    mask = jnp.isfinite(scores)

    # Quadratic sub-pixel refinement on |DoG| stationary point.
    def at(dl, dy, dx):
        ll = jnp.clip(l_i + dl, 0, n_l - 1)
        yy = jnp.clip(y_i + dy, 1, h - 2)
        xx = jnp.clip(x_i + dx, 1, w - 2)
        return dog[ll, yy, xx]

    gl = 0.5 * (at(1, 0, 0) - at(-1, 0, 0))
    gy = 0.5 * (at(0, 1, 0) - at(0, -1, 0))
    gx = 0.5 * (at(0, 0, 1) - at(0, 0, -1))
    c = at(0, 0, 0)
    hll = at(1, 0, 0) + at(-1, 0, 0) - 2 * c
    hyy = at(0, 1, 0) + at(0, -1, 0) - 2 * c
    hxx = at(0, 0, 1) + at(0, 0, -1) - 2 * c
    hly = 0.25 * (at(1, 1, 0) - at(1, -1, 0) - at(-1, 1, 0) + at(-1, -1, 0))
    hlx = 0.25 * (at(1, 0, 1) - at(1, 0, -1) - at(-1, 0, 1) + at(-1, 0, -1))
    hyx = 0.25 * (at(0, 1, 1) - at(0, 1, -1) - at(0, -1, 1) + at(0, -1, -1))
    H3 = jnp.stack(
        [
            jnp.stack([hll, hly, hlx], -1),
            jnp.stack([hly, hyy, hyx], -1),
            jnp.stack([hlx, hyx, hxx], -1),
        ],
        -2,
    )
    g3 = jnp.stack([gl, gy, gx], -1)
    off = jnp.clip(-_solve33(H3, g3), -0.5, 0.5)

    step = float(1 << octave)
    xy = jnp.stack(
        [
            (x_i.astype(jnp.float32) + off[:, 2]) * step,
            (y_i.astype(jnp.float32) + off[:, 1]) * step,
        ],
        -1,
    )
    sigma = (
        sigma0
        * (2.0 ** ((l_i.astype(jnp.float32) + off[:, 0]) / n_scales))
        * step
    )
    return scores, xy, sigma, l_i, (y_i, x_i), mask


_DESC_Q = 26  # patch grid: 16x16 descriptor samples land on integer patch
# indices 5..20, the rotated grid (+-7.5*sqrt2) plus the gradient margin
# stays inside (features/sampling.py two-stage design).


def _orientations_and_desc(
    gauss, l_i, y_i, x_i, sigma_rel, mask, n_scales: int
):
    """(angle (K,), desc (K, 128)) from one octave's Gaussian stack.

    sigma_rel: keypoint sigma in THIS octave's pixel units.

    Gather-free (r4: per-sample jnp.take sampling held SIFT to 7.5 fps):
    each keypoint gets one axis-aligned _DESC_Q^2 patch at its scale spacing
    from its DoG layer's Gaussian (two MXU matmuls per layer, masked-summed
    over the n_scales candidate layers), gradients are central differences in
    patch space (scale-covariant aperture: +-1 patch unit = +-spacing px, vs
    the previous fixed +-1 px), and the rotated descriptor grid interpolates
    inside the small gradient patches (one batched einsum).
    """
    from ergo_uvo_tpu.features.sampling import extract_patches, sample_patch

    K = l_i.shape[0]
    spacing = 3.0 * sigma_rel / _PATCH * 2.0  # (K,) ~radius 3*sigma
    x_f = x_i.astype(jnp.float32)
    y_f = y_i.astype(jnp.float32)
    patches = jnp.zeros((K, _DESC_Q, _DESC_Q), gauss.dtype)
    for l in range(1, n_scales + 1):  # keypoints only sit on these layers
        p_l = extract_patches(gauss[l], x_f, y_f, spacing, _DESC_Q)
        patches = patches + jnp.where((l_i == l)[:, None, None], p_l, 0.0)

    # Central-difference gradients at interior patch indices 1.._DESC_Q-2.
    dxc = 0.5 * (patches[:, 1:-1, 2:] - patches[:, 1:-1, :-2])
    dyc = 0.5 * (patches[:, 2:, 1:-1] - patches[:, :-2, 1:-1])

    # ---- orientation: the un-rotated 16x16 grid = patch indices 5..20,
    # i.e. rows/cols 4..19 of the interior gradient patches.
    g1 = jnp.arange(_PATCH, dtype=jnp.float32) - (_PATCH - 1) / 2.0
    gy_, gx_ = jnp.meshgrid(g1, g1, indexing="ij")
    lo = (_DESC_Q - _PATCH) // 2 - 1  # = 4
    dx0 = dxc[:, lo:lo + _PATCH, lo:lo + _PATCH]
    dy0 = dyc[:, lo:lo + _PATCH, lo:lo + _PATCH]
    mag0 = jnp.sqrt(dx0 * dx0 + dy0 * dy0)
    th0 = jnp.arctan2(dy0, dx0)
    gw = jnp.exp(-(gx_**2 + gy_**2) / (2.0 * (_PATCH / 3.0) ** 2))
    # 36-bin histogram, soft-assigned.
    nb = 36
    b = (th0 + jnp.pi) / (2 * jnp.pi) * nb
    b0 = jnp.floor(b)
    fb = b - b0
    b0i = b0.astype(jnp.int32) % nb
    b1i = (b0i + 1) % nb
    wgt = (mag0 * gw[None]).reshape(K, -1)
    bins = jnp.arange(nb)
    onehot0 = (b0i.reshape(K, -1)[..., None] == bins).astype(jnp.float32)
    onehot1 = (b1i.reshape(K, -1)[..., None] == bins).astype(jnp.float32)
    hist = jnp.einsum("ks,ksb->kb", wgt * (1 - fb.reshape(K, -1)), onehot0)
    hist = hist + jnp.einsum("ks,ksb->kb", wgt * fb.reshape(K, -1), onehot1)
    # circular smooth x2
    for _ in range(2):
        hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, -1)
    angle = (peak.astype(jnp.float32) + 0.5) / nb * 2 * jnp.pi - jnp.pi

    # ---- descriptor: rotated 16x16 gradient grid, 4x4 cells x 8 bins.
    # Rotated positions interpolated INSIDE the small gradient patches:
    # patch index p maps to interior-gradient index p - 1, so the patch
    # center (_DESC_Q-1)/2 sits at (_DESC_Q-3)/2 in dxc/dyc coordinates.
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    rx = (ca[:, None, None] * gx_[None] - sa[:, None, None] * gy_[None])
    ry = (sa[:, None, None] * gx_[None] + ca[:, None, None] * gy_[None])
    c_int = (_DESC_Q - 3) / 2.0
    u = (c_int + ry).reshape(K, -1)
    v = (c_int + rx).reshape(K, -1)
    dx1 = sample_patch(dxc, u, v).reshape(K, _PATCH, _PATCH)
    dy1 = sample_patch(dyc, u, v).reshape(K, _PATCH, _PATCH)
    mag1 = (jnp.sqrt(dx1 * dx1 + dy1 * dy1) * gw[None]).reshape(K, -1)
    th1 = jnp.arctan2(dy1, dx1) - angle[:, None, None]
    bd = jnp.mod((th1 + jnp.pi) / (2 * jnp.pi) * _N_SPLITS, _N_SPLITS)
    bd0 = jnp.floor(bd)
    fd = (bd - bd0).reshape(K, -1)
    bd0i = bd0.astype(jnp.int32).reshape(K, -1) % _N_SPLITS
    bd1i = (bd0i + 1) % _N_SPLITS
    obins = jnp.arange(_N_SPLITS)
    w0 = (mag1 * (1 - fd))[..., None] * (bd0i[..., None] == obins)
    w1 = (mag1 * fd)[..., None] * (bd1i[..., None] == obins)
    contrib = (w0 + w1).reshape(K, _PATCH, _PATCH, _N_SPLITS)
    cells = (
        contrib.reshape(K, 4, 4, 4, 4, _N_SPLITS).sum(axis=(2, 4))
    )  # (K, 4, 4, 8)
    desc = cells.reshape(K, 128)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    return angle, jnp.where(mask[:, None], desc, 0.0)


def detect_and_describe_sift(
    img: jax.Array,
    max_keypoints: int = 512,
    n_octaves: int = 4,
    n_scales: int = 3,
    sigma0: float = 1.6,
    contrast_thresh: float = 0.03,
    edge_thresh: float = 10.0,
):
    """(Keypoints, (K, 128) descriptors); `laplacian` carries the angle."""
    octs = build_scale_space(img, n_octaves, n_scales, sigma0)
    per = []
    for o, (gauss, dog) in enumerate(octs):
        scores, xy, sigma, l_i, (y_i, x_i), mask = _octave_keypoints(
            dog, o, n_scales, sigma0, max_keypoints, contrast_thresh, edge_thresh
        )
        gauss = jax.lax.optimization_barrier(gauss)
        sigma_rel = sigma / float(1 << o)
        angle, desc = _orientations_and_desc(
            gauss, l_i, y_i, x_i, sigma_rel, mask, n_scales
        )
        per.append((jnp.where(mask, scores, -jnp.inf), xy, sigma, angle, mask, desc))

    scores = jnp.concatenate([p[0] for p in per])
    xy = jnp.concatenate([p[1] for p in per])
    sigma = jnp.concatenate([p[2] for p in per])
    ang = jnp.concatenate([p[3] for p in per])
    mask = jnp.concatenate([p[4] for p in per])
    desc = jnp.concatenate([p[5] for p in per])
    top_s, top_i = jax.lax.top_k(jnp.where(mask, scores, -jnp.inf), max_keypoints)
    top_m = jnp.isfinite(top_s)
    zero = jnp.zeros((max_keypoints,), img.dtype)
    kpts = Keypoints(
        xy=jnp.where(top_m[:, None], jnp.take(xy, top_i, axis=0), 0.0),
        scale=jnp.where(top_m, jnp.take(sigma, top_i), zero),
        score=jnp.where(top_m, top_s, zero),
        laplacian=jnp.where(top_m, jnp.take(ang, top_i), zero),
        mask=top_m,
    )
    d = jnp.where(top_m[:, None], jnp.take(desc, top_i, axis=0), 0.0)
    return kpts, d
