"""ORB — FAST-9 pyramid detector + oriented BRIEF binary descriptor.

TPU-native implementation of the second branch of the reference's
``detect_features`` dispatch (``cv::ORB::create(10000, 1.2, 8)``,
VO_utility.cpp:96-99), re-designed per SURVEY.md §7.1:

  * FAST-9 segment test as pure static-slice arithmetic: the 16 Bresenham
    circle taps become 16 shifted views of the padded image, the
    9-contiguous run test is a fixed cascade of ANDs/ORs on the VPU;
  * score = OpenCV's "sum over the dominant arc of |diff| - t" consensus
    proxy, 3x3 NMS via `reduce_window`, fixed top-K per level + global merge;
  * 8-level 1.2x image pyramid with static shapes (`jax.image.resize`);
  * orientation by intensity centroid over a radius-15 disc (Rublee et al.
    §4.1), sampled with one batched bilinear gather per level set;
  * BRIEF-256 with a deterministic Gaussian test pattern (sigma = patch/5,
    the original BRIEF G-II layout) rotated by the keypoint angle.  The
    pattern is *generated*, not OpenCV's learned bit table, so descriptors
    are statistically — not bitwise — comparable (SURVEY.md §4 tolerance-band
    parity; no xfeatures2d golden exists for SURF either).

Binary descriptors are carried as (K, 256) float32 in {0, 1}: for bit
vectors, squared L2 equals Hamming distance, so the MXU matmul matcher
(features/matcher.py) doubles as the reference's NORM_HAMMING brute-force
path with zero extra code — pass `binary=True` for Hamming-scale ratio tests.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ergo_uvo_tpu.features.detector import Keypoints

# FAST Bresenham circle, radius 3, OpenCV tap order (dx, dy).
_CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
PATCH = 31  # orientation/BRIEF patch size
_HALF = PATCH // 2
# Interior gate for detection: the steered-BRIEF sampling patch (_BRIEF_Q=45
# grid, half extent 22 level-pixels > _HALF=15) must fit inside the image —
# the hat-weight sampler returns ZERO outside it, so an under-gated keypoint
# would compare test intensities against 0 and flip bits (ADVICE r4).
_BRIEF_MARGIN = 23  # ceil(_HALF * sqrt(2)) + 1; == _BRIEF_Q // 2 + 1


def fast_score(
    img: jax.Array, threshold: float = 20.0, margin: int = _HALF
) -> jax.Array:
    """(H, W) FAST-9 corner score map (0 where not a corner).

    Score: sum of |intensity difference| - threshold over the brighter/darker
    arc — OpenCV's cornerScore consensus, evaluated on the full arc rather
    than per-start maximization (a monotone proxy that preserves NMS order).

    `margin` gates keypoints whose descriptor support would leave the image:
    the steered-BRIEF patch is sampled on a ``_BRIEF_Q``-wide grid (half
    extent 22 px at this level's scale, features/sampling.py returns ZERO
    outside the image), so detect_orb passes ``_BRIEF_MARGIN`` = 23 rather
    than the bare orientation-patch half-width (ADVICE r4).
    """
    h, w = img.shape
    pad = jnp.pad(img, 3, mode="edge")

    def tap(dx, dy):
        return jax.lax.slice(pad, [3 + dy, 3 + dx], [3 + dy + h, 3 + dx + w])

    circ = jnp.stack([tap(dx, dy) for dx, dy in _CIRCLE])  # (16, H, W)
    diff = circ - img[None]
    bright = diff > threshold
    dark = diff < -threshold

    def contiguous9(m):
        mm = jnp.concatenate([m, m[:8]], 0)  # wrap-around runs
        acc = jnp.zeros_like(m[0])
        for s in range(16):
            run = mm[s]
            for k in range(1, 9):
                run = run & mm[s + k]
            acc = acc | run
        return acc

    is_corner = contiguous9(bright) | contiguous9(dark)
    score_b = jnp.sum(jnp.where(bright, diff - threshold, 0.0), axis=0)
    score_d = jnp.sum(jnp.where(dark, -diff - threshold, 0.0), axis=0)
    score = jnp.maximum(score_b, score_d)
    # Border margin: the full BRIEF/orientation patch must fit.
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (
        (ys >= margin) & (ys < h - margin) & (xs >= margin) & (xs < w - margin)
    )
    return jnp.where(is_corner & interior, score, 0.0)


def _level_shapes(h: int, w: int, n_levels: int, scale: float):
    out = []
    for lvl in range(n_levels):
        f = scale**lvl
        out.append((max(int(round(h / f)), PATCH + 2), max(int(round(w / f)), PATCH + 2)))
    return out


def detect_orb(
    img: jax.Array,
    max_keypoints: int = 512,
    threshold: float = 20.0,
    n_levels: int = 8,
    scale_factor: float = 1.2,
) -> Keypoints:
    """FAST-9 keypoints over a 1.2x pyramid; fixed-K with validity mask.

    `laplacian` carries the orientation angle (radians) — ORB has no
    Laplacian sign; the slot keeps the Keypoints container uniform.
    """
    h, w = img.shape
    shapes = _level_shapes(h, w, n_levels, scale_factor)
    per_level = []
    level_img = img
    for lvl, (lh, lw) in enumerate(shapes):
        if (lh, lw) != level_img.shape:
            # Matmul-based resize (features/sampling.resize_bilinear): MXU
            # path + axon-TPU scan-fault workaround (see its docstring).
            from ergo_uvo_tpu.features.sampling import resize_bilinear

            level_img = resize_bilinear(img, lh, lw)
        score = fast_score(level_img, threshold, margin=_BRIEF_MARGIN)
        # 3x3 NMS.
        nmax = jax.lax.reduce_window(
            score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
        )
        peak = (score >= nmax) & (score > 0)
        flat = jnp.where(peak, score, -jnp.inf).reshape(-1)
        k = min(max_keypoints, flat.shape[0])
        scores, idx = jax.lax.top_k(flat, k)
        if k < max_keypoints:
            scores = jnp.pad(scores, (0, max_keypoints - k), constant_values=-jnp.inf)
            idx = jnp.pad(idx, (0, max_keypoints - k))
        yy = (idx // lw).astype(jnp.float32)
        xx = (idx % lw).astype(jnp.float32)
        mask = jnp.isfinite(scores)
        f = scale_factor**lvl
        xy = jnp.stack([xx, yy], -1) * f
        sigma = jnp.full((max_keypoints,), f, img.dtype)
        # Orientation: intensity-centroid moments as two whole-image convs
        # (MXU) read at the integer NMS peaks — replaces K x 31^2 bilinear
        # gathers per level (r4: gather sampling held ORB to 7.6 fps).
        ang = _orientations(level_img, idx)
        per_level.append((jnp.where(mask, scores, -jnp.inf), xy, sigma, ang, mask))

    scores = jnp.concatenate([p[0] for p in per_level])
    xy = jnp.concatenate([p[1] for p in per_level])
    sigma = jnp.concatenate([p[2] for p in per_level])
    ang = jnp.concatenate([p[3] for p in per_level])
    mask = jnp.concatenate([p[4] for p in per_level])
    top_scores, top_idx = jax.lax.top_k(jnp.where(mask, scores, -jnp.inf), max_keypoints)
    top_mask = jnp.isfinite(top_scores)
    zero = jnp.zeros((max_keypoints,), img.dtype)
    return Keypoints(
        xy=jnp.where(top_mask[:, None], jnp.take(xy, top_idx, axis=0), 0.0),
        scale=jnp.where(top_mask, jnp.take(sigma, top_idx), zero),
        score=jnp.where(top_mask, top_scores, zero),
        laplacian=jnp.where(top_mask, jnp.take(ang, top_idx), zero),
        mask=top_mask,
    )


def _disc_offsets():
    g = np.arange(PATCH) - _HALF
    gy, gx = np.meshgrid(g, g, indexing="ij")
    disc = (gx**2 + gy**2) <= _HALF**2
    return (
        jnp.asarray(gx, jnp.float32),
        jnp.asarray(gy, jnp.float32),
        jnp.asarray(disc, jnp.float32),
    )


def _orientations(img: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """Intensity-centroid angle at integer pixel indices (Rublee et al. §4.1).

    The disc moments m10/m01 are correlations of the image with the static
    kernels gx*disc / gy*disc — two whole-image convs on the MXU
    (features/sampling.py design note) read back at the K peak positions,
    instead of K x PATCH^2 serialized gathers.
    """
    from ergo_uvo_tpu.features.sampling import conv2d_same

    gx, gy, disc = _disc_offsets()
    m10 = conv2d_same(img, gx * disc)
    m01 = conv2d_same(img, gy * disc)
    return jnp.arctan2(
        jnp.take(m01.reshape(-1), flat_idx), jnp.take(m10.reshape(-1), flat_idx)
    )


def _brief_pattern(n_bits: int = 256, seed: int = 7) -> np.ndarray:
    """(n_bits, 4) test pattern (x1, y1, x2, y2), BRIEF G-II: iid Gaussian
    with sigma = PATCH/5, clipped to the patch. Deterministic (fixed seed)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, PATCH / 5.0, (n_bits, 4))
    return np.clip(pts, -_HALF + 1, _HALF - 1).astype(np.float32)


_PATTERN = _brief_pattern()


_BRIEF_Q = 45  # patch grid: covers the rotated pattern (+-HALF*sqrt2 ~ 21.2)


def describe_orb(img: jax.Array, kpts: Keypoints, n_bits: int = 256) -> jax.Array:
    """(K, 256) float32 {0,1} rotated-BRIEF bits; invalid rows -> 0.

    The keypoint angle (stored in `laplacian`) rotates the test pattern
    (steered BRIEF); sampling spacing follows the keypoint's pyramid scale.

    Gather-free two-stage sampling (features/sampling.py): an axis-aligned
    45x45 patch per keypoint at its scale spacing (two MXU matmuls), then the
    rotated test positions interpolated INSIDE the patch (one small batched
    einsum) — replaces 2*K*n_bits full-image gathers.  Samples compose two
    bilinear interpolations instead of one, a sub-pixel smoothing that only
    perturbs bits at near-tie tests (descriptors are statistical parity,
    module docstring).
    """
    from ergo_uvo_tpu.features.sampling import extract_patches, sample_patch

    pat = jnp.asarray(_PATTERN[:n_bits])  # (B, 4)
    ang = kpts.laplacian
    c, s = jnp.cos(ang), jnp.sin(ang)  # (K,)

    patches = extract_patches(
        img, kpts.xy[:, 0], kpts.xy[:, 1], kpts.scale, _BRIEF_Q
    )
    center = (_BRIEF_Q - 1) / 2.0

    def rotate(px, py):
        # (K, B) rotated offsets in PATCH units (spacing already encodes the
        # keypoint scale).
        rx = c[:, None] * px[None] - s[:, None] * py[None]
        ry = s[:, None] * px[None] + c[:, None] * py[None]
        return rx, ry

    x1, y1 = rotate(pat[:, 0], pat[:, 1])
    x2, y2 = rotate(pat[:, 2], pat[:, 3])
    i1 = sample_patch(patches, center + y1, center + x1)
    i2 = sample_patch(patches, center + y2, center + x2)
    bits = (i1 < i2).astype(jnp.float32)
    return jnp.where(kpts.mask[:, None], bits, 0.0)
