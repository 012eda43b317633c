"""Batched two-view triangulation and 3D-point gating — fixed shape + masks.

TPU-native re-design of the reference's triangulation path:
  * ``cv::triangulatePoints`` + dehomogenize (visual_odometry.h:354-355,
    ``convert_from_homogeneous_coords`` VO_utility.cpp:71-83),
  * reprojection + depth gating (``extract_3Dpoints`` VO_utility.cpp:188-237),
  * per-point reprojection errors (``reproject_errors`` VO_utility.cpp:632-651),
  * cheirality transform (``convert_3Dpoints_camera`` VO_utility.cpp:46-63).

Instead of OpenCV's homogeneous 4x4 SVD per point, triangulation uses the
inhomogeneous DLT: fix w=1 and solve the 3x3 normal equations in closed form —
fully vectorized over N points, no per-point SVD, MXU/VPU friendly.  (Points at
infinity are not representable, but the pipeline's depth gates discard such
points anyway.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.geometry.stats import masked_mean_and_variance


def triangulate_points(
    P1: jax.Array, P2: jax.Array, pts1: jax.Array, pts2: jax.Array
) -> jax.Array:
    """Linear triangulation of N correspondences.

    Args:
      P1, P2: (3, 4) projection matrices (pixel units, i.e. K [R|t]).
      pts1, pts2: (N, 2) pixel coordinates in each view.

    Returns:
      (N, 3) world points (the frame in which P1/P2 are expressed).
    """
    # DLT rows: for each view, u*(p3.X) - (p1.X) = 0 ; v*(p3.X) - (p2.X) = 0.
    def rows(P, pts):
        # (N, 2, 4): [u*P[2] - P[0], v*P[2] - P[1]]
        u = pts[..., 0:1]
        v = pts[..., 1:2]
        r0 = u * P[2][None, :] - P[0][None, :]
        r1 = v * P[2][None, :] - P[1][None, :]
        return jnp.stack([r0, r1], axis=1)

    A = jnp.concatenate([rows(P1, pts1), rows(P2, pts2)], axis=1)  # (N, 4, 4)
    # Inhomogeneous solve: A[:, :, :3] X = -A[:, :, 3]
    M = A[..., :3]
    b = -A[..., 3]
    AtA = jnp.einsum("nij,nik->njk", M, M)  # (N, 3, 3)
    Atb = jnp.einsum("nij,ni->nj", M, b)  # (N, 3)
    # Closed-form 3x3 solve via adjugate (Cramer) — branch-free, batched.
    return _solve33(AtA, Atb)


def _solve33(A: jax.Array, b: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Batched 3x3 linear solve via the adjugate; singular systems -> 0."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], -1),
            jnp.stack([c01, c11, c21], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        -2,
    )
    safe_det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    return (adj @ b[..., None])[..., 0] / safe_det[..., None]


def reprojection_errors(
    K: jax.Array, R: jax.Array, t: jax.Array, points3d: jax.Array, pts2d: jax.Array
) -> jax.Array:
    """Per-point pixel reprojection error (zero distortion).

    Mirrors ``reproject_errors`` (VO_utility.cpp:632-651): project world points
    through K[R|t] and take the Euclidean pixel distance to the observations.
    """
    pc = points3d @ R.T + t[None, :]
    z = pc[..., 2]
    eps = 1e-9
    safe_z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    xy = pc[..., :2] / safe_z[..., None]
    uv = jnp.stack(
        [xy[..., 0] * K[0, 0] + xy[..., 1] * K[0, 1] + K[0, 2],
         xy[..., 1] * K[1, 1] + K[1, 2]],
        -1,
    )
    return jnp.linalg.norm(uv - pts2d, axis=-1)


def filter_3d_points(
    points3d: jax.Array,
    mask: jax.Array,
    K1: jax.Array,
    R1: jax.Array,
    t1: jax.Array,
    K2: jax.Array,
    R2: jax.Array,
    t2: jax.Array,
    pts1: jax.Array,
    pts2: jax.Array,
    reprojection_tolerance: float,
    sigma_gate: float = 3.0,
    min_points: int = 0,
):
    """Masked re-implementation of ``extract_3Dpoints`` (VO_utility.cpp:188-237).

    Two gates, applied to already-valid lanes:
      1. mean two-view reprojection error < tolerance AND depth (view-1 Z) > 0;
      2. view-1 Z within mean ± `sigma_gate`·σ of the gate-1 survivors.

    With `min_points` > 0 the reference's short-circuits apply: gate 1 only
    runs when >= min_points candidates exist (VO_utility.cpp:203) and gate 2
    only when gate 1 kept >= min_points (VO_utility.cpp:222) — otherwise the
    output mask is empty.

    Returns (mask_out, mean_reproj_err) with `mask_out ⊆ mask`; no compaction —
    downstream consumers stay fixed-shape.
    """
    e1 = reprojection_errors(K1, R1, t1, points3d, pts1)
    e2 = reprojection_errors(K2, R2, t2, points3d, pts2)
    mean_err = 0.5 * (e1 + e2)
    z = (points3d @ R1.T + t1[None, :])[..., 2]
    gate1 = mask & (mean_err < reprojection_tolerance) & (z > 0)
    if min_points > 0:
        gate1 = gate1 & (jnp.sum(mask.astype(jnp.int32)) >= min_points)
    z_mean, z_var = masked_mean_and_variance(z, gate1)
    z_std = jnp.sqrt(jnp.maximum(z_var, 0.0))
    gate2 = gate1 & (jnp.abs(z - z_mean) <= sigma_gate * z_std)
    if min_points > 0:
        gate2 = gate2 & (jnp.sum(gate1.astype(jnp.int32)) >= min_points)
    return gate2, mean_err


def transform_points(R: jax.Array, t: jax.Array, points: jax.Array) -> jax.Array:
    """Apply x' = R x + t to (N, 3) points."""
    return points @ R.T + t[None, :]


def cheirality_mask(
    R: jax.Array, t: jax.Array, points: jax.Array, max_depth: float | None = None
) -> jax.Array:
    """Mask of points with positive depth in the frame defined by (R, t).

    The reference's ``convert_3Dpoints_camera`` (VO_utility.cpp:46-63) filters
    by Z > 0 in the *target* frame but keeps the *source*-frame coordinates of
    survivors; callers here combine this mask with whichever coordinates they
    need, preserving those semantics without compaction.  With `max_depth`
    this also covers the homography candidate vote's 0 < Z < HOMOGRAPHY_DISTANCE
    gate (``recover_pose_homography`` VO_utility.cpp:598-607).
    """
    z = (points @ R.T + t[None, :])[..., 2]
    m = z > 0
    if max_depth is not None:
        m = m & (z < max_depth)
    return m
