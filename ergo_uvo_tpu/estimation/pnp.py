"""Batched PnP RANSAC + Gauss-Newton refinement (the stereo motion solver).

TPU-native replacement for the reference's ``solvePnPRansac`` call
(visual_odometry.h:647-648: EPnP, 1000 iters, 1.0 px reprojection, 0.99
confidence).  Per SURVEY.md §7.2 step 5 the minimal solver is a batched
6-point DLT of the projection matrix (a 12x12 symmetric eigensolve per
hypothesis — batched and f32-stable) followed by orthonormalization; the
winning hypothesis is polished by fixed-iteration Gauss-Newton on SE(3) over
its inliers, which plays the role of OpenCV's final iterative refinement.

Convention: (R, t) map world (previous-left-camera) points into the current
camera: x_cam = R @ X + t — identical to OpenCV's rvec/tvec.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.estimation.robust import score_hypotheses
from ergo_uvo_tpu.estimation.sampling import sample_minimal_sets
from ergo_uvo_tpu.config import RANSAC
from ergo_uvo_tpu.geometry.rotations import project_to_so3, skew, so3_exp


class PnPResult(NamedTuple):
    R: jax.Array  # (3, 3)
    t: jax.Array  # (3,)
    inliers: jax.Array  # (N,) bool
    success: jax.Array  # scalar bool


def _dlt_projection(X: jax.Array, xn: jax.Array):
    """Batched DLT: 6 world points + normalized image points -> (R, t).

    X: (H, 6, 3); xn: (H, 6, 2) normalized coords.  Returns (H,3,3), (H,3).
    """
    Hh = X.shape[0]
    ones = jnp.ones_like(X[..., :1])
    Xh = jnp.concatenate([X, ones], -1)  # (H, 6, 4)
    z = jnp.zeros_like(Xh)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    rows_u = jnp.concatenate([Xh, z, -u * Xh], -1)  # (H, 6, 12)
    rows_v = jnp.concatenate([z, Xh, -v * Xh], -1)
    A = jnp.concatenate([rows_u, rows_v], -2)  # (H, 12, 12)
    AtA = jnp.einsum("hni,hnj->hij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[..., :, 0].reshape(Hh, 3, 4)
    M = p[..., :3]
    # Fix scale/sign: det(M) > 0 and unit-average row norm.
    detM = jnp.linalg.det(M)
    sign = jnp.where(detM < 0, -1.0, 1.0)
    scale = jnp.cbrt(jnp.abs(detM))
    safe = jnp.maximum(scale, 1e-12)
    M = M * (sign / safe)[..., None, None]
    t = p[..., 3] * (sign / safe)[..., None]
    R = project_to_so3(M)
    return R, t


def _reproj_error_sq(R, t, K, X, xy):
    """(..., N) squared pixel reprojection errors."""
    pc = jnp.einsum("...ij,nj->...ni", R, X) + t[..., None, :]
    z = pc[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = pc[..., 0] / safe_z
    yn = pc[..., 1] / safe_z
    u = xn * K[0, 0] + K[0, 2]
    v = yn * K[1, 1] + K[1, 2]
    err = (u - xy[..., 0]) ** 2 + (v - xy[..., 1]) ** 2
    # Points behind the camera can never be inliers.
    return jnp.where(z > 0, err, jnp.inf)


def gauss_newton_pnp(
    R0: jax.Array,
    t0: jax.Array,
    K: jax.Array,
    X: jax.Array,
    xy: jax.Array,
    weights: jax.Array,
    iters: int = 10,
):
    """Fixed-iteration GN on SE(3), minimizing weighted pixel reprojection.

    Left-multiplicative update: R <- exp(w) R, t <- exp(w) t + dt.
    """

    def step(_, state):
        R, t = state
        pc = X @ R.T + t  # (N, 3)
        z = jnp.maximum(pc[..., 2], 1e-6)
        inv_z = 1.0 / z
        xn = pc[..., 0] * inv_z
        yn = pc[..., 1] * inv_z
        fx, fy = K[0, 0], K[1, 1]
        ru = fx * xn + K[0, 2] - xy[..., 0]
        rv = fy * yn + K[1, 2] - xy[..., 1]
        r = jnp.stack([ru, rv], -1)  # (N, 2)

        # d(pixel)/d(pc): (N, 2, 3)
        zeros = jnp.zeros_like(inv_z)
        J_proj = jnp.stack(
            [
                jnp.stack([fx * inv_z, zeros, -fx * xn * inv_z], -1),
                jnp.stack([zeros, fy * inv_z, -fy * yn * inv_z], -1),
            ],
            -2,
        )
        # d(pc)/d(xi): [I | -[pc]_x] for xi = (dt, w).
        J_pc = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), (*pc.shape, 3)), -skew(pc)],
            -1,
        )  # (N, 3, 6)
        J = J_proj @ J_pc  # (N, 2, 6)

        w = weights[..., None]
        JtJ = jnp.einsum("nai,naj->ij", J * w[..., None], J)
        Jtr = jnp.einsum("nai,na->i", J * w[..., None], r)
        # Levenberg damping keeps rank-deficient (few-inlier) systems sane.
        damped = JtJ + 1e-6 * jnp.eye(6, dtype=R.dtype)
        xi = -jnp.linalg.solve(damped, Jtr)
        dR = so3_exp(xi[3:])
        return dR @ R, (dR @ t) + xi[:3]

    return jax.lax.fori_loop(0, iters, step, (R0, t0))


def solve_pnp_ransac(
    key: jax.Array,
    X: jax.Array,  # (N, 3) world points (prev-left camera frame)
    xy: jax.Array,  # (N, 2) current-frame pixels
    mask: jax.Array,  # (N,) validity
    K: jax.Array,
    reprojection_error: float = 1.0,
    num_hypotheses: int = 512,
    min_inliers: int = 5,
    refine_iters: int = 8,
    set_size: int = 8,
    polish_rounds: int = 3,
) -> PnPResult:
    """solvePnPRansac equivalent: hypothesize-DLT, score, LO-polish.

    `reprojection_error` is the pixel inlier gate (stereo config
    `reprojection_error: 1.0`, stereo_VO_parameters.yaml:29).

    Hypotheses use `set_size`-point least-squares DLT (8 > the 6-point minimum:
    an exact-fit minimal solve amplifies keypoint/3D noise so much that even
    the best hypothesis captures few inliers).  The winner then goes through
    `polish_rounds` of LO-RANSAC-style (Chum et al.) local optimization —
    Gauss-Newton on the current inlier set, re-gate inliers, keep if the
    consensus grew — which is what makes the small-motion stereo regime (large
    depth / tiny baseline per frame) converge to the true basin.
    """
    xn = jnp.stack(
        [(xy[..., 0] - K[0, 2]) / K[0, 0], (xy[..., 1] - K[1, 2]) / K[1, 1]], -1
    )
    idx, sets_valid = sample_minimal_sets(key, mask, num_hypotheses, set_size)
    Rs, ts = _dlt_projection(X[idx], xn[idx])
    finite = jnp.all(jnp.isfinite(Rs.reshape(Rs.shape[0], -1)), -1) & jnp.all(
        jnp.isfinite(ts), -1
    )
    r2 = _reproj_error_sq(Rs, ts, K, X, xy)  # (H, N)
    best, inliers = score_hypotheses(
        r2, mask, sets_valid & finite, RANSAC, reprojection_error,
        model_points=set_size,
    )

    thr2 = reprojection_error * reprojection_error

    def polish(carry, _):
        R, t, inl = carry
        R2, t2 = gauss_newton_pnp(R, t, K, X, xy, inl.astype(X.dtype), refine_iters)
        r2n = _reproj_error_sq(R2, t2, K, X, xy)
        inl2 = mask & (r2n <= thr2)
        grew = jnp.sum(inl2) >= jnp.sum(inl)
        R = jnp.where(grew, R2, R)
        t = jnp.where(grew, t2, t)
        inl = jnp.where(grew, inl2, inl)
        return (R, t, inl), None

    (R_out, t_out, inl_out), _ = jax.lax.scan(
        polish, (Rs[best], ts[best], inliers), None, length=polish_rounds
    )
    success = jnp.sum(inl_out.astype(jnp.int32)) >= min_inliers
    return PnPResult(R=R_out, t=t_out, inliers=inl_out, success=success)
