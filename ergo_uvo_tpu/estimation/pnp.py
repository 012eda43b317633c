"""Batched PnP RANSAC + Gauss-Newton refinement (the stereo motion solver).

TPU-native replacement for the reference's ``solvePnPRansac`` call
(visual_odometry.h:647-648: EPnP, 1000 iters, 1.0 px reprojection, 0.99
confidence).  Per SURVEY.md §7.2 step 5 the minimal solver is batched P3P
(estimation/p3p.py — planar-safe, unlike projection-matrix DLT, which is kept
below as `_dlt_projection` for well-conditioned non-planar least-squares
fits); the winning hypothesis is polished by fixed-iteration Gauss-Newton on
SE(3) over its inliers, which plays the role of OpenCV's final iterative
refinement.

Convention: (R, t) map world (previous-left-camera) points into the current
camera: x_cam = R @ X + t — identical to OpenCV's rvec/tvec.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.estimation.p3p import p3p
from ergo_uvo_tpu.estimation.robust import score_hypotheses
from ergo_uvo_tpu.estimation.sampling import sample_minimal_sets
from ergo_uvo_tpu.config import RANSAC
from ergo_uvo_tpu.geometry.linalg import polar_so3, smallest_eigvec
from ergo_uvo_tpu.geometry.rotations import skew, so3_exp


class PnPResult(NamedTuple):
    R: jax.Array  # (3, 3)
    t: jax.Array  # (3,)
    inliers: jax.Array  # (N,) bool
    success: jax.Array  # scalar bool


def _dlt_projection(X_raw: jax.Array, xn: jax.Array):
    """Batched DLT: m world points + normalized image points -> (R, t).

    X_raw: (H, m, 3); xn: (H, m, 2) normalized coords.  Returns (H,3,3), (H,3).

    World points are Hartley-normalized per hypothesis (centroid to origin,
    RMS radius sqrt(3)) before building the 12x12 normal matrix — without
    this, f32 null-space extraction on raw coordinates loses the smallest
    eigenvector to the ~1e7 condition number.
    """
    Hh = X_raw.shape[0]
    mean = jnp.mean(X_raw, axis=-2, keepdims=True)
    Xc = X_raw - mean
    rms = jnp.sqrt(jnp.mean(jnp.sum(Xc * Xc, -1), -1, keepdims=True))
    s = jnp.sqrt(3.0) / jnp.maximum(rms, 1e-9)  # (H, 1)
    X = Xc * s[..., None]
    ones = jnp.ones_like(X[..., :1])
    Xh = jnp.concatenate([X, ones], -1)  # (H, m, 4)
    z = jnp.zeros_like(Xh)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    rows_u = jnp.concatenate([Xh, z, -u * Xh], -1)  # (H, 6, 12)
    rows_v = jnp.concatenate([z, Xh, -v * Xh], -1)
    A = jnp.concatenate([rows_u, rows_v], -2)  # (H, 12, 12)
    AtA = jnp.einsum("hni,hnj->hij", A, A)
    # Batched Jacobi null-space extraction (see geometry/linalg.py — much
    # faster than XLA's batched eigh for many 12x12 systems on TPU).
    p = smallest_eigvec(AtA).reshape(Hh, 3, 4)
    # Undo the world normalization: P [X;1] = P' [s(X-mean);1]
    #   => M = s M',  t = t' - s M' mean.
    Mp = p[..., :3]
    tp = p[..., 3]
    M = Mp * s[..., None]
    t = tp - (Mp @ (mean[..., 0, :, None] * s[..., None]))[..., 0]
    p = jnp.concatenate([M, t[..., None]], -1)
    M = p[..., :3]
    # Fix scale/sign: det(M) > 0 and unit-average row norm.
    detM = jnp.linalg.det(M)
    sign = jnp.where(detM < 0, -1.0, 1.0)
    scale = jnp.cbrt(jnp.abs(detM))
    safe = jnp.maximum(scale, 1e-12)
    M = M * (sign / safe)[..., None, None]
    t = p[..., 3] * (sign / safe)[..., None]
    R = polar_so3(M)
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
    polish_rounds: int = 3,
) -> PnPResult:
    """solvePnPRansac equivalent: batched P3P hypotheses, score, LO-polish.

    `reprojection_error` is the pixel inlier gate (stereo config
    `reprojection_error: 1.0`, stereo_VO_parameters.yaml:29).

    Hypotheses come from the closed-form P3P solver (estimation/p3p.py) — the
    projection-matrix DLT is degenerate for the near-coplanar seafloor clouds
    this pipeline triangulates, so minimal 3-point sets are solved exactly and
    every (root, plane, branch) candidate is scored; RANSAC consensus
    disambiguates.  The winner then goes through `polish_rounds` of
    LO-RANSAC-style (Chum et al.) local optimization — Gauss-Newton on the
    current inlier set, re-gate inliers, keep if the consensus grew — playing
    the role of OpenCV's final iterative refinement.
    """
    xn = jnp.stack(
        [(xy[..., 0] - K[0, 2]) / K[0, 0], (xy[..., 1] - K[1, 2]) / K[1, 1]], -1
    )
    idx, sets_valid = sample_minimal_sets(key, mask, num_hypotheses, 3)
    bearings = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], -1)
    bearings = bearings / jnp.linalg.norm(bearings, axis=-1, keepdims=True)
    Rs, ts, cand_valid = p3p(X[idx], bearings[idx])  # (H, 12, ...)
    Rs = Rs.reshape(-1, 3, 3)
    ts = ts.reshape(-1, 3)
    cand_valid = (cand_valid & sets_valid[:, None]).reshape(-1)
    finite = jnp.all(jnp.isfinite(Rs.reshape(Rs.shape[0], -1)), -1) & jnp.all(
        jnp.isfinite(ts), -1
    )
    r2 = _reproj_error_sq(Rs, ts, K, X, xy)  # (H*12, N)
    best, inliers = score_hypotheses(
        r2, mask, cand_valid & finite, RANSAC, reprojection_error,
        model_points=3,
    )

    thr2 = reprojection_error * reprojection_error

    # Cauchy-IRLS refinement over ALL masked correspondences (not just the
    # hard-gated inlier set — a hard gate at ~noise level discards half the
    # good measurements and biases the fit; a smooth robust loss is both more
    # accurate and TPU-friendlier).  Masked slots may hold garbage
    # coordinates, which would poison the normal equations through 0 * inf:
    # sanitize them first.
    X_safe = jnp.where(mask[:, None], X, jnp.asarray([0.0, 0.0, 1.0], X.dtype))
    xy_safe = jnp.where(mask[:, None], xy, 0.0)
    delta = 0.7 * reprojection_error
    support = 20.0 * reprojection_error

    def irls_round(carry, _):
        R, t = carry
        r2 = _reproj_error_sq(R, t, K, X_safe, xy_safe)
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        w = 1.0 / (1.0 + (r / delta) ** 2)
        w = jnp.where(mask & jnp.isfinite(r2) & (r < support), w, 0.0)
        R, t = gauss_newton_pnp(R, t, K, X_safe, xy_safe, w, refine_iters // 2)
        return (R, t), None

    (R_ref, t_ref), _ = jax.lax.scan(
        irls_round, (Rs[best], ts[best]), None, length=2 * polish_rounds + 2
    )
    # Accept the refinement unless it diverged.  NOTE: do NOT require the
    # refined consensus to beat the RANSAC winner's count — the winner is the
    # argmax of threshold-counting and overfits the gate, so the (more
    # accurate) robust-loss minimizer often counts a few fewer 1px-inliers.
    r2_ref = _reproj_error_sq(R_ref, t_ref, K, X_safe, xy_safe)
    inl_ref = mask & (r2_ref <= thr2)
    better = (
        jnp.all(jnp.isfinite(R_ref)) & jnp.all(jnp.isfinite(t_ref))
        & (2 * jnp.sum(inl_ref) >= jnp.sum(inliers))
    )
    R_out = jnp.where(better, R_ref, Rs[best])
    t_out = jnp.where(better, t_ref, ts[best])
    inl_out = jnp.where(better, inl_ref, inliers)
    success = jnp.sum(inl_out.astype(jnp.int32)) >= min_inliers
    return PnPResult(R=R_out, t=t_out, inliers=inl_out, success=success)
