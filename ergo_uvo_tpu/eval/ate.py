"""ATE / RPE trajectory metrics + trajectory integration from VO outputs.

NumPy host-side tooling (evaluation is not a hot path).  ATE follows the
standard TUM-benchmark definition: RMSE of position residuals after an
(optionally scaled) Umeyama alignment; RPE is the RMSE of relative-pose
translation errors over a fixed frame delta.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform aligning src -> dst: (s, R, t)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(
    est_positions: np.ndarray,
    gt_positions: np.ndarray,
    align: bool = True,
    with_scale: bool = False,
) -> float:
    """Absolute trajectory error (RMSE, meters)."""
    est = np.asarray(est_positions, np.float64)
    gt = np.asarray(gt_positions, np.float64)
    if align:
        s, R, t = umeyama_alignment(est, gt, with_scale)
        est = (s * (R @ est.T)).T + t
    return float(np.sqrt(((est - gt) ** 2).sum(-1).mean()))


def rpe_rmse(est_positions, gt_positions, delta: int = 1) -> float:
    """Relative pose error on translation over `delta`-frame steps."""
    est = np.asarray(est_positions, np.float64)
    gt = np.asarray(gt_positions, np.float64)
    de = est[delta:] - est[:-delta]
    dg = gt[delta:] - gt[:-delta]
    return float(np.sqrt(((de - dg) ** 2).sum(-1).mean()))


def velocity_rmse(est_vel, gt_vel, valid=None) -> float:
    est = np.asarray(est_vel, np.float64)
    gt = np.asarray(gt_vel, np.float64)
    if valid is not None:
        valid = np.asarray(valid, bool)
        est, gt = est[valid], gt[valid]
    if len(est) == 0:
        return float("inf")
    return float(np.sqrt(((est - gt) ** 2).sum(-1).mean()))


def integrate_mono_trajectory(
    velocities: np.ndarray,
    rotations_rel: np.ndarray,
    timestamps: np.ndarray,
    published: np.ndarray,
    validity: np.ndarray | None = None,
):
    """Integrate per-frame VO outputs into a world trajectory.

    The mono output velocity is the camera displacement in the PREVIOUS camera
    frame / dt (mono_output_computation, visual_odometry.h:126-140), and
    R_rel maps prev-cam -> curr-cam coords.  Orientation is composed as
    R_wc[k] = R_rel[k] @ R_wc[k-1]; position advances by the velocity rotated
    into the world frame.  Unpublished frames hold the pose (frame skipped);
    invalid frames still integrate — the reference's constant-motion
    semantics (stale pose + stale SF, visual_odometry.h:342-344).  When
    `validity` is provided, `dead_reckoned` is attached to the returned array
    (``pos.dead_reckoned``-style second return) so consumers can see which
    positions rest on held state rather than a fresh estimate.

    Returns `pos (n, 3)`; with `validity` given returns `(pos, dead_reckoned
    (n,) bool)` where True marks frames integrated under constant-motion
    hold.
    """
    n = len(velocities)
    pos = np.zeros((n, 3))
    dead = np.zeros(n, bool)
    R_wc = np.eye(3)
    prev_t = timestamps[0]
    p = np.zeros(3)
    for k in range(n):
        dt = timestamps[k] - prev_t
        if published[k]:
            disp_prevcam = np.asarray(velocities[k]) * dt
            p = p + R_wc.T @ disp_prevcam
            R_wc = np.asarray(rotations_rel[k]) @ R_wc
            if validity is not None and not validity[k]:
                dead[k] = True
        prev_t = timestamps[k]
        pos[k] = p
    if validity is not None:
        return pos, dead
    return pos
