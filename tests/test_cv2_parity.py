"""OpenCV golden-parity tests for the estimation stack (VERDICT r1 #4).

cv2 (with calib3d) ships in the environment, so the exact backends the
reference calls — findEssentialMat + recoverPose (VO_utility.cpp:147-149),
findHomography + decomposeHomographyMat (:152-154, :581-624), and
solvePnPRansac (visual_odometry.h:647-648) — are compared against the batched
JAX re-designs on controlled synthetic correspondences with noise + outliers.
Parity is tolerance-band (SURVEY.md §4): same pose up to noise-level error,
and LMEDS/RANSAC inlier masks that agree on the overwhelming majority of
points.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergo_uvo_tpu.config import LMEDS, RANSAC
from ergo_uvo_tpu.estimation.essential import (
    _normalized,
    find_essential,
    recover_pose_from_essential,
)
from ergo_uvo_tpu.estimation.homography import find_homography, recover_pose_homography
from ergo_uvo_tpu.estimation.pnp import solve_pnp_ransac
from ergo_uvo_tpu.estimation.sampling import hypotheses_for_confidence

K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1.0]])


def rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    Kx = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * Kx + (1 - np.cos(angle)) * Kx @ Kx


def project(X, R, t):
    pc = X @ R.T + t
    return pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]


def angle_deg(R_a, R_b):
    c = (np.trace(R_a.T @ R_b) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def dir_angle_deg(a, b):
    c = abs(np.dot(a, b)) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
    return np.degrees(np.arccos(np.clip(c, 0, 1)))


def make_two_view(n=150, outlier_frac=0.3, noise=0.5, planar=False, seed=0):
    """General or planar scene, known relative pose x2 = R x1 + t."""
    rng = np.random.default_rng(seed)
    if planar:
        X = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.full(n, 6.0)], -1
        )
    else:
        X = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], -1
        )
    R = rot([0.2, 1.0, 0.1], 0.08)
    t = np.array([0.4, 0.05, 0.1])
    uv1 = project(X, np.eye(3), np.zeros(3))
    uv2 = project(X, R, t)
    uv1 += noise * rng.standard_normal((n, 2))
    uv2 += noise * rng.standard_normal((n, 2))
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    uv2[out_idx] = rng.uniform([0, 0], [640, 480], (n_out, 2))
    is_outlier = np.zeros(n, bool)
    is_outlier[out_idx] = True
    return (
        uv1.astype(np.float32),
        uv2.astype(np.float32),
        R,
        t,
        X,
        is_outlier,
    )


class TestEssentialParity:
    @pytest.mark.parametrize("method_name,method", [("lmeds", LMEDS), ("ransac", RANSAC)])
    def test_pose_matches_cv2_and_gt(self, method_name, method):
        uv1, uv2, R_gt, t_gt, _, is_out = make_two_view(seed=1)
        mask = np.ones(len(uv1), bool)

        cv_method = cv2.LMEDS if method == LMEDS else cv2.RANSAC
        E_cv, m_cv = cv2.findEssentialMat(
            uv1, uv2, K, method=cv_method, prob=0.99, threshold=1.0
        )
        _, R_cv, t_cv, m_rp = cv2.recoverPose(E_cv, uv1, uv2, K, mask=m_cv.copy())

        Kj = jnp.asarray(K, jnp.float32)
        E, inl = find_essential(
            jax.random.PRNGKey(0), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(mask), Kj, method, 1.0, 512,
        )
        x1n = _normalized(Kj, jnp.asarray(uv1))
        x2n = _normalized(Kj, jnp.asarray(uv2))
        R_j, t_j, _ = recover_pose_from_essential(E, x1n, x2n, inl)
        R_j, t_j = np.asarray(R_j), np.asarray(t_j)

        # Ours vs ground truth — within the noise band.
        assert angle_deg(R_j, R_gt) < 1.0, angle_deg(R_j, R_gt)
        assert dir_angle_deg(t_j, t_gt) < 3.0
        # cv2 vs ground truth (sanity) and ours vs cv2.
        assert angle_deg(R_cv, R_gt) < 1.0
        assert angle_deg(R_j, R_cv) < 1.5
        assert dir_angle_deg(t_j, t_cv[:, 0]) < 4.0

    def test_lmeds_inlier_mask_agreement(self):
        """The LMEDS mask feeds the reference's VPF gate — agreement must be
        high for accept/reject parity (VO_utility.cpp:157-160)."""
        agree_rates, our_recall = [], []
        for seed in range(5):
            uv1, uv2, _, _, _, is_out = make_two_view(seed=seed)
            E_cv, m_cv = cv2.findEssentialMat(
                uv1, uv2, K, method=cv2.LMEDS, prob=0.99, threshold=1.0
            )
            m_cv = m_cv.ravel().astype(bool)
            _, inl = find_essential(
                jax.random.PRNGKey(seed), jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.ones(len(uv1), bool), jnp.asarray(K, jnp.float32),
                LMEDS, 1.0, 512,
            )
            inl = np.asarray(inl)
            agree_rates.append((inl == m_cv).mean())
            our_recall.append(inl[~is_out].mean())
            # no outlier may slip into our inlier set beyond a stray few
            assert inl[is_out].mean() < 0.1
        assert np.mean(agree_rates) > 0.85, agree_rates
        assert np.mean(our_recall) > 0.8, our_recall


class TestHomographyParity:
    def test_planar_pose_matches_cv2_and_gt(self):
        uv1, uv2, R_gt, t_gt, _, _ = make_two_view(planar=True, seed=3)
        H_cv, m_cv = cv2.findHomography(uv1, uv2, cv2.LMEDS)
        n_sols, Rs_cv, ts_cv, _ = cv2.decomposeHomographyMat(H_cv, K)
        best_cv = min(
            range(n_sols), key=lambda i: angle_deg(Rs_cv[i], R_gt)
        )

        Kj = jnp.asarray(K, jnp.float32)
        Hj, inl = find_homography(
            jax.random.PRNGKey(0), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(len(uv1), bool), LMEDS, 2.0, 512,
        )
        R_j, t_j, _ = recover_pose_homography(
            Hj, jnp.asarray(uv1), jnp.asarray(uv2), inl, Kj, 50.0,
            jnp.eye(3), jnp.zeros(3),
        )
        R_j, t_j = np.asarray(R_j), np.asarray(t_j)

        assert angle_deg(R_j, R_gt) < 1.5, angle_deg(R_j, R_gt)
        assert dir_angle_deg(t_j, t_gt) < 5.0
        # our cheirality vote should land on the same branch cv2's best does
        assert angle_deg(R_j, Rs_cv[best_cv]) < 2.0

    def test_homography_matrix_close_to_cv2(self):
        uv1, uv2, _, _, _, is_out = make_two_view(planar=True, seed=4)
        H_cv, _ = cv2.findHomography(uv1, uv2, cv2.LMEDS)
        Hj, _ = find_homography(
            jax.random.PRNGKey(1), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(len(uv1), bool), LMEDS, 2.0, 512,
        )
        Hj = np.asarray(Hj, np.float64)
        Hj /= Hj[2, 2]
        H_cv /= H_cv[2, 2]
        # compare action on the true inliers' pixels, not raw entries
        pts = uv1[~is_out]
        ph = np.concatenate([pts, np.ones((len(pts), 1))], -1)
        for H in (Hj, H_cv):
            assert np.isfinite(H).all()
        w_j = ph @ Hj.T
        w_cv = ph @ H_cv.T
        pj = w_j[:, :2] / w_j[:, 2:3]
        pcv = w_cv[:, :2] / w_cv[:, 2:3]
        assert np.median(np.linalg.norm(pj - pcv, axis=-1)) < 1.0


class TestPnPParity:
    def test_pose_matches_cv2_and_gt(self):
        uv1, uv2, R_gt, t_gt, X, _ = make_two_view(outlier_frac=0.25, seed=5)
        ok, rvec, tvec, inl_cv = cv2.solvePnPRansac(
            X, uv2.astype(np.float64), K, None,
            iterationsCount=1000, reprojectionError=2.0, confidence=0.99,
            flags=cv2.SOLVEPNP_EPNP,
        )
        assert ok
        R_cv, _ = cv2.Rodrigues(rvec)
        res = solve_pnp_ransac(
            jax.random.PRNGKey(0), jnp.asarray(X, jnp.float32),
            jnp.asarray(uv2), jnp.ones(len(X), bool),
            jnp.asarray(K, jnp.float32), reprojection_error=2.0,
            num_hypotheses=512,
        )
        assert bool(res.success)
        R_j, t_j = np.asarray(res.R), np.asarray(res.t)
        assert angle_deg(R_j, R_gt) < 0.5
        assert np.linalg.norm(t_j - t_gt) < 0.05
        assert angle_deg(R_j, R_cv) < 1.0
        assert np.linalg.norm(t_j - tvec[:, 0]) < 0.1


class TestHypothesisBudget:
    """num_hypotheses=512 must be a derived budget, not a guess (VERDICT r1)."""

    def test_formula_matches_opencv_regime(self):
        # m=5 @ 50% outliers, 0.99 conf: OpenCV's classic ~145; the reference
        # over-budgets 2000 (mono_VO_parameters.yaml:19).
        assert 140 <= hypotheses_for_confidence(0.99, 0.5, 5) <= 150
        # Our 8-point sets at the same eps need ~1177 — 512 is NOT enough at
        # 50% outliers, and IS enough (with margin) at <= 40%.
        assert hypotheses_for_confidence(0.99, 0.5, 8) > 512
        assert hypotheses_for_confidence(0.99, 0.4, 8) <= 512
        assert hypotheses_for_confidence(0.99, 0.67, 4) <= 512
        assert hypotheses_for_confidence(0.99, 0.78, 3) <= 512

    def test_512_suffices_empirically_at_40pct(self):
        """At the budgeted 40% outlier ceiling, 512 8-point hypotheses recover
        the pose on (nearly) every seed."""
        failures = 0
        for seed in range(10):
            uv1, uv2, R_gt, t_gt, _, _ = make_two_view(
                outlier_frac=0.4, seed=100 + seed
            )
            Kj = jnp.asarray(K, jnp.float32)
            E, inl = find_essential(
                jax.random.PRNGKey(seed), jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.ones(len(uv1), bool), Kj, LMEDS, 1.0, 512,
            )
            R_j, t_j, _ = recover_pose_from_essential(
                E, _normalized(Kj, jnp.asarray(uv1)),
                _normalized(Kj, jnp.asarray(uv2)), inl,
            )
            if angle_deg(np.asarray(R_j), R_gt) > 2.0:
                failures += 1
        assert failures <= 1, failures
