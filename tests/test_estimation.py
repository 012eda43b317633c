"""Estimation tests: known (R, t) -> solvers must recover them (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergo_uvo_tpu.config import LMEDS, RANSAC, MonoVOConfig
from ergo_uvo_tpu.estimation import (
    decompose_homography,
    eight_point_essential,
    estimate_relative_pose,
    find_essential,
    find_homography,
    four_point_homography,
    recover_pose_from_essential,
    recover_pose_homography,
    sampson_error_sq,
    select_estimation_method,
    solve_pnp_ransac,
)
from ergo_uvo_tpu.estimation.essential import _normalized
from ergo_uvo_tpu.geometry import so3_exp

K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]], np.float32)


def rotmat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.asarray(so3_exp(jnp.asarray(axis * angle, jnp.float32)))


def project(R, t, X):
    pc = X @ R.T + t
    uv = pc[:, :2] / pc[:, 2:3]
    return (uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]).astype(np.float32)


def scene_general(n=200, seed=0):
    """General 3D scene viewed from two poses (essential-matrix regime)."""
    rng = np.random.default_rng(seed)
    X = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], -1
    )
    R = rotmat([0.2, 1.0, 0.1], 0.06)
    t = np.array([0.4, -0.05, 0.08])
    t = t / np.linalg.norm(t)  # unit baseline: essential scale gauge
    p1 = project(np.eye(3), np.zeros(3), X)
    p2 = project(R, t, X)
    return X.astype(np.float32), R.astype(np.float32), t.astype(np.float32), p1, p2


def scene_plane(n=200, seed=1, d=6.0):
    """Planar scene (homography regime)."""
    rng = np.random.default_rng(seed)
    xy = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n)], -1)
    X = np.concatenate([xy, np.full((n, 1), d)], -1)  # plane z = d
    R = rotmat([0.1, 0.8, -0.2], 0.05)
    t = np.array([0.5, 0.1, -0.05])
    p1 = project(np.eye(3), np.zeros(3), X)
    p2 = project(R, t, X)
    return X.astype(np.float32), R.astype(np.float32), t.astype(np.float32), p1, p2


def angular_error_deg(R1, R2):
    c = (np.trace(np.asarray(R1).T @ np.asarray(R2)) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def direction_error_deg(t1, t2):
    t1 = np.asarray(t1) / np.linalg.norm(t1)
    t2 = np.asarray(t2) / np.linalg.norm(t2)
    return np.degrees(np.arccos(np.clip(abs(t1 @ t2), -1, 1)))


class TestEssential:
    def test_eight_point_exact(self):
        X, R, t, p1, p2 = scene_general()
        x1 = _normalized(jnp.asarray(K), jnp.asarray(p1))
        x2 = _normalized(jnp.asarray(K), jnp.asarray(p2))
        E = eight_point_essential(x1[None, :8], x2[None, :8])[0]
        r2 = sampson_error_sq(E, x1, x2)
        assert float(jnp.max(r2)) < 1e-8

    def test_find_and_recover_clean(self):
        X, R, t, p1, p2 = scene_general()
        mask = jnp.ones(len(p1), bool)
        key = jax.random.PRNGKey(0)
        E, inl = find_essential(key, jnp.asarray(p1), jnp.asarray(p2), mask,
                                jnp.asarray(K), LMEDS, 0.1, 256)
        assert int(jnp.sum(inl)) > 150
        x1 = _normalized(jnp.asarray(K), jnp.asarray(p1))
        x2 = _normalized(jnp.asarray(K), jnp.asarray(p2))
        R_est, t_est, m = recover_pose_from_essential(E, x1, x2, inl)
        assert angular_error_deg(R_est, R) < 0.5
        assert direction_error_deg(t_est, t) < 1.0
        # recovered translation should have the right SIGN too
        assert float(jnp.asarray(t_est) @ jnp.asarray(t)) > 0

    def test_with_outliers_ransac_and_lmeds(self):
        X, R, t, p1, p2 = scene_general(n=256)
        rng = np.random.default_rng(5)
        p2_bad = p2.copy()
        bad = rng.choice(256, 60, replace=False)
        p2_bad[bad] += rng.uniform(-80, 80, (60, 2)).astype(np.float32)
        mask = jnp.ones(256, bool)
        for method in (RANSAC, LMEDS):
            E, inl = find_essential(jax.random.PRNGKey(1), jnp.asarray(p1),
                                    jnp.asarray(p2_bad), mask, jnp.asarray(K),
                                    method, 1.0, 512)
            inl_np = np.asarray(inl)
            # outliers must be rejected
            assert inl_np[bad].mean() < 0.15, (method, inl_np[bad].mean())
            assert inl_np.sum() > 120
            x1 = _normalized(jnp.asarray(K), jnp.asarray(p1))
            x2 = _normalized(jnp.asarray(K), jnp.asarray(p2_bad))
            R_est, t_est, _ = recover_pose_from_essential(E, x1, x2, inl)
            assert angular_error_deg(R_est, R) < 1.0
            assert direction_error_deg(t_est, t) < 2.0


class TestHomography:
    def test_four_point_exact(self):
        X, R, t, p1, p2 = scene_plane()
        H4 = four_point_homography(jnp.asarray(p1[None, :4]), jnp.asarray(p2[None, :4]))[0]
        ones = np.ones((len(p1), 1), np.float32)
        ph = np.concatenate([p1, ones], -1)
        q = ph @ np.asarray(H4).T
        proj = q[:, :2] / q[:, 2:3]
        np.testing.assert_allclose(proj, p2, atol=0.1)

    def test_find_homography_with_outliers(self):
        X, R, t, p1, p2 = scene_plane(n=256)
        rng = np.random.default_rng(2)
        p2_bad = p2.copy()
        bad = rng.choice(256, 50, replace=False)
        p2_bad[bad] += rng.uniform(-60, 60, (50, 2)).astype(np.float32)
        mask = jnp.ones(256, bool)
        Hm, inl = find_homography(jax.random.PRNGKey(3), jnp.asarray(p1),
                                  jnp.asarray(p2_bad), mask, LMEDS, 0.1, 512)
        inl_np = np.asarray(inl)
        assert inl_np[bad].mean() < 0.1
        assert inl_np.sum() > 150

    def test_decompose_recovers_pose(self):
        X, R, t, p1, p2 = scene_plane()
        Hm, inl = find_homography(jax.random.PRNGKey(4), jnp.asarray(p1),
                                  jnp.asarray(p2), jnp.ones(len(p1), bool),
                                  LMEDS, 0.1, 256)
        Rs, ts, ns = decompose_homography(Hm, jnp.asarray(K))
        errs = [angular_error_deg(Rs[i], R) for i in range(4)]
        assert min(errs) < 0.5, errs

    def test_recover_pose_homography_vote(self):
        X, R, t, p1, p2 = scene_plane()
        mask = jnp.ones(len(p1), bool)
        Hm, inl = find_homography(jax.random.PRNGKey(5), jnp.asarray(p1),
                                  jnp.asarray(p2), mask, LMEDS, 0.1, 256)
        R_prev = jnp.eye(3)
        t_prev = jnp.zeros(3)
        R_est, t_est, ngood = recover_pose_homography(
            Hm, jnp.asarray(p1), jnp.asarray(p2), inl, jnp.asarray(K), 50.0,
            R_prev, t_prev,
        )
        assert int(ngood) > 100
        assert angular_error_deg(R_est, R) < 1.0
        assert direction_error_deg(t_est, t) < 2.0
        np.testing.assert_allclose(float(jnp.linalg.norm(t_est)), 1.0, atol=1e-5)

    def test_vote_failure_keeps_previous(self):
        R_prev = jnp.asarray(rotmat([1.0, 0, 0], 0.3))
        t_prev = jnp.asarray([0.0, 1.0, 0.0])
        # Inlier mask all-false -> zero votes for every candidate.
        p = jnp.asarray(np.random.default_rng(0).uniform(0, 600, (32, 2)).astype(np.float32))
        R_est, t_est, ngood = recover_pose_homography(
            jnp.eye(3), p, p, jnp.zeros(32, bool), jnp.asarray(K), 50.0,
            R_prev, t_prev,
        )
        assert int(ngood) == 0
        np.testing.assert_allclose(np.asarray(R_est), np.asarray(R_prev))
        np.testing.assert_allclose(np.asarray(t_est), np.asarray(t_prev))


class TestPnP:
    def test_clean(self):
        X, R, t, p1, p2 = scene_general(n=128)
        res = solve_pnp_ransac(jax.random.PRNGKey(0), jnp.asarray(X),
                               jnp.asarray(p2), jnp.ones(128, bool),
                               jnp.asarray(K), 1.0, 256)
        assert bool(res.success)
        assert angular_error_deg(res.R, R) < 0.2
        np.testing.assert_allclose(np.asarray(res.t), t, atol=0.02)

    def test_with_outliers(self):
        X, R, t, p1, p2 = scene_general(n=256, seed=7)
        rng = np.random.default_rng(8)
        p2_bad = p2.copy()
        bad = rng.choice(256, 64, replace=False)
        p2_bad[bad] += rng.uniform(-100, 100, (64, 2)).astype(np.float32)
        res = solve_pnp_ransac(jax.random.PRNGKey(1), jnp.asarray(X),
                               jnp.asarray(p2_bad), jnp.ones(256, bool),
                               jnp.asarray(K), 1.0, 512)
        assert bool(res.success)
        assert angular_error_deg(res.R, R) < 0.5
        np.testing.assert_allclose(np.asarray(res.t), t, atol=0.05)
        assert np.asarray(res.inliers)[bad].mean() < 0.1

    def test_degenerate_too_few_points(self):
        X = jnp.asarray(np.random.default_rng(0).normal(size=(32, 3)).astype(np.float32))
        xy = jnp.zeros((32, 2))
        mask = jnp.zeros(32, bool).at[:3].set(True)  # < 6 points
        res = solve_pnp_ransac(jax.random.PRNGKey(2), X, xy, mask, jnp.asarray(K))
        assert not bool(res.success)


class TestRelativePose:
    CFG = MonoVOConfig(num_hypotheses=256)

    def test_select_method(self):
        p1 = jnp.asarray(np.random.default_rng(0).uniform(0, 600, (64, 2)).astype(np.float32))
        small = p1 + 2.0
        large = p1 + 30.0
        m = jnp.ones(64, bool)
        assert not bool(select_estimation_method(p1, small, m, 10.0))
        assert bool(select_estimation_method(p1, large, m, 10.0))

    def test_essential_path(self):
        X, R, t, p1, p2 = scene_general(n=256, seed=11)
        res = estimate_relative_pose(
            jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2),
            jnp.ones(256, bool), jnp.asarray(K), self.CFG,
            jnp.eye(3), jnp.zeros(3),
        )
        assert bool(res.success)
        assert bool(res.used_essential)
        assert angular_error_deg(res.R, R) < 1.0
        assert direction_error_deg(res.t, t) < 2.0

    def test_homography_path_low_parallax(self):
        """Planar scene with small motion -> median displacement < 10 px."""
        rng = np.random.default_rng(12)
        xy = np.stack([rng.uniform(-4, 4, 256), rng.uniform(-3, 3, 256)], -1)
        X = np.concatenate([xy, np.full((256, 1), 8.0)], -1).astype(np.float32)
        R = rotmat([0.0, 1.0, 0.0], 0.008)
        t = np.array([0.08, 0.0, 0.0])
        p1 = project(np.eye(3), np.zeros(3), X)
        p2 = project(R, t, X)
        med_disp = np.median(np.linalg.norm(p1 - p2, axis=1))
        assert med_disp < 10.0, med_disp
        res = estimate_relative_pose(
            jax.random.PRNGKey(1), jnp.asarray(p1), jnp.asarray(p2),
            jnp.ones(256, bool), jnp.asarray(K), self.CFG,
            jnp.eye(3), jnp.zeros(3),
        )
        assert bool(res.success)
        assert not bool(res.used_essential)
        assert angular_error_deg(res.R, R) < 1.0

    def test_total_failure_too_few_matches(self):
        """With fewer valid matches than min_num_inliers both methods fail.

        (Pure-noise correspondences are NOT a failure case: OpenCV's LMeDS
        scales its inlier gate with the median residual, so noise frames pass
        the VPF check — the reference relies on the downstream 3D-point gates.
        The hard failure is the inlier-count gate.)
        """
        rng = np.random.default_rng(13)
        p1 = rng.uniform(0, 600, (64, 2)).astype(np.float32)
        p2 = p1 + 20.0
        mask = jnp.zeros(64, bool).at[:6].set(True)  # 6 < min_num_inliers=10
        res = estimate_relative_pose(
            jax.random.PRNGKey(2), jnp.asarray(p1), jnp.asarray(p2),
            mask, jnp.asarray(K), self.CFG,
            jnp.eye(3), jnp.zeros(3),
        )
        assert not bool(res.success)

    def test_jit_compiles(self):
        X, R, t, p1, p2 = scene_general(n=256, seed=14)
        f = jax.jit(
            lambda k, a, b, m: estimate_relative_pose(
                k, a, b, m, jnp.asarray(K), self.CFG, jnp.eye(3), jnp.zeros(3)
            )
        )
        res = f(jax.random.PRNGKey(3), jnp.asarray(p1), jnp.asarray(p2),
                jnp.ones(256, bool))
        assert bool(res.success)


@pytest.mark.fast
class TestHypothesisBudget:
    """Budget derivation from the reference RANSAC keys (VERDICT r3 weak #5)."""

    def test_derive_bounds_and_granularity(self):
        from ergo_uvo_tpu.estimation.sampling import (
            derive_hypothesis_budget,
            implied_inlier_rate,
        )

        n_ref = derive_hypothesis_budget(0.99, 2000)
        # The reference default (2000 LMEDS iters @ 5-point, ~70% outliers)
        # exceeds what an 8-point sampler can match -> clamps to the cap.
        assert n_ref == 2048
        assert derive_hypothesis_budget(0.99, 10) == 512  # floor
        for n in (derive_hypothesis_budget(0.99, i) for i in (10, 100, 2000)):
            assert n % 256 == 0 and 512 <= n <= 2048
        # 512 @ m=8 @ 0.99 conf covers inlier rates down to ~0.55.
        r = implied_inlier_rate(0.99, 512, 8)
        assert 0.5 < r < 0.6, r

    def test_yaml_budget_wiring(self, tmp_path):
        from ergo_uvo_tpu.config import load_vo_params

        base = """
vo_params:
  feature_detector: SURF
  essential_confidence: 0.99
  essential_max_iters: 2000
"""
        f = tmp_path / "p.yaml"
        f.write_text(base)
        cfg = load_vo_params(str(f))
        assert cfg.num_hypotheses == 2048  # derived (capped)
        f.write_text(base + "tpu_params:\n  num_hypotheses: 128\n")
        cfg = load_vo_params(str(f))
        assert cfg.num_hypotheses == 128  # explicit always wins
        # Stereo derivation: P3P sets at 1000 EPnP iters stay at the floor.
        f.write_text("vo_params:\n  iterations_count: 1000\n  confidence: 0.99\n")
        cfg = load_vo_params(str(f), stereo=True)
        assert cfg.num_hypotheses % 256 == 0 and cfg.num_hypotheses >= 512
