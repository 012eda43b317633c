"""Unit tests for geometry primitives against closed-form / synthetic cases.

Strategy per SURVEY.md §4: known (R, t) -> triangulation / conversions must
return them (to float32 tolerance); property tests for SO(3) invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergo_uvo_tpu.geometry import (
    SE3,
    cheirality_mask,
    euler_to_quaternion,
    euler_to_rotation,
    filter_3d_points,
    is_rotation_matrix,
    masked_mean_and_variance,
    masked_median,
    project_points,
    projection_matrix,
    quaternion_to_rotation,
    reprojection_errors,
    resize_camera_matrix,
    rotation_to_euler,
    rotation_to_quaternion,
    rotx,
    roty,
    rotz,
    se3_exp,
    se3_log,
    skew,
    so3_exp,
    so3_log,
    triangulate_points,
    undistort_normalized,
    distort_normalized,
    wrap2pi,
    project_to_so3,
)
from ergo_uvo_tpu.geometry.camera import PinholeCamera

pytestmark = pytest.mark.fast  # smoke tier: small shapes, cheap compiles

RNG = np.random.default_rng(0)


def random_rotation(rng=RNG):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0.1, np.pi - 0.2)
    return np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))


class TestRotations:
    def test_axis_rotations_orthonormal(self):
        for fn in (rotx, roty, rotz):
            R = fn(jnp.asarray(0.7))
            assert bool(is_rotation_matrix(R, tol=1e-5))

    def test_rotz_ninety(self):
        R = rotz(jnp.asarray(np.pi / 2, jnp.float32))
        np.testing.assert_allclose(
            np.asarray(R) @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6
        )

    def test_euler_roundtrip(self):
        rpy = jnp.asarray([0.3, -0.4, 1.2], jnp.float32)
        R = euler_to_rotation(rpy)
        back = rotation_to_euler(R)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rpy), atol=1e-5)

    def test_quaternion_roundtrip(self):
        for _ in range(10):
            R = random_rotation()
            q = rotation_to_quaternion(jnp.asarray(R))
            R2 = quaternion_to_rotation(q)
            np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_euler_quaternion_consistency(self):
        rpy = jnp.asarray([0.2, 0.5, -0.9], jnp.float32)
        q = euler_to_quaternion(rpy)
        np.testing.assert_allclose(
            np.asarray(quaternion_to_rotation(q)),
            np.asarray(euler_to_rotation(rpy)),
            atol=1e-5,
        )

    def test_skew_cross(self):
        a = jnp.asarray([1.0, 2.0, 3.0])
        b = jnp.asarray([-0.5, 0.4, 2.0])
        np.testing.assert_allclose(
            np.asarray(skew(a) @ b), np.cross(np.asarray(a), np.asarray(b)), atol=1e-6
        )

    def test_so3_exp_log_roundtrip(self):
        for scale in (1e-6, 0.1, 1.0, 3.0):
            w = jnp.asarray([0.3, -0.2, 0.9], jnp.float32)
            w = w / jnp.linalg.norm(w) * scale
            np.testing.assert_allclose(
                np.asarray(so3_log(so3_exp(w))), np.asarray(w), atol=1e-4
            )

    def test_project_to_so3(self):
        R = jnp.asarray(random_rotation()) + 0.01 * jnp.asarray(
            RNG.normal(size=(3, 3)), jnp.float32
        )
        Rp = project_to_so3(R)
        assert bool(is_rotation_matrix(Rp, tol=1e-4))

    def test_wrap2pi(self):
        np.testing.assert_allclose(float(wrap2pi(jnp.asarray(3 * np.pi))), np.pi, atol=1e-5)
        np.testing.assert_allclose(float(wrap2pi(jnp.asarray(-3 * np.pi))), -np.pi, atol=1e-5)
        np.testing.assert_allclose(float(wrap2pi(jnp.asarray(0.5))), 0.5, atol=1e-6)


class TestSE3:
    def test_compose_inverse(self):
        T = SE3(jnp.asarray(random_rotation()), jnp.asarray([0.1, -2.0, 0.5], jnp.float32))
        I = T.compose(T.inverse())
        np.testing.assert_allclose(np.asarray(I.R), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), np.zeros(3), atol=1e-5)

    def test_apply_matches_matrix(self):
        T = SE3(jnp.asarray(random_rotation()), jnp.asarray([1.0, 2.0, 3.0], jnp.float32))
        p = jnp.asarray(RNG.normal(size=(5, 3)), jnp.float32)
        ph = jnp.concatenate([p, jnp.ones((5, 1))], -1)
        expect = (np.asarray(T.matrix()) @ np.asarray(ph).T).T[:, :3]
        np.testing.assert_allclose(np.asarray(T.apply(p)), expect, atol=1e-5)

    def test_exp_log_roundtrip(self):
        xi = jnp.asarray([0.1, -0.3, 0.2, 0.4, -0.1, 0.8], jnp.float32)
        np.testing.assert_allclose(np.asarray(se3_log(se3_exp(xi))), np.asarray(xi), atol=1e-4)

    def test_exp_small_angle(self):
        xi = jnp.asarray([1e-6, 2e-6, -1e-6, 1e-7, -2e-7, 1e-7], jnp.float32)
        T = se3_exp(xi)
        np.testing.assert_allclose(np.asarray(T.t), np.asarray(xi[:3]), atol=1e-8)


class TestCamera:
    CAM = PinholeCamera.create(500.0, 510.0, 320.0, 240.0, -0.28, 0.07, 1e-4, -2e-4)

    def test_distort_undistort_roundtrip(self):
        xy = jnp.asarray(RNG.uniform(-0.4, 0.4, size=(50, 2)), jnp.float32)
        xyd = distort_normalized(self.CAM, xy)
        back = undistort_normalized(self.CAM, xyd, iters=12)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=1e-4)

    def test_project_known(self):
        cam = PinholeCamera.create(100.0, 100.0, 50.0, 50.0)
        p = jnp.asarray([[1.0, 2.0, 10.0]])
        uv = project_points(cam, p)
        np.testing.assert_allclose(np.asarray(uv), [[60.0, 70.0]], atol=1e-5)

    def test_resize_camera_matrix(self):
        K = self.CAM.K
        K2 = resize_camera_matrix(K, 1280, 640)
        np.testing.assert_allclose(float(K2[0, 0]), 250.0, atol=1e-4)
        np.testing.assert_allclose(float(K2[1, 2]), 120.0, atol=1e-4)
        np.testing.assert_allclose(float(K2[2, 2]), 1.0)


class TestTriangulation:
    def _setup(self, n=100, noise=0.0):
        rng = np.random.default_rng(42)
        pts3d = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)], -1
        ).astype(np.float32)
        K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]], np.float32)
        R1, t1 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        R2 = np.asarray(roty(jnp.asarray(0.05, jnp.float32)))
        t2 = np.array([-0.5, 0.02, 0.01], np.float32)

        def proj(R, t):
            pc = pts3d @ R.T + t
            uv = pc[:, :2] / pc[:, 2:3]
            return (uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]).astype(np.float32)

        p1 = proj(R1, t1) + noise * rng.normal(size=(n, 2)).astype(np.float32)
        p2 = proj(R2, t2) + noise * rng.normal(size=(n, 2)).astype(np.float32)
        return K, (R1, t1), (R2, t2), pts3d, p1, p2

    def test_triangulate_exact(self):
        K, (R1, t1), (R2, t2), pts3d, p1, p2 = self._setup()
        P1 = projection_matrix(jnp.asarray(K), jnp.asarray(R1), jnp.asarray(t1))
        P2 = projection_matrix(jnp.asarray(K), jnp.asarray(R2), jnp.asarray(t2))
        X = triangulate_points(P1, P2, jnp.asarray(p1), jnp.asarray(p2))
        np.testing.assert_allclose(np.asarray(X), pts3d, rtol=1e-2, atol=2e-2)

    def test_reprojection_errors_zero(self):
        K, (R1, t1), (R2, t2), pts3d, p1, p2 = self._setup()
        e = reprojection_errors(
            jnp.asarray(K), jnp.asarray(R2), jnp.asarray(t2), jnp.asarray(pts3d), jnp.asarray(p2)
        )
        assert float(jnp.max(e)) < 1e-2

    def test_filter_3d_points_gates_outliers(self):
        K, (R1, t1), (R2, t2), pts3d, p1, p2 = self._setup()
        bad = pts3d.copy()
        bad[:5, 2] = -3.0  # behind camera
        X = jnp.asarray(bad)
        mask = jnp.ones(X.shape[0], bool)
        out_mask, _ = filter_3d_points(
            X, mask,
            jnp.asarray(K), jnp.asarray(R1), jnp.asarray(t1),
            jnp.asarray(K), jnp.asarray(R2), jnp.asarray(t2),
            jnp.asarray(p1), jnp.asarray(p2),
            reprojection_tolerance=2.0,
        )
        out = np.asarray(out_mask)
        assert not out[:5].any()
        assert out[5:].sum() > 80

    def test_cheirality(self):
        pts = jnp.asarray([[0.0, 0, 5.0], [0, 0, -5.0], [0, 0, 60.0]])
        m = cheirality_mask(jnp.eye(3), jnp.zeros(3), pts, max_depth=50.0)
        assert np.asarray(m).tolist() == [True, False, False]


class TestStats:
    def test_masked_median_odd_even(self):
        v = jnp.asarray([5.0, 1.0, 3.0, 100.0, 2.0])
        m = jnp.asarray([True, True, True, False, True])
        # valid = [5,1,3,2] -> sorted [1,2,3,5] -> even: (2+3)/2
        np.testing.assert_allclose(float(masked_median(v, m)), 2.5)
        m2 = jnp.asarray([True, True, True, False, False])
        np.testing.assert_allclose(float(masked_median(v, m2)), 3.0)

    def test_masked_median_empty(self):
        v = jnp.asarray([1.0, 2.0])
        assert float(masked_median(v, jnp.zeros(2, bool))) == 0.0

    def test_masked_mean_var(self):
        v = jnp.asarray([1.0, 2.0, 3.0, 999.0])
        m = jnp.asarray([True, True, True, False])
        mean, var = masked_mean_and_variance(v, m)
        np.testing.assert_allclose(float(mean), 2.0, atol=1e-6)
        np.testing.assert_allclose(float(var), 2.0 / 3.0, atol=1e-6)


class TestJitAndVmap:
    def test_geometry_jits(self):
        f = jax.jit(lambda w: se3_log(se3_exp(w)))
        xi = jnp.asarray([0.1, 0.2, 0.3, 0.1, -0.2, 0.05], jnp.float32)
        np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-4)

    def test_vmap_rotations(self):
        angles = jnp.linspace(0, 3.0, 16)
        Rs = jax.vmap(rotx)(angles)
        assert Rs.shape == (16, 3, 3)
        assert bool(jnp.all(is_rotation_matrix(Rs, tol=1e-4)))
