"""Image preprocessing: golden tests vs OpenCV (tolerance bands, SURVEY.md §4)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from ergo_uvo_tpu.image import (  # noqa: E402
    build_preprocess_plan,
    build_undistort_grid,
    clahe,
    optimal_new_camera,
    preprocess_frame,
    remap_bilinear,
    resize_area,
    rgb_to_gray,
)

RNG = np.random.default_rng(7)


def synthetic_image(h=480, w=640, channels=3):
    """Smooth low-frequency pattern + texture, resembling seafloor imagery."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (
        110
        + 60 * np.sin(xs / 37.0)
        + 40 * np.cos(ys / 23.0 + xs / 61.0)
        + 10 * RNG.standard_normal((h, w)).astype(np.float32)
    )
    base = np.clip(base, 0, 255)
    if channels == 3:
        return np.stack([base, 0.9 * base, 0.8 * base], -1).astype(np.float32)
    return base.astype(np.float32)


K = np.array([[460.0, 0, 320.0], [0, 455.0, 240.0], [0, 0, 1.0]])
DIST = np.array([-0.25, 0.06, 1e-3, -5e-4])


class TestBasics:
    def test_gray_matches_cv2(self):
        img = synthetic_image()
        ours = np.asarray(rgb_to_gray(jnp.asarray(img)))
        ref = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        assert np.abs(ours - ref).mean() < 1.0

    def test_resize_area_integer_factor_matches_cv2(self):
        img = synthetic_image(480, 640, channels=1)
        ours = np.asarray(resize_area(jnp.asarray(img), 240, 320))
        ref = cv2.resize(img, (320, 240), interpolation=cv2.INTER_AREA)
        np.testing.assert_allclose(ours, ref, atol=0.51)


class TestUndistort:
    def test_optimal_new_camera_matches_cv2(self):
        ours = optimal_new_camera(K, DIST, 640, 480)
        ref, _ = cv2.getOptimalNewCameraMatrix(
            K, DIST, (640, 480), 0, (640, 480), False
        )
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=0.5)

    def test_grid_matches_cv2_initundistortrectifymap(self):
        new_K = optimal_new_camera(K, DIST, 640, 480)
        grid = build_undistort_grid(K, DIST, new_K, 640, 480)
        mapx, mapy = cv2.initUndistortRectifyMap(
            K, DIST, None, new_K, (640, 480), cv2.CV_32FC1
        )
        np.testing.assert_allclose(grid[..., 0], mapx, atol=0.05)
        np.testing.assert_allclose(grid[..., 1], mapy, atol=0.05)

    def test_remap_matches_cv2_undistort(self):
        img = synthetic_image(480, 640, channels=1)
        new_K = optimal_new_camera(K, DIST, 640, 480)
        grid = build_undistort_grid(K, DIST, new_K, 640, 480)
        ours = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(grid)))
        ref = cv2.undistort(img, K, DIST, None, new_K)
        # interior comparison (border fill conventions differ by a pixel)
        d = np.abs(ours - ref)[5:-5, 5:-5]
        assert d.mean() < 0.5
        assert np.percentile(d, 99) < 3.0


class TestClahe:
    def test_clahe_matches_cv2(self):
        img = synthetic_image(480, 640, channels=1)
        ours = np.asarray(clahe(jnp.asarray(img), clip_limit=3.0))
        ref = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(
            img.astype(np.uint8)
        )
        d = np.abs(ours - ref.astype(np.float32))
        assert d.mean() < 1.5, d.mean()
        assert (d > 4).mean() < 0.01

    def test_clahe_nondivisible_size(self):
        img = synthetic_image(250, 330, channels=1)
        out = np.asarray(clahe(jnp.asarray(img), clip_limit=8.0))
        assert out.shape == (250, 330)
        assert out.min() >= 0 and out.max() <= 255


class TestFullPlan:
    def test_preprocess_frame_end_to_end(self):
        img = synthetic_image(960, 1280, channels=3)
        K2 = K.copy() * 2
        K2[2, 2] = 1.0
        plan = build_preprocess_plan(
            K2, DIST, 1280, 960, 640, clahe_enabled=True, clip_limit=3.0
        )
        out = preprocess_frame(plan, jnp.asarray(img))
        assert out.shape == (480, 640)
        o = np.asarray(out)
        assert o.min() >= 0 and o.max() <= 255
        # CLAHE should spread the histogram: std must not collapse
        assert o[50:-50, 50:-50].std() > 20

    def test_preprocess_matches_reference_composition(self):
        """Compose the same steps with OpenCV and compare feature-scale stats."""
        img = synthetic_image(960, 1280, channels=3)
        K2 = K.copy() * 2
        K2[2, 2] = 1.0
        plan = build_preprocess_plan(
            K2, DIST, 1280, 960, 640, clahe_enabled=False, clip_limit=3.0
        )
        ours = np.asarray(preprocess_frame(plan, jnp.asarray(img)))

        resized = cv2.resize(img.astype(np.uint8), (640, 480), interpolation=cv2.INTER_AREA)
        gray = cv2.cvtColor(resized, cv2.COLOR_RGB2GRAY)
        K_resized = np.asarray(plan.K_resized, np.float64)
        new_K = np.asarray(plan.new_K, np.float64)
        ref = cv2.undistort(gray, K_resized, DIST, None, new_K)
        d = np.abs(ours - ref.astype(np.float32))[5:-5, 5:-5]
        assert d.mean() < 1.5, d.mean()
