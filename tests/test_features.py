"""Feature detector/descriptor/matcher tests: synthetic geometry + parity.

No SURF golden is available (cv2 ships without xfeatures2d), so per
SURVEY.md §4 these are synthetic-case and distribution tests: known blobs must
be found at the right place/scale, matching must recover a known shift, and
the Pallas matcher must agree with the XLA reference path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ergo_uvo_tpu.features import (
    describe_upright_surf,
    detect_and_describe,
    detect_surf,
    integral_image,
    match_and_gather,
    match_descriptors,
)
from ergo_uvo_tpu.features.integral import box_sum, pad_integral
from ergo_uvo_tpu.features.pallas_matcher import top2_distances_pallas

RNG = np.random.default_rng(3)


def gaussian_blob(h, w, cx, cy, sigma, amp=200.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return amp * np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma**2))


def textured_image(h=240, w=320, n_blobs=30, seed=3):
    rng = np.random.default_rng(seed)
    img = 40.0 * np.ones((h, w), np.float32)
    for _ in range(n_blobs):
        cx, cy = rng.uniform(20, w - 20), rng.uniform(20, h - 20)
        sigma = rng.uniform(2.0, 6.0)
        img += gaussian_blob(h, w, cx, cy, sigma, amp=rng.uniform(60, 180))
    return np.clip(img, 0, 255).astype(np.float32)


class TestIntegral:
    def test_box_sum_matches_numpy(self):
        img = RNG.uniform(0, 255, (32, 40)).astype(np.float32)
        ii = integral_image(jnp.asarray(img))
        iip = pad_integral(ii, 8)
        got = np.asarray(box_sum(iip, 8, 32, 40, -2, -3, 3, 4))
        # Expected at interior pixel (10, 10): sum img[8:13, 7:14]
        np.testing.assert_allclose(got[10, 10], img[8:13, 7:14].sum(), rtol=1e-5)
        np.testing.assert_allclose(got[20, 15], img[18:23, 12:19].sum(), rtol=1e-5)

    def test_edge_padding_clamps(self):
        img = np.ones((16, 16), np.float32)
        ii = integral_image(jnp.asarray(img))
        iip = pad_integral(ii, 8)
        got = np.asarray(box_sum(iip, 8, 16, 16, -3, -3, 4, 4))
        # At the corner only the in-image part contributes.
        np.testing.assert_allclose(got[0, 0], 16.0, rtol=1e-6)  # 4x4 visible
        np.testing.assert_allclose(got[8, 8], 49.0, rtol=1e-6)  # full 7x7


class TestDetector:
    def test_single_blob_position(self):
        img = 20 + gaussian_blob(128, 128, 64.0, 64.0, 4.0)
        kpts = detect_surf(jnp.asarray(img, jnp.float32), max_keypoints=64,
                           min_hessian=50.0, n_octaves=2)
        assert int(kpts.count) >= 1
        best = int(np.argmax(np.asarray(kpts.score)))
        xy = np.asarray(kpts.xy)[best]
        assert abs(xy[0] - 64) < 2.0 and abs(xy[1] - 64) < 2.0

    def test_blob_scale_tracks_sigma(self):
        scales = []
        for sigma in (3.0, 6.0):
            img = 20 + gaussian_blob(192, 192, 96.0, 96.0, sigma)
            kpts = detect_surf(jnp.asarray(img, jnp.float32), max_keypoints=32,
                               min_hessian=50.0, n_octaves=3)
            best = int(np.argmax(np.asarray(kpts.score)))
            scales.append(float(np.asarray(kpts.scale)[best]))
        assert scales[1] > 1.4 * scales[0]

    def test_translation_repeatability(self):
        img = textured_image()
        shifted = np.roll(img, (0, 7), axis=(0, 1))
        k1 = detect_surf(jnp.asarray(img), max_keypoints=128, min_hessian=100.0)
        k2 = detect_surf(jnp.asarray(shifted), max_keypoints=128, min_hessian=100.0)
        xy1 = np.asarray(k1.xy)[np.asarray(k1.mask)]
        xy2 = np.asarray(k2.xy)[np.asarray(k2.mask)]
        assert len(xy1) > 20 and len(xy2) > 20
        # each interior k1 point (+shift) should have a k2 point within 1.5 px
        moved = xy1 + [7, 0]
        interior = (moved[:, 0] > 20) & (moved[:, 0] < 300)
        d = np.linalg.norm(moved[interior, None, :] - xy2[None, :, :], axis=-1)
        frac = (d.min(axis=1) < 1.5).mean()
        assert frac > 0.8, frac

    def test_featureless_image_yields_empty(self):
        img = np.full((120, 160), 37.0, np.float32)
        kpts = detect_surf(jnp.asarray(img), max_keypoints=64)
        assert int(kpts.count) == 0

    def test_jit_and_fixed_shapes(self):
        f = jax.jit(lambda x: detect_surf(x, max_keypoints=64))
        img = jnp.asarray(textured_image())
        k = f(img)
        assert k.xy.shape == (64, 2) and k.mask.shape == (64,)


class TestDescriptor:
    def test_unit_norm_and_masking(self):
        img = jnp.asarray(textured_image())
        kpts = detect_surf(img, max_keypoints=64, min_hessian=100.0)
        desc = describe_upright_surf(img, kpts)
        assert desc.shape == (64, 64)
        norms = np.linalg.norm(np.asarray(desc), axis=-1)
        m = np.asarray(kpts.mask)
        np.testing.assert_allclose(norms[m], 1.0, atol=1e-5)
        assert (norms[~m] == 0).all()

    def test_extended_128(self):
        img = jnp.asarray(textured_image())
        kpts = detect_surf(img, max_keypoints=32, min_hessian=100.0)
        desc = describe_upright_surf(img, kpts, extended=True)
        assert desc.shape == (32, 128)

    def test_descriptor_shift_invariance(self):
        """Descriptors of the same physical point in a shifted image match."""
        img = textured_image()
        shifted = np.roll(img, (0, 5), axis=(0, 1))
        k1, d1 = detect_and_describe(jnp.asarray(img), max_keypoints=128)
        k2, d2 = detect_and_describe(jnp.asarray(shifted), max_keypoints=128)
        m = match_descriptors(d1, k1.mask, d2, k2.mask, ratio=0.7)
        idx = np.asarray(m.idx)
        ok = np.asarray(m.mask)
        assert ok.sum() > 15
        xy1 = np.asarray(k1.xy)[ok]
        xy2 = np.asarray(k2.xy)[idx[ok]]
        dx = xy2[:, 0] - xy1[:, 0]
        dy = xy2[:, 1] - xy1[:, 1]
        good = (np.abs(dx - 5) < 1.0) & (np.abs(dy) < 1.0)
        assert good.mean() > 0.8, good.mean()


class TestSIFT:
    def test_blob_detection_and_matchability(self):
        from ergo_uvo_tpu.features.sift import detect_and_describe_sift

        img = textured_image(240, 320, seed=8)
        shifted = np.roll(img, (0, 6), axis=(0, 1))
        k1, d1 = detect_and_describe_sift(jnp.asarray(img), max_keypoints=192)
        k2, d2 = detect_and_describe_sift(jnp.asarray(shifted), max_keypoints=192)
        assert d1.shape == (192, 128)
        assert int(k1.count) > 20, int(k1.count)
        m = match_descriptors(d1, k1.mask, d2, k2.mask, ratio=0.8)
        ok = np.asarray(m.mask)
        assert ok.sum() > 15, ok.sum()
        xy1 = np.asarray(k1.xy)[ok]
        xy2 = np.asarray(k2.xy)[np.asarray(m.idx)[ok]]
        dx = xy2[:, 0] - xy1[:, 0]
        good = (np.abs(dx - 6) < 1.5) & (np.abs(xy2[:, 1] - xy1[:, 1]) < 1.5)
        assert good.mean() > 0.7, good.mean()

    def test_rotation_invariance_90deg(self):
        from ergo_uvo_tpu.features.sift import detect_and_describe_sift

        img = textured_image(240, 240, seed=9)
        rot = np.rot90(img).copy()
        k1, d1 = detect_and_describe_sift(jnp.asarray(img), max_keypoints=128)
        k2, d2 = detect_and_describe_sift(jnp.asarray(rot), max_keypoints=128)
        m = match_descriptors(d1, k1.mask, d2, k2.mask, ratio=0.8)
        ok = np.asarray(m.mask)
        assert ok.sum() > 10, ok.sum()
        xy1 = np.asarray(k1.xy)[ok]
        xy2 = np.asarray(k2.xy)[np.asarray(m.idx)[ok]]
        W = img.shape[1]
        pred = np.stack([xy1[:, 1], W - 1 - xy1[:, 0]], -1)
        good = np.linalg.norm(pred - xy2, axis=-1) < 2.5
        assert good.mean() > 0.6, good.mean()

    def test_descriptor_norm_and_mask(self):
        from ergo_uvo_tpu.features.sift import detect_and_describe_sift

        img = jnp.asarray(textured_image())
        k, d = detect_and_describe_sift(img, max_keypoints=96)
        n = np.linalg.norm(np.asarray(d), axis=-1)
        m = np.asarray(k.mask)
        np.testing.assert_allclose(n[m], 1.0, atol=1e-4)
        assert (n[~m] == 0).all()

    def test_frontend_dispatch(self):
        img = jnp.asarray(textured_image())
        k, d = detect_and_describe(img, max_keypoints=64, feature_detector="SIFT")
        assert d.shape == (64, 128)


class TestOrientedSurf:
    def test_rotation_invariance_90deg(self):
        """Oriented descriptors of the same physical points match across a
        90-degree image rotation (upright ones would not)."""
        from ergo_uvo_tpu.features import describe_surf

        img = textured_image(240, 240, seed=5)
        rot = np.rot90(img).copy()  # (x, y) -> (y, W-1-x)
        k1 = detect_surf(jnp.asarray(img), max_keypoints=96, min_hessian=100.0)
        k2 = detect_surf(jnp.asarray(rot), max_keypoints=96, min_hessian=100.0)
        d1 = describe_surf(jnp.asarray(img), k1, upright=False)
        d2 = describe_surf(jnp.asarray(rot), k2, upright=False)
        m = match_descriptors(d1, k1.mask, d2, k2.mask, ratio=0.8)
        ok = np.asarray(m.mask)
        assert ok.sum() > 10, ok.sum()
        xy1 = np.asarray(k1.xy)[ok]
        xy2 = np.asarray(k2.xy)[np.asarray(m.idx)[ok]]
        # np.rot90 maps (x, y) -> (x', y') = (y, W-1-x) for the new image.
        W = img.shape[1]
        pred = np.stack([xy1[:, 1], W - 1 - xy1[:, 0]], -1)
        good = np.linalg.norm(pred - xy2, axis=-1) < 2.0
        assert good.mean() > 0.7, good.mean()

    def test_orientation_angles_follow_rotation(self):
        from ergo_uvo_tpu.features import surf_orientations

        img = textured_image(200, 200, seed=6)
        k = detect_surf(jnp.asarray(img), max_keypoints=64, min_hessian=100.0)
        th = np.asarray(surf_orientations(jnp.asarray(img), k))
        assert np.isfinite(th[np.asarray(k.mask)]).all()
        assert (np.abs(th) <= np.pi + 1e-6).all()


class TestORB:
    def test_corner_detection_and_repeatability(self):
        img = textured_image()
        shifted = np.roll(img, (0, 7), axis=(0, 1))
        from ergo_uvo_tpu.features.orb import detect_orb

        k1 = detect_orb(jnp.asarray(img), max_keypoints=256, threshold=12.0)
        k2 = detect_orb(jnp.asarray(shifted), max_keypoints=256, threshold=12.0)
        xy1 = np.asarray(k1.xy)[np.asarray(k1.mask)]
        xy2 = np.asarray(k2.xy)[np.asarray(k2.mask)]
        assert len(xy1) > 20 and len(xy2) > 20
        moved = xy1 + [7, 0]
        interior = (moved[:, 0] > 25) & (moved[:, 0] < 295)
        d = np.linalg.norm(moved[interior, None, :] - xy2[None, :, :], axis=-1)
        frac = (d.min(axis=1) < 2.0).mean()
        assert frac > 0.7, frac

    def test_descriptors_binary_and_matchable(self):
        img = textured_image()
        shifted = np.roll(img, (0, 5), axis=(0, 1))
        k1, d1 = detect_and_describe(
            jnp.asarray(img), max_keypoints=256, feature_detector="ORB"
        )
        k2, d2 = detect_and_describe(
            jnp.asarray(shifted), max_keypoints=256, feature_detector="ORB"
        )
        assert d1.shape == (256, 256)
        vals = np.unique(np.asarray(d1))
        assert set(vals.tolist()) <= {0.0, 1.0}
        m = match_descriptors(d1, k1.mask, d2, k2.mask, ratio=0.8, binary=True)
        ok = np.asarray(m.mask)
        assert ok.sum() > 15, ok.sum()
        xy1 = np.asarray(k1.xy)[ok]
        xy2 = np.asarray(k2.xy)[np.asarray(m.idx)[ok]]
        dx = xy2[:, 0] - xy1[:, 0]
        good = (np.abs(dx - 5) < 1.5) & (np.abs(xy2[:, 1] - xy1[:, 1]) < 1.5)
        assert good.mean() > 0.7, good.mean()

    def test_featureless_image_empty(self):
        from ergo_uvo_tpu.features.orb import detect_orb

        img = np.full((120, 160), 80.0, np.float32)
        k = detect_orb(jnp.asarray(img), max_keypoints=64)
        assert int(k.count) == 0

    def test_orientation_rotates_descriptor(self):
        """The steered-BRIEF bits of a blob are stable under small rotation."""
        from ergo_uvo_tpu.features.orb import detect_orb, describe_orb

        img = jnp.asarray(textured_image())
        k = detect_orb(img, max_keypoints=64, threshold=12.0)
        d = describe_orb(img, k)
        assert d.shape == (64, 256)
        m = np.asarray(k.mask)
        assert (np.asarray(d)[~m] == 0).all()


class TestMatcher:
    def _random_descs(self, n=64, d=64, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(n, d)).astype(np.float32)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    def test_matches_numpy_bruteforce(self):
        dq = self._random_descs(seed=1)
        dt = self._random_descs(seed=2)
        mq = np.ones(64, bool)
        mt = np.ones(64, bool)
        m = match_descriptors(jnp.asarray(dq), jnp.asarray(mq),
                              jnp.asarray(dt), jnp.asarray(mt), ratio=0.95,
                              impl="xla")
        D = np.linalg.norm(dq[:, None, :] - dt[None, :, :], axis=-1)
        idx_ref = D.argmin(axis=1)
        np.testing.assert_array_equal(np.asarray(m.idx)[np.asarray(m.mask)],
                                      idx_ref[np.asarray(m.mask)])
        d_sorted = np.sort(D, axis=1)
        ratio_ok = d_sorted[:, 0] < 0.95 * d_sorted[:, 1]
        np.testing.assert_array_equal(np.asarray(m.mask), ratio_ok)

    def test_ratio_test_rejects_ambiguous(self):
        dq = self._random_descs(4, seed=3)
        dt = np.concatenate([dq + 1e-4, dq - 1e-4])  # two equidistant hits
        m = match_descriptors(
            jnp.asarray(dq), jnp.ones(4, bool),
            jnp.asarray(dt.astype(np.float32)), jnp.ones(8, bool),
            ratio=0.7, impl="xla",
        )
        assert int(m.count) == 0

    def test_invalid_train_excluded(self):
        dq = self._random_descs(8, seed=4)
        dt = np.concatenate([dq * 0 + 99.0, dq])  # first 8 poisoned but masked
        mt = np.concatenate([np.zeros(8, bool), np.ones(8, bool)])
        m = match_descriptors(jnp.asarray(dq), jnp.ones(8, bool),
                              jnp.asarray(dt.astype(np.float32)), jnp.asarray(mt),
                              ratio=0.99, impl="xla")
        assert (np.asarray(m.idx)[np.asarray(m.mask)] >= 8).all()

    def test_single_train_descriptor_rejected(self):
        dq = self._random_descs(8, seed=5)
        mt = np.zeros(8, bool)
        mt[0] = True
        m = match_descriptors(jnp.asarray(dq), jnp.ones(8, bool),
                              jnp.asarray(dq), jnp.asarray(mt), impl="xla")
        assert int(m.count) == 0

    def test_pallas_interpret_matches_xla(self):
        dq = self._random_descs(256, seed=6)
        dt = self._random_descs(256, seed=7)
        mt = np.ones(256, bool)
        mt[100:120] = False
        min1, idx1, min2 = top2_distances_pallas(
            jnp.asarray(dq), jnp.asarray(dt), jnp.asarray(mt), interpret=True
        )
        D = np.linalg.norm(dq[:, None, :] - dt[None, :, :], axis=-1) ** 2
        D[:, ~mt] = np.inf
        np.testing.assert_allclose(np.asarray(min1), D.min(axis=1), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx1), D.argmin(axis=1))
        D2 = D.copy()
        D2[np.arange(256), D.argmin(axis=1)] = np.inf
        np.testing.assert_allclose(np.asarray(min2), D2.min(axis=1), atol=1e-4)

    def test_pallas_odd_shapes_match_xla(self):
        """Internal padding must make any (Q, T, D) work (VERDICT r1 #8)."""
        for q, t, d in [(37, 91, 64), (384, 200, 64), (8, 3, 128), (256, 512, 48)]:
            dq = self._random_descs(q, d, seed=q)
            dt = self._random_descs(t, d, seed=t)
            mt = np.ones(t, bool)
            mt[:: max(t // 5, 1)] = False
            min1, idx1, min2 = top2_distances_pallas(
                jnp.asarray(dq), jnp.asarray(dt), jnp.asarray(mt), interpret=True
            )
            D = np.linalg.norm(dq[:, None, :] - dt[None, :, :], axis=-1) ** 2
            D[:, ~mt] = np.inf
            np.testing.assert_allclose(np.asarray(min1), D.min(axis=1), atol=1e-4)
            np.testing.assert_array_equal(np.asarray(idx1), D.argmin(axis=1))

    def test_fits_vmem_bound(self):
        from ergo_uvo_tpu.features.pallas_matcher import fits_vmem

        assert fits_vmem(512, 512, 64)
        assert fits_vmem(2048, 2048, 64)
        assert not fits_vmem(512, 200_000, 64)

    def test_match_and_gather_alignment(self):
        img = textured_image()
        shifted = np.roll(img, (0, 5), axis=(0, 1))
        k1, d1 = detect_and_describe(jnp.asarray(img), max_keypoints=128)
        k2, d2 = detect_and_describe(jnp.asarray(shifted), max_keypoints=128)
        prev, curr, m = match_and_gather(k1.xy, d1, k1.mask, k2.xy, d2, k2.mask)
        ok = np.asarray(m.mask)
        assert ((np.asarray(prev)[~ok]) == 0).all()
        disp = np.asarray(curr)[ok] - np.asarray(prev)[ok]
        assert np.median(disp[:, 0]) == np.float32(5.0) or abs(np.median(disp[:, 0]) - 5) < 1.0
