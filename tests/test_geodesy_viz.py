"""Geodesy (LL<->NE/NED), RPY-rate Jacobian, and match-visualization tests.

Covers the reference's math_utility.cpp:25-28 (compute_jacobian) and :262-335
(ll2ne / lld2ned / ne2ll), plus the host-side replacement for show_matches
(VO_utility.cpp:756-763).
"""

import numpy as np
import pytest

from ergo_uvo_tpu.geometry import (
    ll_to_ne,
    lld_to_ned,
    ne_to_ll,
    ned_to_lld,
    rpy_rate_jacobian,
)
from ergo_uvo_tpu.utils import draw_matches, dump_matches

pytestmark = pytest.mark.fast  # smoke tier: small shapes, cheap compiles


class TestGeodesy:
    def test_roundtrip_ll_ne(self):
        ll0 = np.array([43.72, 10.39])  # Pisa-ish, the reference lab's waters
        ll = np.array([[43.721, 10.391], [43.719, 10.388], [43.72, 10.39]])
        ne = ll_to_ne(ll0, ll)
        back = ne_to_ll(ll0, ne)
        np.testing.assert_allclose(back, ll, atol=1e-10)

    def test_origin_maps_to_zero(self):
        ll0 = np.array([12.0, -45.0])
        np.testing.assert_allclose(ll_to_ne(ll0, ll0), 0.0, atol=1e-12)

    def test_metric_scale_one_arcsecond(self):
        # 1 arcsec of latitude ~ 30.8-30.9 m at mid latitudes (WGS-84).
        ll0 = np.array([45.0, 7.0])
        ne = ll_to_ne(ll0, ll0 + np.array([1.0 / 3600.0, 0.0]))
        assert 30.7 < ne[0] < 31.0
        assert abs(ne[1]) < 1e-9

    def test_east_shrinks_with_latitude(self):
        dlon = np.array([0.0, 0.01])
        e_equator = ll_to_ne([0.0, 0.0], [0.0, 0.01])[1]
        e_60 = ll_to_ne([60.0, 0.0], [60.0, 0.01])[1]
        # Rn itself grows ~0.25% from equator to 60N, so compare loosely.
        assert e_60 == pytest.approx(e_equator * np.cos(np.deg2rad(60.0)), rel=4e-3)
        del dlon

    def test_reference_formula_parity(self):
        # Recompute with the reference's literal atan2(1, R) formulation
        # (math_utility.cpp:280-285) and compare.
        ll0 = np.array([43.5, 10.2])
        ll = np.array([43.5123, 10.2456])
        lat0, lat = np.deg2rad(ll0[0]), np.deg2rad(ll[0])
        lon0, lon = np.deg2rad(ll0[1]), np.deg2rad(ll[1])
        a, f = 6378137.0, 1 / 298.257223563
        e2 = 2 * f - f * f
        Rn = a / np.sqrt(1 - e2 * np.sin(lat0) ** 2)
        Rm = Rn * (1 - e2) / (1 - e2 * np.sin(lat0) ** 2)
        ref_n = (lat - lat0) / np.arctan2(1, Rm)
        ref_e = (lon - lon0) / np.arctan2(1, Rn * np.cos(lat0))
        ne = ll_to_ne(ll0, ll)
        np.testing.assert_allclose(ne, [ref_n, ref_e], rtol=1e-9)

    def test_ned_depth_axis(self):
        lld0 = np.array([43.7, 10.4, 5.0])
        lld = np.array([43.7, 10.4, 17.5])
        ned = lld_to_ned(lld0, lld)
        np.testing.assert_allclose(ned, [0.0, 0.0, 12.5], atol=1e-9)
        np.testing.assert_allclose(ned_to_lld(lld0, ned), lld, atol=1e-10)


class TestRpyRateJacobian:
    def test_identity_at_zero(self):
        J = np.asarray(rpy_rate_jacobian(np.zeros(3)))
        np.testing.assert_allclose(J, np.eye(3), atol=1e-7)

    def test_reference_closed_form(self):
        rpy = np.array([0.3, -0.2, 1.1])
        J = np.asarray(rpy_rate_jacobian(rpy))
        r, p = rpy[0], rpy[1]
        ref = np.array(
            [
                [1, np.sin(r) * np.tan(p), np.cos(r) * np.tan(p)],
                [0, np.cos(r), -np.sin(r)],
                [0, np.sin(r) / np.cos(p), np.cos(r) / np.cos(p)],
            ]
        )
        np.testing.assert_allclose(J, ref, atol=1e-6)

    def test_batched(self):
        rpy = np.random.default_rng(0).uniform(-1, 1, (5, 3))
        J = np.asarray(rpy_rate_jacobian(rpy))
        assert J.shape == (5, 3, 3)


class TestVisualization:
    def _fixture(self):
        rng = np.random.default_rng(1)
        img_a = rng.integers(0, 255, (60, 80), dtype=np.uint8)
        img_b = rng.integers(0, 255, (60, 80), dtype=np.uint8)
        kpa = rng.uniform(0, [79, 59], (16, 2))
        kpb = rng.uniform(0, [79, 59], (16, 2))
        mask = np.ones(16, bool)
        mask[10:] = False
        inl = np.zeros(16, bool)
        inl[:5] = True
        return img_a, kpa, img_b, kpb, mask, inl

    def test_draw_matches_canvas(self):
        img_a, kpa, img_b, kpb, mask, inl = self._fixture()
        canvas = draw_matches(img_a, kpa, img_b, kpb, mask=mask, inliers=inl)
        assert canvas.shape == (60, 160, 3)
        # Green inlier lines and red outlier lines both present.
        assert ((canvas == [0, 255, 0]).all(-1)).any()
        assert ((canvas == [255, 64, 64]).all(-1)).any()

    def test_dump_matches_writes_file(self, tmp_path):
        img_a, kpa, img_b, kpb, mask, inl = self._fixture()
        path = dump_matches(str(tmp_path), 3, "inliers", img_a, kpa, img_b, kpb, mask)
        assert path.endswith((".png", ".ppm"))
        import os

        assert os.path.getsize(path) > 100
