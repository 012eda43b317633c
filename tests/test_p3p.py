"""Batched P3P: exact recovery on general and coplanar point triples."""

import jax
import jax.numpy as jnp
import numpy as np

from ergo_uvo_tpu.estimation.p3p import _cubic_real_roots, p3p
from ergo_uvo_tpu.geometry.rotations import so3_exp
import pytest

pytestmark = pytest.mark.fast  # smoke tier: small shapes, cheap compiles

RNG = np.random.default_rng(0)


def _random_poses(h):
    w = 0.3 * RNG.standard_normal((h, 3)).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray(w)))
    t = RNG.uniform(-1, 1, (h, 3)).astype(np.float32)
    t[:, 2] += 6.0
    return R, t


def _best_candidate_errors(Xw, R_gt, t_gt):
    pc = np.einsum("hij,hnj->hni", R_gt, Xw) + t_gt[:, None, :]
    assert (pc[..., 2] > 0.1).all()
    y = pc / np.linalg.norm(pc, axis=-1, keepdims=True)
    R, t, valid = p3p(jnp.asarray(Xw), jnp.asarray(y))
    R, t, valid = np.asarray(R), np.asarray(t), np.asarray(valid)
    rerr = np.linalg.norm(R - R_gt[:, None], axis=(-2, -1))
    terr = np.linalg.norm(t - t_gt[:, None], axis=-1)
    err = np.where(valid, rerr + terr, np.inf)
    return err.min(-1), valid


class TestCubic:
    def test_known_roots(self):
        # (x-1)(x-2)(x-3) = x^3 - 6x^2 + 11x - 6
        roots, valid = _cubic_real_roots(
            jnp.asarray([-6.0]), jnp.asarray([11.0]), jnp.asarray([-6.0]),
            jnp.asarray([1.0]),
        )
        got = np.sort(np.asarray(roots)[0][np.asarray(valid)[0]])
        np.testing.assert_allclose(got, [1.0, 2.0, 3.0], atol=1e-5)

    def test_single_real_root(self):
        # x^3 + x + 1 has one real root ~ -0.6823
        roots, valid = _cubic_real_roots(
            jnp.asarray([1.0]), jnp.asarray([1.0]), jnp.asarray([0.0]),
            jnp.asarray([1.0]),
        )
        v = np.asarray(valid)[0]
        assert v[0] and not v[1] and not v[2]
        np.testing.assert_allclose(np.asarray(roots)[0, 0], -0.68232780, atol=1e-5)


class TestP3P:
    def test_general_points_exact(self):
        H = 256
        R_gt, t_gt = _random_poses(H)
        Xw = RNG.uniform(-2, 2, (H, 3, 3)).astype(np.float32)
        best, valid = _best_candidate_errors(Xw, R_gt, t_gt)
        assert valid.any(-1).mean() > 0.98
        assert np.median(best) < 1e-3
        assert np.mean(best < 1e-2) > 0.95

    def test_coplanar_points_exact(self):
        """The planar case that kills projection-matrix DLT (seafloor scenes)."""
        H = 256
        R_gt, t_gt = _random_poses(H)
        Xw = np.concatenate(
            [RNG.uniform(-2, 2, (H, 3, 2)), np.zeros((H, 3, 1))], -1
        ).astype(np.float32)
        best, valid = _best_candidate_errors(Xw, R_gt, t_gt)
        assert valid.any(-1).mean() > 0.9
        assert np.mean(best < 1e-2) > 0.85

    def test_collinear_flagged_invalid(self):
        H = 64
        R_gt, t_gt = _random_poses(H)
        base = RNG.uniform(-2, 2, (H, 1, 3)).astype(np.float32)
        direction = RNG.uniform(-1, 1, (H, 1, 3)).astype(np.float32)
        lam = np.asarray([0.0, 1.0, 2.0], np.float32)[None, :, None]
        Xw = base + lam * direction
        pc = np.einsum("hij,hnj->hni", R_gt, Xw) + t_gt[:, None, :]
        y = pc / np.linalg.norm(pc, axis=-1, keepdims=True)
        _, _, valid = p3p(jnp.asarray(Xw), jnp.asarray(y))
        # Collinear triples must not claim a confident unique pose; the triad
        # validity gate should mark (nearly) all candidates invalid.
        assert np.asarray(valid).mean() < 0.2

    def test_jit_and_vmap_clean(self):
        H = 32
        R_gt, t_gt = _random_poses(H)
        Xw = RNG.uniform(-2, 2, (H, 3, 3)).astype(np.float32)
        pc = np.einsum("hij,hnj->hni", R_gt, Xw) + t_gt[:, None, :]
        y = pc / np.linalg.norm(pc, axis=-1, keepdims=True)
        R, t, valid = jax.jit(p3p)(jnp.asarray(Xw), jnp.asarray(y))
        assert R.shape == (H, 12, 3, 3) and t.shape == (H, 12, 3)
        assert np.isfinite(np.asarray(R)[np.asarray(valid)]).all()
