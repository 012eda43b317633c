"""Batched small-matrix linalg: Jacobi eigh + polar SO(3) vs LAPACK."""

import jax.numpy as jnp
import numpy as np

from ergo_uvo_tpu.geometry.linalg import inv33, jacobi_eigh, polar_so3, smallest_eigvec
from ergo_uvo_tpu.geometry.rotations import is_rotation_matrix, so3_exp
import pytest

pytestmark = pytest.mark.fast  # smoke tier: small shapes, cheap compiles

RNG = np.random.default_rng(0)


def random_sym(b, n):
    A = RNG.standard_normal((b, n, n)).astype(np.float32)
    return (A + A.transpose(0, 2, 1)) / 2


class TestJacobi:
    def test_eigvals_match_numpy(self):
        for n in (3, 9, 12):
            A = random_sym(64, n)
            vals, vecs = jacobi_eigh(jnp.asarray(A))
            ref = np.linalg.eigvalsh(A)
            np.testing.assert_allclose(np.asarray(vals), ref, atol=2e-4)

    def test_eigvecs_are_eigvecs(self):
        A = random_sym(32, 9)
        vals, vecs = jacobi_eigh(jnp.asarray(A))
        Av = np.einsum("bij,bjk->bik", A, np.asarray(vecs))
        lv = np.asarray(vals)[:, None, :] * np.asarray(vecs)
        np.testing.assert_allclose(Av, lv, atol=2e-3)

    def test_smallest_eigvec_nullspace(self):
        # Build PSD matrices with a known 1-dim null space: A = B B^T with
        # B (n, n-1).
        n, b = 9, 64
        B = RNG.standard_normal((b, n, n - 1)).astype(np.float32)
        A = np.einsum("bij,bkj->bik", B, B)
        v = np.asarray(smallest_eigvec(jnp.asarray(A)))
        residual = np.einsum("bij,bj->bi", A, v)
        assert np.abs(residual).max() < 5e-3


class TestPolar:
    def test_recovers_rotation(self):
        w = RNG.standard_normal((128, 3)).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        noisy = R * RNG.uniform(0.5, 2.0, (128, 1, 1)).astype(np.float32)
        noisy = noisy + 0.02 * RNG.standard_normal(noisy.shape).astype(np.float32)
        Rp = polar_so3(jnp.asarray(noisy))
        assert bool(jnp.all(is_rotation_matrix(Rp, tol=1e-3)))
        # close to the original rotation
        tr = np.einsum("bii->b", np.einsum("bji,bjk->bik", R, np.asarray(Rp)))
        ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
        assert np.percentile(ang, 95) < 3.0

    def test_inv33(self):
        A = RNG.standard_normal((64, 3, 3)).astype(np.float32) + 3 * np.eye(3, dtype=np.float32)
        Ai = np.asarray(inv33(jnp.asarray(A)))
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", A, Ai),
            np.broadcast_to(np.eye(3, dtype=np.float32), (64, 3, 3)),
            atol=1e-4,
        )
