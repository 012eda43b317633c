"""Batched small-matrix linear algebra tuned for TPU.

XLA's generic `eigh`/`svd` on TPU are iterative QDWH-style algorithms that are
expensive for large *batches* of tiny matrices (the RANSAC regime: hundreds of
9x9 / 12x12 systems per frame).  These replacements are pure elementwise/VPU
code with static unrolled control flow:

  * :func:`jacobi_eigh` — cyclic two-sided Jacobi for batched symmetric
    matrices (machine-precision for the small sizes used here);
  * :func:`smallest_eigvec` — the null-space extractor for DLT solvers;
  * :func:`polar_so3` — Newton polar iteration projecting a near-rotation
    onto SO(3) (replaces per-hypothesis 3x3 SVD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def jacobi_eigh(A: jax.Array, sweeps: int = 7):
    """Eigendecomposition of batched symmetric (..., n, n) matrices.

    Cyclic Jacobi with unrolled (p, q) sequence; `sweeps` full sweeps give
    ~machine precision for n <= 16.  Returns (eigvals (..., n) ascending,
    eigvecs (..., n, n) with columns as vectors), like `jnp.linalg.eigh`.
    """
    n = A.shape[-1]
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)

    def rotate(state, p, q):
        A, V = state
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        # Jacobi rotation zeroing A[p, q]; guard the already-zero case.
        small = jnp.abs(apq) < 1e-30
        tau = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c

        # Rows p, q of A.
        Ap = A[..., p, :]
        Aq = A[..., q, :]
        A = A.at[..., p, :].set(c[..., None] * Ap - s[..., None] * Aq)
        A = A.at[..., q, :].set(s[..., None] * Ap + c[..., None] * Aq)
        # Columns p, q of A.
        Ap = A[..., :, p]
        Aq = A[..., :, q]
        A = A.at[..., :, p].set(c[..., None] * Ap - s[..., None] * Aq)
        A = A.at[..., :, q].set(s[..., None] * Ap + c[..., None] * Aq)
        # Accumulate V (columns).
        Vp = V[..., :, p]
        Vq = V[..., :, q]
        V = V.at[..., :, p].set(c[..., None] * Vp - s[..., None] * Vq)
        V = V.at[..., :, q].set(s[..., None] * Vp + c[..., None] * Vq)
        return A, V

    state = (A, V)
    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                state = rotate(state, p, q)
    A, V = state
    eigvals = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(eigvals, axis=-1)
    eigvals = jnp.take_along_axis(eigvals, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return eigvals, V


def smallest_eigvec(A: jax.Array, sweeps: int = 7) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of symmetric (..., n, n)."""
    _, V = jacobi_eigh(A, sweeps)
    v = V[..., :, 0]
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def inv33(A: jax.Array, eps: float = 1e-20) -> jax.Array:
    """Closed-form batched 3x3 inverse via the adjugate."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], -1),
            jnp.stack([c01, c11, c21], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        -2,
    )
    safe = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    return adj / safe[..., None, None]


def polar_so3(M: jax.Array, iters: int = 12) -> jax.Array:
    """Project batched near-rotations (..., 3, 3) onto SO(3).

    Newton iteration for the polar factor, X <- (X + X^-T)/2, with an initial
    Frobenius normalization and a determinant sign fix — replaces the batched
    SVD of `project_to_so3` on hot paths.  Converges quadratically for any
    nonsingular M; improper inputs flip the last row's sign contribution via
    det correction at the end.
    """
    # Normalize scale so the iteration starts near the unit ball.
    scale = jnp.sqrt(
        jnp.maximum(jnp.sum(M * M, axis=(-2, -1), keepdims=True) / 3.0, 1e-20)
    )
    X = M / scale

    def body(_, X):
        Xi = inv33(X)
        return 0.5 * (X + jnp.swapaxes(Xi, -1, -2))

    X = jax.lax.fori_loop(0, iters, body, X)
    # Ensure a proper rotation (det +1): flip the column paired with the
    # smallest singular value — approximated by flipping via det sign on the
    # whole matrix (exact when M was a reflection of a rotation).
    d = jnp.sign(jnp.linalg.det(X))
    fix = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], -1)
    return X * fix[..., None, :]
