"""Batched closed-form P3P (Lambda-Twist style) for vectorized PnP RANSAC.

Why P3P and not DLT: the reference's scenes are seafloor surveys — the
triangulated 3D point clouds are near-coplanar, which makes the 12-dof
projection-matrix DLT (a valid pose solver only for non-degenerate 3D point
configurations) rank-deficient and its hypotheses garbage.  P3P has no planar
degeneracy (only collinear triples fail), so it is the correct minimal solver
for the ``solvePnPRansac`` replacement (reference call:
visual_odometry.h:647-648).

The algorithm is Persson & Nordberg's Lambda Twist decomposition, restated as
pure batched closed-form steps (everything vectorizes over hypotheses — no
per-hypothesis control flow, TPU/VPU friendly):

  1. depth constraints  d_i^2 + d_j^2 - 2 b_ij d_i d_j = a_ij  as quadratic
     forms d^T M_ij d = a_ij;
  2. two homogeneous quadrics D1, D2 by eliminating the constants;
  3. real roots of the cubic det(D1 + g D2) = 0 (trig/Cardano closed form,
     polished by Newton steps);
  4. rank-2 pencil member factored into two planes via a batched 3x3 Jacobi
     eigendecomposition (geometry/linalg.py);
  5. plane ∩ quadric -> up to 2 depth directions per plane; scale from the
     inhomogeneous constraint; positivity gate;
  6. rotation from exact triad alignment of the two 3-point frames.

All (root, plane, quadratic-branch) combinations are emitted as candidate
poses (12 per minimal set, many flagged invalid / duplicates) — RANSAC
scoring over all correspondences disambiguates, which is cheaper on TPU than
per-hypothesis branch pruning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.geometry.linalg import jacobi_eigh

_EPS = 1e-9


def _det3_mixed(c1a, c2a, c3a, c1b, c2b, c3b):
    """Coefficients of det([c1a+g*c1b | c2a+g*c2b | c3a+g*c3b]) in g.

    Columns are (..., 3) vectors; returns (k0, k1, k2, k3) with
    det = k0 + k1 g + k2 g^2 + k3 g^3 via the triple-product expansion.
    """

    def trip(u, v, w):
        return jnp.sum(u * jnp.cross(v, w), -1)

    k0 = trip(c1a, c2a, c3a)
    k1 = trip(c1b, c2a, c3a) + trip(c1a, c2b, c3a) + trip(c1a, c2a, c3b)
    k2 = trip(c1a, c2b, c3b) + trip(c1b, c2a, c3b) + trip(c1b, c2b, c3a)
    k3 = trip(c1b, c2b, c3b)
    return k0, k1, k2, k3


def _cubic_real_roots(k0, k1, k2, k3):
    """All-real-root candidates of k3 x^3 + k2 x^2 + k1 x + k0 = 0.

    Returns (roots (..., 3), valid (..., 3)).  Uses the trigonometric method
    when three real roots exist, Cardano's single real root otherwise
    (duplicated into slot 0 with slots 1-2 invalid).  Near-degenerate leading
    coefficients fall back to the quadratic/linear root in slot 0.
    """
    dtype = k0.dtype
    k3_ok = jnp.abs(k3) > 1e-12
    k3s = jnp.where(k3_ok, k3, 1.0)
    a = k2 / k3s
    b = k1 / k3s
    c = k0 / k3s
    # Depressed cubic t^3 + p t + q, x = t - a/3.
    p = b - a * a / 3.0
    q = 2.0 * a * a * a / 27.0 - a * b / 3.0 + c
    shift = -a / 3.0
    disc = 4.0 * p * p * p + 27.0 * q * q  # < 0 => three distinct real roots

    # --- trigonometric branch (three real roots; needs p < 0).
    p_neg = jnp.minimum(p, -1e-12)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    trig = jnp.stack(
        [
            m * jnp.cos(theta),
            m * jnp.cos(theta - two_pi_3),
            m * jnp.cos(theta - 2.0 * two_pi_3),
        ],
        -1,
    ) + shift[..., None]

    # --- Cardano branch (one real root).
    sq = jnp.sqrt(jnp.maximum(disc / 108.0, 0.0))
    u3 = -q / 2.0 + sq
    v3 = -q / 2.0 - sq
    single = jnp.cbrt(u3) + jnp.cbrt(v3) + shift

    three_real = (disc < 0.0) & (p < 0.0)
    roots = jnp.where(three_real[..., None], trig, single[..., None])
    valid = jnp.stack(
        [jnp.ones_like(three_real), three_real, three_real], -1
    )

    # --- quadratic fallback when k3 ~ 0: k2 x^2 + k1 x + k0 = 0.
    k2_ok = jnp.abs(k2) > 1e-12
    qd = k1 * k1 - 4.0 * k2 * k0
    k2s = jnp.where(k2_ok, k2, 1.0)
    r_quad0 = (-k1 + jnp.sqrt(jnp.maximum(qd, 0.0))) / (2.0 * k2s)
    r_quad1 = (-k1 - jnp.sqrt(jnp.maximum(qd, 0.0))) / (2.0 * k2s)
    r_lin = -k0 / jnp.where(jnp.abs(k1) > 1e-12, k1, 1.0)
    fb0 = jnp.where(k2_ok, r_quad0, r_lin)
    fb1 = jnp.where(k2_ok, r_quad1, r_lin)
    fb_valid0 = jnp.where(k2_ok, qd >= 0.0, jnp.abs(k1) > 1e-12)
    fb = jnp.stack([fb0, fb1, jnp.zeros_like(fb0)], -1)
    fb_valid = jnp.stack([fb_valid0, fb_valid0 & k2_ok, jnp.zeros_like(k2_ok)], -1)

    roots = jnp.where(k3_ok[..., None], roots, fb)
    valid = jnp.where(k3_ok[..., None], valid, fb_valid)

    # Newton polish (restores f32 accuracy lost in the closed forms).
    def newton(r):
        f = ((k3[..., None] * r + k2[..., None]) * r + k1[..., None]) * r + k0[..., None]
        df = (3.0 * k3[..., None] * r + 2.0 * k2[..., None]) * r + k1[..., None]
        return r - f / jnp.where(jnp.abs(df) > _EPS, df, jnp.inf)

    roots = newton(newton(roots)).astype(dtype)
    return roots, valid


def _homogeneous_quadratic_pairs(A, B, C):
    """(alpha, beta) solutions of A a^2 + 2 B a b + C b^2 = 0.

    Returns ((..., 2, 2) pairs, (..., 2) valid).  Branchless: uses the
    (-B ± sqrt(B²-AC), A) parameterization, with the A≈0 special case
    ((1, 0) and (-C, 2B)) selected by mask.
    """
    disc = B * B - A * C
    s = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_ok = jnp.abs(A) > _EPS
    sol0 = jnp.stack([-B + s, A], -1)
    sol1 = jnp.stack([-B - s, A], -1)
    alt0 = jnp.stack([jnp.ones_like(A), jnp.zeros_like(A)], -1)
    alt1 = jnp.stack([-C, 2.0 * B], -1)
    p0 = jnp.where(a_ok[..., None], sol0, alt0)
    p1 = jnp.where(a_ok[..., None], sol1, alt1)
    v0 = jnp.where(a_ok, disc >= 0.0, jnp.ones_like(a_ok))
    v1 = jnp.where(a_ok, disc >= 0.0, jnp.abs(B) > _EPS)
    return jnp.stack([p0, p1], -2), jnp.stack([v0, v1], -1)


def _triad(P):
    """Orthonormal frame (..., 3, 3) from three points (..., 3, 3) + validity.

    Columns: f1 along P2-P1, f2 the orthogonal part of P3-P1, f3 = f1 x f2.
    """
    e1 = P[..., 1, :] - P[..., 0, :]
    e2 = P[..., 2, :] - P[..., 0, :]
    n1 = jnp.linalg.norm(e1, axis=-1, keepdims=True)
    f1 = e1 / jnp.maximum(n1, _EPS)
    g = e2 - jnp.sum(e2 * f1, -1, keepdims=True) * f1
    n2 = jnp.linalg.norm(g, axis=-1, keepdims=True)
    f2 = g / jnp.maximum(n2, _EPS)
    f3 = jnp.cross(f1, f2)
    ok = (n1[..., 0] > _EPS) & (n2[..., 0] > 1e-6)
    return jnp.stack([f1, f2, f3], -1), ok


def p3p(X: jax.Array, y: jax.Array):
    """Batched P3P: world triples + unit bearings -> candidate poses.

    Args:
      X: (..., 3, 3) world points (rows).
      y: (..., 3, 3) unit bearing vectors in the camera frame (rows),
         y_i ∝ (x_n, y_n, 1) normalized.

    Returns (R, t, valid): (..., 12, 3, 3), (..., 12, 3), (..., 12) —
    candidates over 3 cubic roots × 2 planes × 2 quadratic branches, with
    x_cam = R @ X + t (OpenCV rvec/tvec convention).
    """
    dtype = X.dtype
    b12 = jnp.sum(y[..., 0, :] * y[..., 1, :], -1)
    b13 = jnp.sum(y[..., 0, :] * y[..., 2, :], -1)
    b23 = jnp.sum(y[..., 1, :] * y[..., 2, :], -1)
    a12 = jnp.sum((X[..., 0, :] - X[..., 1, :]) ** 2, -1)
    a13 = jnp.sum((X[..., 0, :] - X[..., 2, :]) ** 2, -1)
    a23 = jnp.sum((X[..., 1, :] - X[..., 2, :]) ** 2, -1)

    z = jnp.zeros_like(b12)
    o = jnp.ones_like(b12)

    def sym(m11, m22, m33, m12, m13, m23):
        r1 = jnp.stack([m11, m12, m13], -1)
        r2 = jnp.stack([m12, m22, m23], -1)
        r3 = jnp.stack([m13, m23, m33], -1)
        return jnp.stack([r1, r2, r3], -2)

    M12 = sym(o, o, z, -b12, z, z)
    M13 = sym(o, z, o, z, -b13, z)
    M23 = sym(z, o, o, z, z, -b23)

    # Homogeneous quadrics: d^T D d = 0.
    D1 = M12 * a13[..., None, None] - M13 * a12[..., None, None]
    D2 = M23 * a13[..., None, None] - M13 * a23[..., None, None]

    k0, k1, k2, k3 = _det3_mixed(
        D1[..., :, 0], D1[..., :, 1], D1[..., :, 2],
        D2[..., :, 0], D2[..., :, 1], D2[..., :, 2],
    )
    roots, roots_valid = _cubic_real_roots(k0, k1, k2, k3)  # (..., 3)

    # Pencil member per root: (..., 3, 3, 3)  [root axis inserted at -3].
    D0 = D1[..., None, :, :] + roots[..., None, None] * D2[..., None, :, :]
    evals, evecs = jacobi_eigh(D0)  # ascending eigenvalues
    lam_min = evals[..., 0]
    lam_mid = evals[..., 1]
    lam_max = evals[..., 2]
    sig_ok = (lam_max > _EPS) & (lam_min < -_EPS)
    # Rank-2 check: the middle eigenvalue must be the small one.
    rank_ok = jnp.abs(lam_mid) <= 0.1 * jnp.maximum(lam_max, -lam_min)
    e_min = evecs[..., :, 0]
    e_mid = evecs[..., :, 1]
    e_max = evecs[..., :, 2]
    sp = jnp.sqrt(jnp.maximum(lam_max, 0.0))[..., None]
    sn = jnp.sqrt(jnp.maximum(-lam_min, 0.0))[..., None]
    # Two factor planes through the origin; e_mid lies in both.
    normals = jnp.stack([sp * e_max + sn * e_min, sp * e_max - sn * e_min], -2)
    nrm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    n_hat = normals / jnp.maximum(nrm, _EPS)  # (..., 3, 2, 3)

    u = jnp.broadcast_to(e_mid[..., None, :], n_hat.shape)  # in-plane basis 1
    w = jnp.cross(n_hat, u)  # in-plane basis 2

    # Intersect each plane with quadric D2 (homogeneous in alpha, beta).
    D2b = D2[..., None, None, :, :]
    A = jnp.einsum("...i,...ij,...j->...", u, D2b, u)
    Bq = jnp.einsum("...i,...ij,...j->...", u, D2b, w)
    C = jnp.einsum("...i,...ij,...j->...", w, D2b, w)
    ab, ab_valid = _homogeneous_quadratic_pairs(A, Bq, C)  # (..., 3, 2, 2, 2)

    v = ab[..., 0:1] * u[..., None, :] + ab[..., 1:2] * w[..., None, :]
    v_nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.maximum(v_nrm, _EPS)  # (..., 3, 2, 2, 3) depth directions

    # Scale from d^T M12 d = a12; positivity gate on all depths.
    M12b = M12[..., None, None, None, :, :]
    qf = jnp.einsum("...i,...ij,...j->...", v, M12b, v)
    q_ok = qf > _EPS
    s = jnp.sqrt(a12[..., None, None, None] / jnp.where(q_ok, qf, 1.0))
    d = s[..., None] * v
    d = d * jnp.sign(jnp.sum(d, -1, keepdims=True))  # orient positive
    d_ok = jnp.all(d > _EPS, -1)

    # Flatten candidates: 3 roots × 2 planes × 2 branches -> 12.
    batch = X.shape[:-2]
    d = d.reshape(*batch, 12, 3)
    valid = (
        (roots_valid & sig_ok & rank_ok)[..., :, None, None]
        & ab_valid
        & q_ok
        & d_ok
    ).reshape(*batch, 12)

    # Camera-frame points and exact triad alignment.
    Z = d[..., None] * y[..., None, :, :]  # (..., 12, 3, 3)
    Xb = jnp.broadcast_to(X[..., None, :, :], Z.shape)
    Fz, okz = _triad(Z)
    Fx, okx = _triad(Xb)
    R = Fz @ jnp.swapaxes(Fx, -1, -2)
    cx = jnp.mean(Xb, -2)
    cz = jnp.mean(Z, -2)
    t = cz - jnp.einsum("...ij,...j->...i", R, cx)
    valid = valid & okz & okx
    return R.astype(dtype), t.astype(dtype), valid
