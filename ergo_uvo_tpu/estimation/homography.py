"""Homography estimation, decomposition and pose vote — batched.

TPU-native replacement for ``findHomography`` + ``decomposeHomographyMat`` +
the reference's candidate vote ``recover_pose_homography``
(VO_utility.cpp:152-154, :581-624).

  * 4-point DLT per hypothesis as a batched 8x8 linear solve (h33 = 1 gauge);
  * forward transfer error ||p2 - H p1||^2 in pixels (OpenCV's residual);
  * calibrated decomposition H' = K^-1 H K via the Faugeras/Zhang SVD method,
    yielding 8 (R, t, n) candidates (both plane-sign cases; OpenCV's
    Malis-Vargas returns the 4 with n_z > 0 — the extra candidates are
    eliminated by the same cheirality vote, so the selected pose matches);
  * the vote replicates the reference exactly: triangulate the inliers with
    P1 = K[I|0], P2 = K[R|t] and count points with 0 < Z_frame1 <
    HOMOGRAPHY_DISTANCE (VO_utility.cpp:598-607); on a zero-vote tie the
    previous (R, t) is kept (reference leaves the output Mats untouched,
    VO_utility.cpp:612-619).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.estimation.robust import inlier_mask_for_model, score_hypotheses
from ergo_uvo_tpu.estimation.sampling import sample_minimal_sets
from ergo_uvo_tpu.geometry.linalg import smallest_eigvec
from ergo_uvo_tpu.geometry.triangulation import triangulate_points


def four_point_homography(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Batched exact homography from 4 correspondences (pixel coords).

    p1, p2: (H, 4, 2).  Returns (H, 3, 3) with H[2,2] = 1.  Degenerate sets
    produce non-finite entries, which robust scoring rejects.
    """
    x, y = p1[..., 0], p1[..., 1]  # (H, 4)
    xp, yp = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows_x = jnp.stack([x, y, o, z, z, z, -xp * x, -xp * y], -1)  # (H, 4, 8)
    rows_y = jnp.stack([z, z, z, x, y, o, -yp * x, -yp * y], -1)
    A = jnp.concatenate([rows_x, rows_y], -2)  # (H, 8, 8)
    b = jnp.concatenate([xp, yp], -1)  # (H, 8)
    h = jnp.linalg.solve(A, b[..., None])[..., 0]
    ones = jnp.ones((*h.shape[:-1], 1), h.dtype)
    return jnp.concatenate([h, ones], -1).reshape(*h.shape[:-1], 3, 3)


def homography_transfer_error_sq(
    H: jax.Array, p1: jax.Array, p2: jax.Array
) -> jax.Array:
    """Forward transfer error ||p2 - H(p1)||^2 in pixels. H: (...,3,3)."""
    ones = jnp.ones_like(p1[..., :1])
    P1 = jnp.concatenate([p1, ones], -1)  # (N, 3)
    q = jnp.einsum("...ij,nj->...ni", H, P1)
    w = q[..., 2]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    proj = q[..., :2] / safe_w[..., None]
    return jnp.sum((proj - p2) ** 2, -1)


def decompose_homography(H: jax.Array, K: jax.Array):
    """Calibrated homography -> 4 (R, t, n) candidates (Faugeras SVD method).

    A plane-induced calibrated homography is A = d*R + t n^T (plane n.x = d in
    frame 1).  In the SVD basis A = U diag(l1, 1, l3) V^T (after the 1/sigma_2
    gauge), Faugeras' closed form gives four solutions indexed by the signs
    (e1, e3); the (n, d) -> (-n, -d) symmetry makes the d > 0 quadruple
    exhaustive, matching ``decomposeHomographyMat``'s 4 candidates.  t is up
    to scale (the vote normalizes it, VO_utility.cpp:614-617).
    Returns (Rs (4,3,3), ts (4,3), ns (4,3)).
    """
    Kinv = jnp.linalg.inv(K)
    Hn = Kinv @ H @ K
    u, s, vt = jnp.linalg.svd(Hn)
    l1 = s[0] / s[1]
    l3 = s[2] / s[1]
    sdet = jnp.linalg.det(u) * jnp.linalg.det(vt)

    denom = jnp.maximum(l1 * l1 - l3 * l3, 1e-12)
    x1 = jnp.sqrt(jnp.clip((l1 * l1 - 1.0) / denom, 0.0, None))
    x3 = jnp.sqrt(jnp.clip((1.0 - l3 * l3) / denom, 0.0, None))
    zero = jnp.zeros_like(x1)

    def candidate(e1, e3):
        sin_t = (l1 - l3) * x1 * x3 * e1 * e3
        cos_t = l1 * x3 * x3 + l3 * x1 * x1
        Rp = jnp.stack(
            [
                jnp.stack([cos_t, zero, -sin_t]),
                jnp.asarray([0.0, 1.0, 0.0], H.dtype),
                jnp.stack([sin_t, zero, cos_t]),
            ]
        )
        tp = (l1 - l3) * jnp.stack([x1 * e1, zero, -x3 * e3])
        np_ = jnp.stack([x1 * e1, zero, x3 * e3])
        return sdet * (u @ Rp @ vt), u @ tp, vt.T @ np_

    out = [candidate(e1, e3) for e1 in (1.0, -1.0) for e3 in (1.0, -1.0)]
    Rs, ts, ns = zip(*out)
    return jnp.stack(Rs), jnp.stack(ts), jnp.stack(ns)


def recover_pose_homography(
    H: jax.Array,
    xy1: jax.Array,
    xy2: jax.Array,
    inlier_mask: jax.Array,
    K: jax.Array,
    homography_distance: float,
    R_prev: jax.Array,
    t_prev: jax.Array,
):
    """The reference's candidate vote (VO_utility.cpp:581-624), masked.

    Returns (R, t, num_good): t unit-normalized; if every candidate scores
    zero good points, (R_prev, t_prev) pass through unchanged.
    """
    Rs, ts, _ = decompose_homography(H, K)
    zero = jnp.zeros(3, H.dtype)
    P1 = K @ jnp.concatenate([jnp.eye(3, dtype=H.dtype), zero[:, None]], 1)

    def vote(R, t):
        P2 = K @ jnp.concatenate([R, t[:, None]], 1)
        X = triangulate_points(P1, P2, xy1, xy2)
        finite = jnp.all(jnp.isfinite(X), -1)
        z = X[:, 2]
        good = inlier_mask & finite & (z > 0) & (z < homography_distance)
        return jnp.sum(good.astype(jnp.int32))

    votes = jax.vmap(vote)(Rs, ts)
    best = jnp.argmax(votes)
    max_good = votes[best]
    R_best = Rs[best]
    t_best = ts[best]
    t_norm = jnp.linalg.norm(t_best)
    t_best = t_best / jnp.maximum(t_norm, 1e-12)
    found = max_good > 0
    R = jnp.where(found, R_best, R_prev)
    t = jnp.where(found, t_best, t_prev)
    return R, t, max_good


def _hartley_T(p: jax.Array, w: jax.Array) -> jax.Array:
    """Similarity normalizing masked points to mean 0 / mean radius sqrt(2)."""
    wf = w.astype(p.dtype)
    wsum = jnp.maximum(jnp.sum(wf), 1.0)
    mean = jnp.sum(p * wf[:, None], 0) / wsum
    d = jnp.sqrt(jnp.sum((p - mean) ** 2, -1))
    s = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * wf) / wsum, 1e-6)
    zero = jnp.zeros((), p.dtype)
    one = jnp.ones((), p.dtype)
    return jnp.stack(
        [
            jnp.stack([s, zero, -s * mean[0]]),
            jnp.stack([zero, s, -s * mean[1]]),
            jnp.stack([zero, zero, one]),
        ]
    )


def refit_homography(p1: jax.Array, p2: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted normalized-DLT refit over an inlier set (pixel coords)."""
    T1 = _hartley_T(p1, w)
    T2 = _hartley_T(p2, w)

    def apply(T, p):
        return p * T[0, 0] + T[:2, 2]

    q1 = apply(T1, p1)
    q2 = apply(T2, p2)
    x, y = q1[:, 0], q1[:, 1]
    xp, yp = q2[:, 0], q2[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows_x = jnp.stack([x, y, o, z, z, z, -xp * x, -xp * y, -xp], -1)
    rows_y = jnp.stack([z, z, z, x, y, o, -yp * x, -yp * y, -yp], -1)
    A = jnp.concatenate([rows_x, rows_y], 0)  # (2N, 9)
    ww = jnp.concatenate([w, w], 0).astype(p1.dtype)
    AtA = jnp.einsum("n,ni,nj->ij", ww, A, A)
    h = smallest_eigvec(AtA).reshape(3, 3)
    # Denormalize: H = T2^-1 Hn T1, with T2^-1 built in closed form.
    s2 = T2[0, 0]
    zero = jnp.zeros((), p1.dtype)
    one = jnp.ones((), p1.dtype)
    T2_inv = jnp.stack(
        [
            jnp.stack([1.0 / s2, zero, -T2[0, 2] / s2]),
            jnp.stack([zero, 1.0 / s2, -T2[1, 2] / s2]),
            jnp.stack([zero, zero, one]),
        ]
    )
    H = T2_inv @ h @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def find_homography(
    key: jax.Array,
    xy1: jax.Array,
    xy2: jax.Array,
    mask: jax.Array,
    method: int,
    threshold: float,
    num_hypotheses: int,
):
    """findHomography equivalent: (H, inlier_mask); threshold in pixels."""
    idx, sets_valid = sample_minimal_sets(key, mask, num_hypotheses, 4)
    Hs = four_point_homography(xy1[idx], xy2[idx])
    finite = jnp.all(jnp.isfinite(Hs.reshape(Hs.shape[0], -1)), -1)
    r2 = homography_transfer_error_sq(Hs, xy1, xy2)
    best, inliers = score_hypotheses(
        r2, mask, sets_valid & finite, method, threshold, model_points=4
    )

    # ---- final polish: normalized-DLT refit (see essential.py for the
    # LMEDS-single-refit vs RANSAC-iterated distinction).
    from ergo_uvo_tpu.config import LMEDS

    H_out, inl_out = Hs[best], inliers
    rounds = 1 if method == LMEDS else 3
    for _ in range(rounds):
        H_refit = refit_homography(xy1, xy2, inl_out.astype(xy1.dtype))
        finite = jnp.all(jnp.isfinite(H_refit))
        if method == LMEDS:
            H_out = jnp.where(finite, H_refit, H_out)
        else:
            r2_ref = homography_transfer_error_sq(H_refit, xy1, xy2)
            inl_ref = inlier_mask_for_model(r2_ref, mask, method, threshold, 4)
            # Collapse guard only — see essential.py on why count can drop.
            n_ref = jnp.sum(inl_ref.astype(jnp.int32))
            n_old = jnp.sum(inl_out.astype(jnp.int32))
            ok = finite & (n_ref >= jnp.maximum(4, n_old // 2))
            H_out = jnp.where(ok, H_refit, H_out)
            inl_out = jnp.where(ok, inl_ref, inl_out)
    return H_out, inl_out
