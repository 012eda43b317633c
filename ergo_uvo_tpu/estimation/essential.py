"""Essential-matrix estimation and pose recovery — batched, mask-carrying.

TPU-native replacement for ``findEssentialMat`` + ``recoverPose``
(VO_utility.cpp:147-149).  Differences from OpenCV, by design (SURVEY.md §7.3):
the per-hypothesis minimal solver is the normalized 8-point algorithm with
projection onto the essential manifold, instead of Nister's 5-point
(a degree-10 polynomial solve that is numerically hostile to batched f32);
with LMEDS/RANSAC scoring over hundreds of hypotheses the resulting model
distribution matches, and thresholds/confidences carry over unchanged.

Conventions (identical to the reference): points1 = previous frame,
points2 = current frame, recovered (R, t) satisfy x_curr = R @ x_prev + t and
x2^T E x1 = 0 with E = [t]_x R.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.estimation.robust import inlier_mask_for_model, score_hypotheses
from ergo_uvo_tpu.estimation.sampling import sample_minimal_sets
from ergo_uvo_tpu.geometry.linalg import smallest_eigvec
from ergo_uvo_tpu.geometry.rotations import skew, so3_exp
from ergo_uvo_tpu.geometry.triangulation import triangulate_points

# OpenCV recoverPose's hard-coded cheirality distance gate (five-point.cpp):
# triangulated points further than this are treated as "at infinity".
_RECOVER_POSE_DISTANCE = 50.0


def _normalized(K: jax.Array, xy: jax.Array) -> jax.Array:
    """Pixels -> normalized camera coords (no distortion: inputs are from the
    undistorted pipeline image, as in the reference)."""
    x = (xy[..., 0] - K[0, 2]) / K[0, 0]
    y = (xy[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y], -1)


def eight_point_essential(
    x1: jax.Array, x2: jax.Array, project: bool = False
) -> jax.Array:
    """Batched 8-point essential from normalized coords.

    Args: x1, x2 of shape (H, 8, 2).  Returns (H, 3, 3) essential matrices.
    The null vector comes from a batched Jacobi eigensolve (XLA's generic
    batched `eigh` is far slower for hundreds of 9x9 systems on TPU).

    With `project=False` (the RANSAC default) the raw linear solution is
    scored directly — Sampson scoring is insensitive to the (1,1,0) manifold
    projection, so only the *winning* hypothesis gets projected
    (`project_to_essential`), saving a batched SVD per frame.
    """
    ones = jnp.ones_like(x1[..., :1])
    X1 = jnp.concatenate([x1, ones], -1)  # (H, 8, 3)
    X2 = jnp.concatenate([x2, ones], -1)
    # Constraint rows: kron(x2, x1) for x2^T E x1 = 0, E row-major.
    A = jnp.einsum("hni,hnj->hnij", X2, X1).reshape(*x1.shape[:-2], 8, 9)
    AtA = jnp.einsum("hni,hnj->hij", A, A)
    e = smallest_eigvec(AtA)
    E = e.reshape(*e.shape[:-1], 3, 3)
    if project:
        E = project_to_essential(E)
    return E


def project_to_essential(E: jax.Array) -> jax.Array:
    """Project onto the essential manifold: singular values -> (s, s, 0)."""
    u, s, vt = jnp.linalg.svd(E)
    sigma = 0.5 * (s[..., 0] + s[..., 1])
    d = jnp.stack([sigma, sigma, jnp.zeros_like(sigma)], -1)
    return (u * d[..., None, :]) @ vt


def sampson_error_sq(E: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Squared Sampson distance in normalized coords.

    E: (..., 3, 3); x1, x2: (N, 2).  Returns (..., N).
    """
    ones = jnp.ones_like(x1[..., :1])
    X1 = jnp.concatenate([x1, ones], -1)  # (N, 3)
    X2 = jnp.concatenate([x2, ones], -1)
    Ex1 = jnp.einsum("...ij,nj->...ni", E, X1)  # (..., N, 3)
    Etx2 = jnp.einsum("...ji,nj->...ni", E, X2)
    x2tEx1 = jnp.einsum("ni,...ni->...n", X2, Ex1)
    denom = (
        Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    )
    return x2tEx1 * x2tEx1 / jnp.maximum(denom, 1e-12)


def recover_pose_from_essential(
    E: jax.Array,
    x1n: jax.Array,
    x2n: jax.Array,
    mask: jax.Array,
):
    """cv::recoverPose semantics: pick the (R, t) candidate by cheirality vote.

    Args: E (3,3); x1n/x2n (N,2) normalized coords; mask — the epipolar inlier
    mask to vote with.  Returns (R, t, mask_out) where mask_out additionally
    requires the point to pass the winner's cheirality/distance gate (OpenCV
    updates the in-out mask the same way).
    """
    u, _, vt = jnp.linalg.svd(E)
    # Proper rotations only.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))[..., None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[..., :, 2]

    eye = jnp.eye(3, dtype=E.dtype)
    zero = jnp.zeros(3, dtype=E.dtype)
    P1 = jnp.concatenate([eye, zero[:, None]], axis=1)  # [I|0] normalized

    def good_mask(R, tt):
        P2 = jnp.concatenate([R, tt[:, None]], axis=1)
        X = triangulate_points(P1, P2, x1n, x2n)
        z1 = X[:, 2]
        z2 = (X @ R.T + tt)[:, 2]
        finite = jnp.all(jnp.isfinite(X), axis=-1)
        return (
            mask
            & finite
            & (z1 > 0)
            & (z1 < _RECOVER_POSE_DISTANCE)
            & (z2 > 0)
            & (z2 < _RECOVER_POSE_DISTANCE)
        )

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    masks = jnp.stack([good_mask(R, tt) for R, tt in cands])  # (4, N)
    votes = jnp.sum(masks.astype(jnp.int32), axis=-1)
    best = jnp.argmax(votes)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best], masks[best]


def refit_essential(x1: jax.Array, x2: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted 8-point refit over an inlier set (OpenCV's post-RANSAC polish).

    x1/x2: (N, 2) normalized coords; w: (N,) weights (inlier mask).  Returns
    a manifold-projected (3, 3) essential matrix.
    """
    ones = jnp.ones_like(x1[..., :1])
    X1 = jnp.concatenate([x1, ones], -1)
    X2 = jnp.concatenate([x2, ones], -1)
    a = jnp.einsum("ni,nj->nij", X2, X1).reshape(x1.shape[0], 9)
    AtA = jnp.einsum("n,ni,nj->ij", w.astype(x1.dtype), a, a)
    e = smallest_eigvec(AtA)
    return project_to_essential(e.reshape(3, 3))


def gn_refine_essential(
    E0: jax.Array, x1: jax.Array, x2: jax.Array, w: jax.Array, iters: int = 6
) -> jax.Array:
    """Gauss-Newton Sampson-error minimization ON the essential manifold.

    The linear 8-point fit is statistically inefficient — even on a clean
    inlier set its translation direction lands ~5-10x off the noise floor
    (OpenCV's 5-point LMEDS reaches ~0.5 deg on the same data).  Minimizing
    the signed Sampson distance over the 5-dof (R, t_hat) parametrization
    E = [t_hat]_x R closes that gap.  `w`: per-point weights (inlier mask).
    """
    R0, t0, _ = recover_pose_from_essential(E0, x1, x2, w > 0)
    ones = jnp.ones_like(x1[..., :1])
    X1 = jnp.concatenate([x1, ones], -1)
    X2 = jnp.concatenate([x2, ones], -1)

    def params_to_E(p, R, t):
        Rn = so3_exp(p[:3]) @ R
        # 2-dof update of the unit translation in its tangent plane.
        pole = jnp.where(
            jnp.abs(t[2]) < 0.9,
            jnp.asarray([0.0, 0.0, 1.0], t.dtype),
            jnp.asarray([1.0, 0.0, 0.0], t.dtype),
        )
        a = jnp.cross(t, pole)
        a = a / jnp.maximum(jnp.linalg.norm(a), 1e-12)
        b = jnp.cross(t, a)
        tn = t + p[3] * a + p[4] * b
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        return skew(tn) @ Rn, Rn, tn

    def step(carry, _):
        R, t = carry

        def resid(p):
            E, _, _ = params_to_E(p, R, t)
            Ex1 = X1 @ E.T
            Etx2 = X2 @ E
            num = jnp.sum(X2 * Ex1, -1)
            den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
            return num / jnp.sqrt(jnp.maximum(den, 1e-12))

        p0 = jnp.zeros(5, x1.dtype)
        r = resid(p0)
        # Cauchy IRLS on top of the inlier mask: the LMEDS/RANSAC gate leaks
        # a few false positives whose large residuals would bias pure GN.
        from ergo_uvo_tpu.geometry.stats import masked_median

        delta = 1.4826 * masked_median(jnp.abs(r), w > 0) + 1e-12
        wr = w / (1.0 + (r / delta) ** 2)
        J = jax.jacfwd(resid)(p0)  # (N, 5)
        H = J.T @ (wr[:, None] * J) + 1e-9 * jnp.eye(5, dtype=x1.dtype)
        dp = -jnp.linalg.solve(H, J.T @ (wr * r))
        _, Rn, tn = params_to_E(dp, R, t)
        return (Rn, tn), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=iters)
    E = skew(t) @ R
    # Guard: fall back to the linear estimate if GN diverged.
    return jnp.where(jnp.all(jnp.isfinite(E)), E, E0)


def find_essential(
    key: jax.Array,
    xy1: jax.Array,
    xy2: jax.Array,
    mask: jax.Array,
    K: jax.Array,
    method: int,
    threshold: float,
    num_hypotheses: int,
):
    """findEssentialMat equivalent: (E, epipolar_inlier_mask).

    `threshold` is in pixels, as the reference configures it
    (ESSENTIAL_THRESHOLD=0.1, mono_VO_parameters.yaml:21); internally divided
    by the mean focal length exactly as OpenCV does.
    """
    x1 = _normalized(K, xy1)
    x2 = _normalized(K, xy2)
    idx, sets_valid = sample_minimal_sets(key, mask, num_hypotheses, 8)
    Es = eight_point_essential(x1[idx], x2[idx])  # (H, 3, 3)
    r2 = sampson_error_sq(Es, x1, x2)  # (H, N)
    thresh_norm = threshold / (0.5 * (K[0, 0] + K[1, 1]))
    best, inliers = score_hypotheses(
        r2, mask, sets_valid, method, thresh_norm, model_points=8
    )
    E_best = project_to_essential(Es[best])

    # ---- final polish (OpenCV's robust estimators end with an inlier refit).
    # LMEDS: exactly ONE refit, keeping the winner's inlier mask — iterating
    # would re-derive sigma from the refit model and inflate the inlier set.
    # RANSAC: LO-style iterated refit against the FIXED pixel threshold.
    from ergo_uvo_tpu.config import LMEDS

    E_out, inl_out = E_best, inliers
    rounds = 1 if method == LMEDS else 3
    for _ in range(rounds):
        E_refit = refit_essential(x1, x2, inl_out.astype(x1.dtype))
        finite = jnp.all(jnp.isfinite(E_refit))
        if method == LMEDS:
            E_out = jnp.where(finite, E_refit, E_out)
        else:
            r2_ref = sampson_error_sq(E_refit, x1, x2)
            inl_ref = inlier_mask_for_model(r2_ref, mask, method, thresh_norm, 8)
            # Accept unconditionally unless the refit collapsed: the RANSAC
            # winner maximizes threshold-counting and overfits the gate, so
            # the (more accurate) LS refit often counts a few FEWER inliers.
            n_ref = jnp.sum(inl_ref.astype(jnp.int32))
            n_old = jnp.sum(inl_out.astype(jnp.int32))
            ok = finite & (n_ref >= jnp.maximum(8, n_old // 2))
            E_out = jnp.where(ok, E_refit, E_out)
            inl_out = jnp.where(ok, inl_ref, inl_out)
    # ---- nonlinear polish on the manifold (see gn_refine_essential).
    E_out = gn_refine_essential(E_out, x1, x2, inl_out.astype(x1.dtype))
    return E_out, inl_out
