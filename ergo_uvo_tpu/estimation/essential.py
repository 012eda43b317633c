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

from ergo_uvo_tpu.estimation.robust import score_hypotheses
from ergo_uvo_tpu.estimation.sampling import sample_minimal_sets
from ergo_uvo_tpu.geometry.linalg import smallest_eigvec
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
    # Only the winner is projected onto the essential manifold (recoverPose's
    # SVD assumes the (s, s, 0) spectrum).
    return project_to_essential(Es[best]), inliers
