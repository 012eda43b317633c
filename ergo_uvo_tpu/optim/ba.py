"""Sliding-window bundle adjustment: Levenberg-Marquardt + Schur complement.

New capability beyond the reference (which is pure frame-to-frame,
SURVEY.md §0); designed TPU-first:

  * fixed shapes: P poses x L landmarks with a dense visibility mask — the
    block-sparse structure lives in the mask, not in indices;
  * all Jacobian/Hessian assembly as batched einsums (MXU work);
  * the landmark blocks H_ll are 3x3 and inverted in closed form;
  * the reduced camera system S = H_pp - H_pl H_ll^-1 H_lp is (6P x 6P) dense
    (P is a small window) and solved with one Cholesky;
  * the landmark axis L is the sharding axis for distributed BA
    (``ergo_uvo_tpu.dist.sharded_ba``): every landmark-indexed contraction
    becomes a local partial sum + one ``psum``.

Gauge freedom is fixed by freezing the first `num_fixed_poses` poses (the
standard window anchor).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.geometry.rotations import skew, so3_exp
from ergo_uvo_tpu.geometry.triangulation import _solve33


class BAProblem(NamedTuple):
    """Fixed-shape window BA problem (P poses, L landmarks)."""

    K: jax.Array  # (3, 3) shared pinhole intrinsics
    obs_uv: jax.Array  # (P, L, 2) observed pixels
    obs_mask: jax.Array  # (P, L) visibility
    num_fixed_poses: int = 1  # gauge anchor


class BAState(NamedTuple):
    R: jax.Array  # (P, 3, 3) world -> camera
    t: jax.Array  # (P, 3)
    X: jax.Array  # (L, 3) world landmarks
    lm_lambda: jax.Array  # LM damping (scalar)


def reprojection_residuals(K, R, t, X, obs_uv, obs_mask):
    """(P, L, 2) masked pixel residuals + per-point camera coords."""
    pc = jnp.einsum("pij,lj->pli", R, X) + t[:, None, :]  # (P, L, 3)
    z = pc[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / safe_z
    u = K[0, 0] * pc[..., 0] * inv_z + K[0, 2]
    v = K[1, 1] * pc[..., 1] * inv_z + K[1, 2]
    r = jnp.stack([u, v], -1) - obs_uv
    r = jnp.where(obs_mask[..., None], r, 0.0)
    return r, pc, inv_z


def _jacobians(K, R, pc, inv_z, obs_mask):
    """J_pose (P,L,2,6) w.r.t. (dt, w) left-mult updates; J_lm (P,L,2,3)."""
    fx, fy = K[0, 0], K[1, 1]
    x, y = pc[..., 0], pc[..., 1]
    zeros = jnp.zeros_like(inv_z)
    # d(pixel)/d(pc)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * x * inv_z * inv_z], -1),
            jnp.stack([zeros, fy * inv_z, -fy * y * inv_z * inv_z], -1),
        ],
        -2,
    )  # (P, L, 2, 3)
    # pose: d(pc)/d(dt, w) = [I | -[pc]x]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (*pc.shape[:-1], 3, 3))
    J_pc_pose = jnp.concatenate([eye, -skew(pc)], -1)  # (P, L, 3, 6)
    J_pose = J_proj @ J_pc_pose  # (P, L, 2, 6)
    # landmark: d(pc)/dX = R
    J_lm = J_proj @ jnp.broadcast_to(R[:, None], (*pc.shape[:-1], 3, 3))
    m = obs_mask[..., None, None]
    return jnp.where(m, J_pose, 0.0), jnp.where(m, J_lm, 0.0)


def _normal_equations(J_pose, J_lm, r):
    """Masked block Hessian pieces (all einsum/MXU)."""
    H_pp = jnp.einsum("plci,plcj->pij", J_pose, J_pose)  # (P, 6, 6)
    H_ll = jnp.einsum("plci,plcj->lij", J_lm, J_lm)  # (L, 3, 3)
    H_pl = jnp.einsum("plci,plcj->plij", J_pose, J_lm)  # (P, L, 6, 3)
    b_p = jnp.einsum("plci,plc->pi", J_pose, r)  # (P, 6)
    b_l = jnp.einsum("plci,plc->li", J_lm, r)  # (L, 3)
    return H_pp, H_ll, H_pl, b_p, b_l


def _schur_corrections(H_ll, H_pl, b_l, lm_lambda):
    """Landmark-local half of the Schur reduction.

    Returns (Hll_inv (L,3,3), S_corr (P,P,6,6), rhs_corr (P,6)) — the
    partial sums over this shard's landmarks.  The distributed path reduces
    S_corr/rhs_corr across shards (packed with H_pp/b_p into ONE collective,
    dist/sharded_ba.py) before :func:`_schur_reduce_solve`.
    """
    eyel = jnp.eye(3, dtype=H_ll.dtype)
    H_ll_d = H_ll + lm_lambda * eyel[None]
    # Closed-form 3x3 inverses of the landmark blocks.
    Hll_inv = jax.vmap(lambda A: _solve33_mat(A))(H_ll_d)  # (L, 3, 3)
    # S = H_pp_diag - sum_l H_pl Hll^-1 H_pl^T  (off-diagonal pose coupling
    # comes only through landmarks).
    W = jnp.einsum("plij,ljk->plik", H_pl, Hll_inv)  # (P, L, 6, 3)
    S_corr = jnp.einsum("plik,qlmk->pqim", W, H_pl)  # (P, P, 6, 6)
    rhs_corr = jnp.einsum("plik,lk->pi", W, b_l)  # (P, 6)
    return Hll_inv, S_corr, rhs_corr


def _schur_reduce_solve(
    H_pp, b_p, Hll_inv, S_corr, rhs_corr, H_pl, b_l, lm_lambda, num_fixed
):
    """Reduced-system solve for (dpose (P,6), dlm (L,3)).

    Expects H_pp/b_p/S_corr/rhs_corr already summed over ALL landmarks
    (globally reduced in the distributed path); H_pl, b_l, Hll_inv stay
    shard-local — the landmark back-substitution needs only this shard's
    rows (dp is replicated after the reduced solve).
    """
    P = H_pp.shape[0]
    eyep = jnp.eye(6, dtype=H_pp.dtype)
    H_pp_d = H_pp + lm_lambda * eyep[None]
    S = -S_corr
    S = S.at[jnp.arange(P), jnp.arange(P)].add(H_pp_d)
    rhs = -(b_p - rhs_corr)

    # Gauge: freeze the first `num_fixed` poses by zeroing their rows/cols
    # and pinning the diagonal.
    pose_free = (jnp.arange(P) >= num_fixed).astype(H_pp.dtype)
    S = S * pose_free[:, None, None, None] * pose_free[None, :, None, None]
    S = S.at[jnp.arange(P), jnp.arange(P)].add(
        (1.0 - pose_free)[:, None, None] * eyep[None]
    )
    rhs = rhs * pose_free[:, None]

    S_full = S.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    dp = jnp.linalg.solve(S_full, rhs.reshape(P * 6)).reshape(P, 6)

    # Back-substitute landmarks: dl = Hll^-1 (-b_l - H_pl^T dp).
    t1 = jnp.einsum("plij,pi->lj", H_pl, dp)
    dl = jnp.einsum("lij,lj->li", Hll_inv, -b_l - t1)
    return dp, dl


def _schur_solve(H_pp, H_ll, H_pl, b_p, b_l, lm_lambda, num_fixed, psum=None):
    """Schur-complement solve for (dpose (P,6), dlm (L,3)).

    `psum`: optional collective (λx: psum over the landmark shard axis) —
    kept for API compatibility; the distributed step now packs the
    correction reduction with the pose-block reduction itself
    (dist/sharded_ba.py) and calls the split functions directly.
    """
    Hll_inv, S_corr, rhs_corr = _schur_corrections(H_ll, H_pl, b_l, lm_lambda)
    if psum is not None:
        packed = psum(jnp.concatenate([S_corr.reshape(-1),
                                       rhs_corr.reshape(-1)]))
        S_corr = packed[:S_corr.size].reshape(S_corr.shape)
        rhs_corr = packed[S_corr.size:].reshape(rhs_corr.shape)
    return _schur_reduce_solve(
        H_pp, b_p, Hll_inv, S_corr, rhs_corr, H_pl, b_l, lm_lambda, num_fixed
    )


def _solve33_mat(A: jax.Array) -> jax.Array:
    """Closed-form 3x3 inverse via the adjugate (batch-friendly)."""
    cols = jnp.eye(3, dtype=A.dtype)
    return jnp.stack([_solve33(A, cols[i]) for i in range(3)], -1)


def _apply_updates(R, t, X, dp, dl):
    dR = so3_exp(dp[:, 3:])
    R_new = dR @ R
    t_new = jnp.einsum("pij,pj->pi", dR, t) + dp[:, :3]
    return R_new, t_new, X + dl


@partial(jax.jit, static_argnames=("num_fixed",))
def ba_step(K, obs_uv, obs_mask, state: BAState, num_fixed: int = 1):
    """One LM step with accept/reject damping control.  Returns (state, cost)."""
    r, pc, inv_z = reprojection_residuals(
        K, state.R, state.t, state.X, obs_uv, obs_mask
    )
    cost = jnp.sum(r * r)
    J_pose, J_lm = _jacobians(K, state.R, pc, inv_z, obs_mask)
    H_pp, H_ll, H_pl, b_p, b_l = _normal_equations(J_pose, J_lm, r)
    dp, dl = _schur_solve(
        H_pp, H_ll, H_pl, b_p, b_l, state.lm_lambda, num_fixed
    )
    R_new, t_new, X_new = _apply_updates(state.R, state.t, state.X, dp, dl)
    r_new, _, _ = reprojection_residuals(K, R_new, t_new, X_new, obs_uv, obs_mask)
    cost_new = jnp.sum(r_new * r_new)
    improved = cost_new < cost
    next_state = BAState(
        R=jnp.where(improved, R_new, state.R),
        t=jnp.where(improved, t_new, state.t),
        X=jnp.where(improved, X_new, state.X),
        lm_lambda=jnp.where(
            improved,
            jnp.maximum(state.lm_lambda * 0.3, 1e-8),
            jnp.minimum(state.lm_lambda * 4.0, 1e6),
        ),
    )
    return next_state, jnp.minimum(cost, cost_new)


def ba_solve(
    problem: BAProblem,
    R0: jax.Array,
    t0: jax.Array,
    X0: jax.Array,
    iters: int = 20,
    init_lambda: float = 1e-3,
):
    """Run `iters` LM steps.  Returns (BAState, per-iter costs)."""
    state = BAState(R=R0, t=t0, X=X0, lm_lambda=jnp.asarray(init_lambda, R0.dtype))

    def body(state, _):
        state, cost = ba_step(
            problem.K, problem.obs_uv, problem.obs_mask, state,
            problem.num_fixed_poses,
        )
        return state, cost

    return jax.lax.scan(body, state, None, length=iters)
