"""Window/sequence-parallel BA: keyframes AND landmarks sharded on a 2-D mesh.

SURVEY.md §2.3 row 5 ("sequence/window parallelism ... ring-style ppermute
for overlapping window halo exchange"): the optimization window's POSE axis is
distributed across devices — the VO analogue of context parallelism, where a
long trajectory window no longer fits (or shouldn't sit) on one chip — on a
2-D mesh ('kf', 'lm'):

  * observations (P, L, 2) sharded on BOTH axes: each device holds its
    (P_local, L_local) block;
  * H_ll / b_l: `psum` over the 'kf' axis (every keyframe shard observes the
    same landmark shard);
  * the Schur cross-pose coupling S[p, q] = sum_l W[p,l] H_pl[q,l]^T needs
    every other keyframe shard's H_pl for MY landmark shard — exchanged with
    a ring of `ppermute` steps (the halo exchange), each step computing one
    (P_local, P_local) block row while the next neighbor block is in flight;
  * the reduced (6P x 6P) camera system is `all_gather`ed and solved
    replicated (it is tiny — communication volume is independent of L);
  * landmark back-substitution stays fully local.

Per iteration the wire traffic is: 2 psums of landmark blocks over 'kf',
(n_kf - 1) ppermutes of (P_local, L_local, 6, 3) blocks, one psum of
(P, P, 6, 6) over 'lm', and two scalar cost psums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ergo_uvo_tpu.optim.ba import (
    _jacobians,
    _normal_equations,
    _solve33_mat,
    reprojection_residuals,
)
from ergo_uvo_tpu.geometry.rotations import so3_exp


def make_window_sharded_ba_step(
    mesh: Mesh,
    num_fixed: int = 2,
    kf_axis: str = "kf",
    lm_axis: str = "lm",
):
    """Build the jitted one-LM-step over a ('kf', 'lm') mesh.

    Expects obs_uv (P, L, 2) / obs_mask (P, L) sharded (kf, lm); R (P,3,3),
    t (P,3) sharded on kf; X (L,3) sharded on lm; K, lam replicated.
    P % n_kf == 0 and L % n_lm == 0.
    """
    n_kf = mesh.shape[kf_axis]

    def local_step(K, obs_uv, obs_mask, R_loc, t_loc, X_loc, lam):
        psum_lm = lambda x: jax.lax.psum(x, lm_axis)  # noqa: E731
        psum_kf = lambda x: jax.lax.psum(x, kf_axis)  # noqa: E731
        P_loc = R_loc.shape[0]
        my = jax.lax.axis_index(kf_axis)

        r, pc, inv_z = reprojection_residuals(
            K, R_loc, t_loc, X_loc, obs_uv, obs_mask
        )
        cost = psum_kf(psum_lm(jnp.sum(r * r)))
        J_pose, J_lm = _jacobians(K, R_loc, pc, inv_z, obs_mask)
        H_pp_loc, H_ll_loc, H_pl, b_p_loc, b_l_loc = _normal_equations(
            J_pose, J_lm, r
        )
        # Landmark blocks: reduce over the keyframe shards.
        H_ll = psum_kf(H_ll_loc)  # (L_loc, 3, 3)
        b_l = psum_kf(b_l_loc)
        eyel = jnp.eye(3, dtype=H_ll.dtype)
        Hll_inv = _solve33_mat_batch(H_ll + lam * eyel[None])
        W = jnp.einsum("plij,ljk->plik", H_pl, Hll_inv)  # (P_loc, L_loc, 6, 3)

        # ---- ring halo exchange over the keyframe axis: at step s the
        # visiting H_pl block belongs to device (my - s) mod n_kf; compute my
        # W rows against it, then pass it along the ring.
        def ring_step(s, carry):
            S_rows, visiting = carry  # (P_loc, n_kf, P_loc, 6, 6), (P_loc, L, 6, 3)
            owner = (my - s) % n_kf
            block = jnp.einsum("plik,qlmk->pqim", W, visiting)  # (P_loc, P_loc, 6, 6)
            S_rows = jax.lax.dynamic_update_slice(
                S_rows,
                block[:, None],
                (0, owner, 0, 0, 0),
            )
            # Pass the visiting block to the next device on the ring.
            perm = [(i, (i + 1) % n_kf) for i in range(n_kf)]
            visiting = jax.lax.ppermute(visiting, kf_axis, perm)
            return S_rows, visiting

        S_rows = jnp.zeros(
            (P_loc, n_kf, P_loc, 6, 6), dtype=H_pl.dtype
        )
        S_rows, _ = jax.lax.fori_loop(
            0, n_kf, ring_step, (S_rows, H_pl)
        )
        S_rows = psum_lm(S_rows)  # reduce over landmark shards
        rhs_corr = psum_lm(jnp.einsum("plik,lk->pi", W, b_l))  # (P_loc, 6)

        # ---- assemble the replicated reduced system.
        H_pp = psum_lm(H_pp_loc)  # (P_loc, 6, 6) — each kf shard its own rows
        b_p = b_p_loc  # pose gradient is local to the kf shard
        b_p = psum_lm(b_p)
        eyep = jnp.eye(6, dtype=H_pp.dtype)
        # Row block of S for my poses: -(Schur corr) + diagonal H_pp.
        S_my = -S_rows.reshape(P_loc, n_kf * P_loc, 6, 6)
        diag_cols = my * P_loc + jnp.arange(P_loc)
        S_my = S_my.at[jnp.arange(P_loc), diag_cols].add(
            H_pp + lam * eyep[None]
        )
        rhs_my = -(b_p - rhs_corr)

        # Gather all row blocks -> full (P, P, 6, 6) system, solve replicated.
        S_full = jax.lax.all_gather(S_my, kf_axis).reshape(
            n_kf * P_loc, n_kf * P_loc, 6, 6
        )
        rhs_full = jax.lax.all_gather(rhs_my, kf_axis).reshape(n_kf * P_loc, 6)
        Pn = n_kf * P_loc
        pose_free = (jnp.arange(Pn) >= num_fixed).astype(S_full.dtype)
        S_full = (
            S_full * pose_free[:, None, None, None] * pose_free[None, :, None, None]
        )
        S_full = S_full.at[jnp.arange(Pn), jnp.arange(Pn)].add(
            (1.0 - pose_free)[:, None, None] * eyep[None]
        )
        rhs_full = rhs_full * pose_free[:, None]
        dp_all = jnp.linalg.solve(
            S_full.transpose(0, 2, 1, 3).reshape(Pn * 6, Pn * 6),
            rhs_full.reshape(Pn * 6),
        ).reshape(Pn, 6)

        # ---- back-substitute landmarks (local to the lm shard).
        dp_loc = jax.lax.dynamic_slice(dp_all, (my * P_loc, 0), (P_loc, 6))
        t1 = psum_kf(jnp.einsum("plij,pi->lj", H_pl, dp_loc))
        dl = jnp.einsum("lij,lj->li", Hll_inv, -b_l - t1)

        # ---- apply + accept/reject.
        dR = so3_exp(dp_loc[:, 3:])
        R2 = dR @ R_loc
        t2 = jnp.einsum("pij,pj->pi", dR, t_loc) + dp_loc[:, :3]
        X2 = X_loc + dl
        r2, _, _ = reprojection_residuals(K, R2, t2, X2, obs_uv, obs_mask)
        cost2 = psum_kf(psum_lm(jnp.sum(r2 * r2)))
        improved = cost2 < cost
        R_new = jnp.where(improved, R2, R_loc)
        t_new = jnp.where(improved, t2, t_loc)
        X_new = jnp.where(improved, X2, X_loc)
        lam_new = jnp.where(
            improved, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 4.0, 1e6)
        )
        return R_new, t_new, X_new, lam_new, jnp.minimum(cost, cost2)

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(),  # K
            P(kf_axis, lm_axis, None),  # obs_uv
            P(kf_axis, lm_axis),  # obs_mask
            P(kf_axis, None, None),  # R
            P(kf_axis, None),  # t
            P(lm_axis, None),  # X
            P(),  # lam
        ),
        out_specs=(
            P(kf_axis, None, None),
            P(kf_axis, None),
            P(lm_axis, None),
            P(),
            P(),
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


def _solve33_mat_batch(A: jax.Array) -> jax.Array:
    return jax.vmap(_solve33_mat)(A)


def window_sharded_ba_solve(
    mesh: Mesh,
    K, obs_uv, obs_mask, R0, t0, X0,
    iters: int = 15,
    num_fixed: int = 2,
    init_lambda: float = 1e-3,
    kf_axis: str = "kf",
    lm_axis: str = "lm",
):
    """Host-looped solve over the 2-D mesh; returns ((R, t, X, lam), costs)."""
    from jax.sharding import NamedSharding

    step = make_window_sharded_ba_step(mesh, num_fixed, kf_axis, lm_axis)
    sh = lambda *spec: NamedSharding(mesh, P(*spec))  # noqa: E731
    obs_uv = jax.device_put(jnp.asarray(obs_uv), sh(kf_axis, lm_axis, None))
    obs_mask = jax.device_put(jnp.asarray(obs_mask), sh(kf_axis, lm_axis))
    R = jax.device_put(jnp.asarray(R0), sh(kf_axis, None, None))
    t = jax.device_put(jnp.asarray(t0), sh(kf_axis, None))
    X = jax.device_put(jnp.asarray(X0), sh(lm_axis, None))
    lam = jax.device_put(jnp.asarray(init_lambda, jnp.float32), sh())
    Kd = jax.device_put(jnp.asarray(K), sh())
    costs = []
    for _ in range(iters):
        R, t, X, lam, cost = step(Kd, obs_uv, obs_mask, R, t, X, lam)
        costs.append(cost)
    return (R, t, X, lam), jnp.stack(costs)
