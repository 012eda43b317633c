"""Distributed Schur-complement bundle adjustment over a device mesh.

The multi-chip analogue of :mod:`ergo_uvo_tpu.optim.ba` (BASELINE.json
configs[4]): landmarks (and their observations) are sharded over the mesh's
'data' axis; poses are replicated.

Per LM iteration, communication is exactly:
  * one ``psum`` of the pose-block Hessian H_pp (P x 6 x 6) + gradient b_p,
  * one ``psum`` of the Schur correction S_corr (P x P x 6 x 6) + rhs (P x 6),
  * two scalar ``psum``s for the accept/reject costs.

Everything landmark-indexed (H_ll, H_pl, b_l, the 3x3 inverses, the landmark
updates) stays shard-local — this is the Schur reduction "of landmark blocks
over psum/all-gather collectives" from the north star, with communication
volume independent of the landmark count (it scales with window size P only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ergo_uvo_tpu.optim.ba import (
    BAState,
    _apply_updates,
    _jacobians,
    _normal_equations,
    _schur_solve,
    reprojection_residuals,
)


def make_sharded_ba_step(mesh: Mesh, num_fixed: int = 1, axis_name: str = "data"):
    """Build a jitted one-LM-step function over `mesh`.

    Expects obs_uv (Pp, L, 2), obs_mask (Pp, L), X (L, 3) sharded on L;
    K, R, t, lam replicated.  L must be divisible by the mesh size.
    """

    def local_step(K, obs_uv, obs_mask, R, t, X, lam):
        psum = lambda x: jax.lax.psum(x, axis_name)  # noqa: E731
        r, pc, inv_z = reprojection_residuals(K, R, t, X, obs_uv, obs_mask)
        cost = psum(jnp.sum(r * r))
        J_pose, J_lm = _jacobians(K, R, pc, inv_z, obs_mask)
        H_pp, H_ll, H_pl, b_p, b_l = _normal_equations(J_pose, J_lm, r)
        H_pp = psum(H_pp)
        b_p = psum(b_p)
        dp, dl = _schur_solve(H_pp, H_ll, H_pl, b_p, b_l, lam, num_fixed, psum=psum)
        R2, t2, X2 = _apply_updates(R, t, X, dp, dl)
        r2, _, _ = reprojection_residuals(K, R2, t2, X2, obs_uv, obs_mask)
        cost2 = psum(jnp.sum(r2 * r2))
        improved = cost2 < cost
        R_new = jnp.where(improved, R2, R)
        t_new = jnp.where(improved, t2, t)
        X_new = jnp.where(improved, X2, X)
        lam_new = jnp.where(
            improved, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 4.0, 1e6)
        )
        return R_new, t_new, X_new, lam_new, jnp.minimum(cost, cost2)

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(),  # K replicated
            P(None, axis_name, None),  # obs_uv: shard landmark axis
            P(None, axis_name),  # obs_mask
            P(),  # R
            P(),  # t
            P(axis_name, None),  # X
            P(),  # lambda
        ),
        out_specs=(P(), P(), P(axis_name, None), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_ba_solve(
    mesh: Mesh,
    K: jax.Array,
    obs_uv: jax.Array,
    obs_mask: jax.Array,
    R0: jax.Array,
    t0: jax.Array,
    X0: jax.Array,
    iters: int = 20,
    num_fixed: int = 1,
    init_lambda: float = 1e-3,
    axis_name: str = "data",
):
    """Device-placed iterative solve; returns (BAState, costs list).

    Host loop over jitted steps (iteration count is small; each step is one
    XLA program with the collectives described above).
    """
    step = make_sharded_ba_step(mesh, num_fixed, axis_name)
    from ergo_uvo_tpu.dist.mesh import landmark_sharding, replicated

    rep = replicated(mesh)
    obs_uv = jax.device_put(obs_uv, landmark_sharding(mesh, 3, 1, axis_name))
    obs_mask = jax.device_put(obs_mask, landmark_sharding(mesh, 2, 1, axis_name))
    X = jax.device_put(X0, landmark_sharding(mesh, 2, 0, axis_name))
    R = jax.device_put(R0, rep)
    t = jax.device_put(t0, rep)
    lam = jax.device_put(jnp.asarray(init_lambda, R0.dtype), rep)
    Kd = jax.device_put(K, rep)

    costs = []
    for _ in range(iters):
        R, t, X, lam, cost = step(Kd, obs_uv, obs_mask, R, t, X, lam)
        costs.append(cost)
    return BAState(R=R, t=t, X=X, lm_lambda=lam), jnp.stack(costs)
