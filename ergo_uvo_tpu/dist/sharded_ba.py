"""Distributed Schur-complement bundle adjustment over a device mesh.

The multi-chip analogue of :mod:`ergo_uvo_tpu.optim.ba` (BASELINE.json
configs[4]): landmarks (and their observations) are sharded over the mesh's
'data' axis; poses are replicated.

Per LM iteration, communication is exactly TWO collectives (r5: fused from
five — per-collective latency dominates over gloo/DCN, measured by
tools/bench_scaling_2proc.py; the Schur corrections depend only on
landmark-local blocks, so nothing forces an earlier sync):
  * one packed ``psum`` of every cross-shard partial sum at once — pose
    Hessian H_pp (P x 6 x 6), gradient b_p (P x 6), Schur correction S_corr
    (P x P x 6 x 6), its rhs (P x 6), and the pre-update cost scalar;
  * one scalar ``psum`` of the post-update cost for accept/reject.

Everything landmark-indexed (H_ll, H_pl, b_l, the 3x3 inverses, the landmark
updates) stays shard-local — this is the Schur reduction "of landmark blocks
over psum/all-gather collectives" from the north star, with communication
volume independent of the landmark count (it scales with window size P only).

Two entry points:
  * :func:`make_sharded_ba_step` — one LM iteration per dispatch (the
    correctness-test granularity);
  * :func:`make_sharded_ba_run` — `iters` LM iterations scanned INSIDE one
    XLA program: one host dispatch per solve, which is how the window driver
    deploys refinement and what the scaling benches time (a host round-trip
    per iteration would measure the dispatch path, not the solver).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ergo_uvo_tpu.optim.ba import (
    BAState,
    _apply_updates,
    _jacobians,
    _normal_equations,
    _schur_corrections,
    _schur_reduce_solve,
    reprojection_residuals,
)

_IN_SPECS = (
    P(),  # K replicated
    P(None, "data", None),  # obs_uv: shard landmark axis
    P(None, "data"),  # obs_mask
    P(),  # R
    P(),  # t
    P("data", None),  # X
    P(),  # lambda
)


def _specs(axis_name):
    if axis_name == "data":
        return _IN_SPECS
    return (
        P(), P(None, axis_name, None), P(None, axis_name),
        P(), P(), P(axis_name, None), P(),
    )


def _make_local_iter(num_fixed: int, axis_name: str):
    """One LM iteration as seen by a single shard (runs under shard_map)."""

    def local_iter(K, obs_uv, obs_mask, R, t, X, lam):
        psum = lambda x: jax.lax.psum(x, axis_name)  # noqa: E731
        r, pc, inv_z = reprojection_residuals(K, R, t, X, obs_uv, obs_mask)
        cost_local = jnp.sum(r * r)
        J_pose, J_lm = _jacobians(K, R, pc, inv_z, obs_mask)
        H_pp, H_ll, H_pl, b_p, b_l = _normal_equations(J_pose, J_lm, r)
        # The Schur corrections depend only on landmark-local blocks, so ALL
        # cross-shard partial sums — H_pp, b_p, S_corr, rhs_corr, and the
        # pre-update cost — ride ONE packed collective (collective 1 of 2).
        Hll_inv, S_corr, rhs_corr = _schur_corrections(H_ll, H_pl, b_l, lam)
        parts = [H_pp, b_p, S_corr, rhs_corr,
                 cost_local.reshape(1)]
        packed = psum(jnp.concatenate([p.reshape(-1) for p in parts]))
        outs = []
        off = 0
        for p in parts:
            outs.append(packed[off:off + p.size].reshape(p.shape))
            off += p.size
        H_pp, b_p, S_corr, rhs_corr, cost_v = outs
        dp, dl = _schur_reduce_solve(
            H_pp, b_p, Hll_inv, S_corr, rhs_corr, H_pl, b_l, lam, num_fixed
        )
        R2, t2, X2 = _apply_updates(R, t, X, dp, dl)
        r2, _, _ = reprojection_residuals(K, R2, t2, X2, obs_uv, obs_mask)
        # Collective 2 of 2: the post-update cost for accept/reject.
        cost = cost_v[0]
        cost2 = psum(jnp.sum(r2 * r2))
        improved = cost2 < cost
        R_new = jnp.where(improved, R2, R)
        t_new = jnp.where(improved, t2, t)
        X_new = jnp.where(improved, X2, X)
        lam_new = jnp.where(
            improved, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 4.0, 1e6)
        )
        return R_new, t_new, X_new, lam_new, jnp.minimum(cost, cost2)

    return local_iter


def make_sharded_ba_step(mesh: Mesh, num_fixed: int = 1, axis_name: str = "data"):
    """Build a jitted one-LM-step function over `mesh`.

    Expects obs_uv (Pp, L, 2), obs_mask (Pp, L), X (L, 3) sharded on L;
    K, R, t, lam replicated.  L must be divisible by the mesh size.
    """
    sharded = jax.shard_map(
        _make_local_iter(num_fixed, axis_name),
        mesh=mesh,
        in_specs=_specs(axis_name),
        out_specs=(P(), P(), P(axis_name, None), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_ba_run(mesh: Mesh, iters: int, num_fixed: int = 1,
                        axis_name: str = "data"):
    """`iters` LM iterations scanned inside ONE jitted program.

    Returns a function (K, obs_uv, obs_mask, R, t, X, lam) ->
    (R, t, X, lam, costs (iters,)) with the same sharding contract as
    :func:`make_sharded_ba_step`.  One dispatch per solve — the deployment
    granularity (collectives still run per iteration, inside the scan).
    """
    local_iter = _make_local_iter(num_fixed, axis_name)

    def local_run(K, obs_uv, obs_mask, R, t, X, lam):
        def body(carry, _):
            R, t, X, lam = carry
            R, t, X, lam, cost = local_iter(K, obs_uv, obs_mask, R, t, X, lam)
            return (R, t, X, lam), cost

        (R, t, X, lam), costs = jax.lax.scan(
            body, (R, t, X, lam), None, length=iters
        )
        return R, t, X, lam, costs

    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=_specs(axis_name),
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
    """Device-placed solve; returns (BAState, costs (iters,)).

    One XLA program for the whole solve (make_sharded_ba_run) — no host
    round-trips between iterations.
    """
    run = make_sharded_ba_run(mesh, iters, num_fixed, axis_name)
    from ergo_uvo_tpu.dist.mesh import landmark_sharding, replicated

    rep = replicated(mesh)
    obs_uv = jax.device_put(obs_uv, landmark_sharding(mesh, 3, 1, axis_name))
    obs_mask = jax.device_put(obs_mask, landmark_sharding(mesh, 2, 1, axis_name))
    X = jax.device_put(X0, landmark_sharding(mesh, 2, 0, axis_name))
    R = jax.device_put(R0, rep)
    t = jax.device_put(t0, rep)
    lam = jax.device_put(jnp.asarray(init_lambda, R0.dtype), rep)
    Kd = jax.device_put(K, rep)

    R, t, X, lam, costs = run(Kd, obs_uv, obs_mask, R, t, X, lam)
    return BAState(R=R, t=t, X=X, lm_lambda=lam), costs
