"""Pose-graph optimization + descriptor-retrieval loop closure.

New capability (BASELINE.json configs[3]); the reference has no map or loop
closure (SURVEY.md §0).  TPU-first design:

  * fixed-shape graph: T pose nodes, E edge slots with a validity mask;
  * residual r_e = log(T_meas(e)^-1 · T_i(e)^-1 · T_j(e)) in se(3), batched
    over all edges with `vmap`;
  * Gauss-Newton normal equations assembled by `segment_sum` scatter-adds into
    a dense (6T x 6T) system (windows/trajectories of hundreds of poses —
    a dense Cholesky on MXU beats sparse bookkeeping at this size);
  * loop-closure candidates from a global-descriptor similarity matrix (one
    matmul — the same machinery as the feature matcher, SURVEY.md §7.2 step 9),
    geometrically verified by the caller with the estimation module.

Jacobians use the right-perturbation approximation J_i ~ -Ad, J_j ~ I at the
identity (standard small-residual pose-graph GN), which is exact at
convergence and robust for VO-scale errors.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.geometry.rotations import skew
from ergo_uvo_tpu.geometry.se3 import SE3, se3_exp, se3_log


class PoseGraph(NamedTuple):
    """T pose nodes (world -> node), E relative-pose edge slots."""

    R: jax.Array  # (T, 3, 3)
    t: jax.Array  # (T, 3)
    edge_i: jax.Array  # (E,) int32 source node
    edge_j: jax.Array  # (E,) int32 target node
    edge_R: jax.Array  # (E, 3, 3) measured R_ij  (x_j = R_ij x_i + t_ij)
    edge_t: jax.Array  # (E, 3)
    edge_weight: jax.Array  # (E,) information weight (0 = slot unused)


def _adjoint(T: SE3) -> jax.Array:
    """SE(3) adjoint: (..., 6, 6) for xi = (rho, w) ordering."""
    R = T.R
    tx = skew(T.t)
    top = jnp.concatenate([R, tx @ R], -1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], -1)
    return jnp.concatenate([top, bot], -2)


def pose_graph_residuals(graph: PoseGraph) -> jax.Array:
    """(E, 6) se(3) residuals of all edges (masked by weight outside)."""
    Ti = SE3(graph.R[graph.edge_i], graph.t[graph.edge_i])
    Tj = SE3(graph.R[graph.edge_j], graph.t[graph.edge_j])
    T_meas = SE3(graph.edge_R, graph.edge_t)
    # predicted relative: T_ij = T_j ∘ T_i^-1  (x_j = R_j R_i^T (x_i - t_i) + t_j)
    T_rel = Tj.compose(Ti.inverse())
    T_err = T_meas.inverse().compose(T_rel)
    return se3_log(T_err)


@partial(jax.jit, static_argnames=("num_fixed",))
def pose_graph_gn_step(graph: PoseGraph, num_fixed: int = 1, damping: float = 1e-6):
    """One Gauss-Newton step; returns (graph', total weighted cost)."""
    T = graph.R.shape[0]
    r = pose_graph_residuals(graph)  # (E, 6)
    w = graph.edge_weight
    cost = jnp.sum(w[:, None] * r * r)

    # Small-residual Jacobians for right-perturbation updates T <- T exp(xi):
    # T_err(xi) = T_err0 · exp(Ad(T_i) xi_j) · exp(-Ad(T_i) xi_i), so with the
    # right-Jacobian ~ I approximation,  dr/dxi_j = Ad(T_i),  dr/dxi_i = -Ad(T_i).
    Ti = SE3(graph.R[graph.edge_i], graph.t[graph.edge_i])
    A = _adjoint(Ti)  # (E, 6, 6)
    Ji = -A
    Jj = A
    eye6 = jnp.eye(6, dtype=r.dtype)

    wj = w[:, None, None]
    H_ii = wj * (jnp.swapaxes(Ji, -1, -2) @ Ji)
    H_jj = wj * (jnp.swapaxes(Jj, -1, -2) @ Jj)
    H_ij = wj * (jnp.swapaxes(Ji, -1, -2) @ Jj)
    b_i = jnp.einsum("eba,eb->ea", Ji, w[:, None] * r)
    b_j = jnp.einsum("eba,eb->ea", Jj, w[:, None] * r)

    # Scatter-add edge blocks into the dense (T, T, 6, 6) Hessian.
    H = jnp.zeros((T, T, 6, 6), r.dtype)
    H = H.at[graph.edge_i, graph.edge_i].add(H_ii)
    H = H.at[graph.edge_j, graph.edge_j].add(H_jj)
    H = H.at[graph.edge_i, graph.edge_j].add(H_ij)
    H = H.at[graph.edge_j, graph.edge_i].add(jnp.swapaxes(H_ij, -1, -2))
    b = jnp.zeros((T, 6), r.dtype)
    b = b.at[graph.edge_i].add(b_i)
    b = b.at[graph.edge_j].add(b_j)

    # Gauge fix + damping.
    free = (jnp.arange(T) >= num_fixed).astype(r.dtype)
    H = H * free[:, None, None, None] * free[None, :, None, None]
    H = H.at[jnp.arange(T), jnp.arange(T)].add(
        ((1.0 - free) + damping)[:, None, None] * eye6[None]
    )
    b = b * free[:, None]

    Hd = H.transpose(0, 2, 1, 3).reshape(T * 6, T * 6)
    dx = -jnp.linalg.solve(Hd, b.reshape(T * 6)).reshape(T, 6)

    # Right-perturbation update: T_k <- T_k ∘ exp(xi_k)... (consistent with
    # the Jacobian convention above via the chain through T_i^-1).
    dT = se3_exp(dx)
    R_new = graph.R @ dT.R
    t_new = (graph.R @ dT.t[..., None])[..., 0] + graph.t
    return graph._replace(R=R_new, t=t_new), cost


def optimize_pose_graph(graph: PoseGraph, iters: int = 20, num_fixed: int = 1):
    """Run GN iterations; returns (graph, per-iter costs)."""

    def body(g, _):
        g, cost = pose_graph_gn_step(g, num_fixed)
        return g, cost

    return jax.lax.scan(body, graph, None, length=iters)


def global_descriptor(desc: jax.Array, mask: jax.Array) -> jax.Array:
    """Frame-level retrieval descriptor: L2-normalized mean of local descs.

    Reuses the matcher's descriptor space (SURVEY.md §7.2 step 9: "loop-closure
    detection (descriptor retrieval reusing the matcher)").
    """
    m = mask[..., None].astype(desc.dtype)
    s = jnp.sum(desc * m, axis=-2) / jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    return s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-12)


def detect_loop_closures(
    global_descs: jax.Array,  # (T, D) global descriptors
    min_gap: int = 10,
    top_k: int = 8,
    min_similarity: float = 0.85,
):
    """Top-K non-adjacent candidate pairs by cosine similarity.

    Returns (pairs (top_k, 2) int32, scores (top_k,), valid (top_k,)); caller
    geometrically verifies each pair (essential/PnP) before adding pose-graph
    edges.
    """
    T = global_descs.shape[0]
    sim = global_descs @ global_descs.T  # (T, T), one matmul
    ii = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    cand = (jj - ii >= min_gap)  # upper triangle, far-apart pairs only
    scores = jnp.where(cand, sim, -jnp.inf)
    flat_scores, flat_idx = jax.lax.top_k(scores.reshape(-1), top_k)
    pi = flat_idx // T
    pj = flat_idx % T
    valid = jnp.isfinite(flat_scores) & (flat_scores >= min_similarity)
    return jnp.stack([pi, pj], -1), flat_scores, valid
