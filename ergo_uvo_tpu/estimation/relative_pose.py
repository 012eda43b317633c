"""Relative-pose orchestration: method select, try, switch-once, accept/reject.

Masked-state-machine re-design of ``estimate_relative_pose``
(VO_utility.cpp:134-180) and ``select_estimation_method``
(VO_utility.cpp:725-748).  The reference's retry loop ("try the selected
method; on VPF/inlier failure switch method once; else give up") becomes a
compiled both-paths computation: essential and homography branches both run
(they are batched and cheap relative to a trace break), then the reference's
exact decision tree picks the observable outputs (SURVEY.md §7.1
"Branching via masked-both-paths").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.config import MonoVOConfig
from ergo_uvo_tpu.estimation.essential import (
    _normalized,
    find_essential,
    recover_pose_from_essential,
)
from ergo_uvo_tpu.estimation.homography import find_homography, recover_pose_homography
from ergo_uvo_tpu.geometry.stats import masked_median


class RelativePoseResult(NamedTuple):
    R: jax.Array  # (3,3) curr <- prev
    t: jax.Array  # (3,) unit scale
    triangulation_inliers: jax.Array  # (N,) epipolar/RANSAC inlier mask
    success: jax.Array  # bool — VPF and inlier-count gates passed
    used_essential: jax.Array  # bool — which method produced the output
    num_inliers: jax.Array  # int32 — the VPF numerator actually used


def select_estimation_method(
    xy1: jax.Array, xy2: jax.Array, mask: jax.Array, distance: float
) -> jax.Array:
    """True -> essential, False -> homography (low parallax).

    Median pixel displacement of the matched features vs the DISTANCE config
    (VO_utility.cpp:725-748; default 10 px, mono_VO_parameters.yaml:13).
    """
    disp = jnp.linalg.norm(xy1 - xy2, axis=-1)
    med = masked_median(disp, mask)
    return med >= distance


def estimate_relative_pose(
    key: jax.Array,
    xy1: jax.Array,
    xy2: jax.Array,
    mask: jax.Array,
    K: jax.Array,
    cfg: MonoVOConfig,
    R_prev: jax.Array,
    t_prev: jax.Array,
) -> RelativePoseResult:
    """The reference's full estimate+switch logic on masked fixed-shape arrays.

    Args:
      xy1/xy2: (N, 2) matched previous/current pixel coords (zeros invalid).
      mask: (N,) match validity.
      R_prev/t_prev: carried pose, passed through on total failure and into
        the homography vote's no-candidate edge case.
    """
    k_e, k_h = jax.random.split(key)
    n_matches = jnp.sum(mask.astype(jnp.int32))

    # ---- essential branch (VO_utility.cpp:145-149).
    E, epi_inliers = find_essential(
        k_e, xy1, xy2, mask, K,
        cfg.essential.outlier_method, cfg.essential.threshold,
        cfg.num_hypotheses,
    )
    x1n = _normalized(K, xy1)
    x2n = _normalized(K, xy2)
    R_e, t_e, mask_e = recover_pose_from_essential(E, x1n, x2n, epi_inliers)
    # VPF counts the recoverPose-updated mask (the reference counts `mask`
    # after recoverPose mutates it, VO_utility.cpp:157).
    inl_e = jnp.sum(mask_e.astype(jnp.int32))

    # ---- homography branch (VO_utility.cpp:151-154).
    Hm, h_inliers = find_homography(
        k_h, xy1, xy2, mask,
        cfg.homography.outlier_method, cfg.homography.threshold,
        cfg.num_hypotheses,
    )
    R_h, t_h, _ = recover_pose_homography(
        Hm, xy1, xy2, h_inliers, K, cfg.homography_distance, R_prev, t_prev
    )
    inl_h = jnp.sum(h_inliers.astype(jnp.int32))

    # ---- accept/reject + switch-once decision tree (VO_utility.cpp:157-178).
    denom = jnp.maximum(n_matches, 1)
    ok_e = (inl_e / denom >= cfg.valid_point_fraction) & (
        inl_e >= cfg.min_num_inliers
    )
    ok_h = (inl_h / denom >= cfg.valid_point_fraction) & (
        inl_h >= cfg.min_num_inliers
    )

    prefer_essential = select_estimation_method(xy1, xy2, mask, cfg.distance)
    # Outcome method: the preferred one if it passed, else the switched one —
    # whether or not it passed: on total failure the reference's output Mats
    # hold the LAST attempted method's estimate (the while loop overwrites
    # R/t each attempt before breaking, VO_utility.cpp:140-179).
    first_ok = jnp.where(prefer_essential, ok_e, ok_h)
    second_ok = jnp.where(prefer_essential, ok_h, ok_e)
    use_essential = jnp.where(first_ok, prefer_essential, ~prefer_essential)
    success = first_ok | second_ok

    def pick(e_val, h_val):
        cond = use_essential
        shape_ok = cond
        while shape_ok.ndim < e_val.ndim:
            shape_ok = shape_ok[..., None]
        return jnp.where(shape_ok, e_val, h_val)

    R = pick(R_e, R_h)
    t = pick(t_e, t_h)
    # Triangulation consumes the pre-recoverPose inlier set for essential
    # (extract_inliers runs on findEssentialMat's mask, VO_utility.cpp:148)
    # and the RANSAC mask for homography (:153).
    tri_inliers = pick(epi_inliers, h_inliers)
    num_inliers = pick(inl_e, inl_h)

    return RelativePoseResult(
        R=R,
        t=t,
        triangulation_inliers=tri_inliers,
        success=success,
        used_essential=use_essential,
        num_inliers=num_inliers,
    )
