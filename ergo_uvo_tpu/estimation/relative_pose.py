"""Relative-pose orchestration: method select, try, switch-once, accept/reject.

Masked-state-machine re-design of ``estimate_relative_pose``
(VO_utility.cpp:134-180) and ``select_estimation_method``
(VO_utility.cpp:725-748).  The reference's retry loop ("try the selected
method; on VPF/inlier failure switch method once; else give up") becomes a
pair of nested ``lax.cond``s over fixed-shape branches: under the pipeline's
``lax.scan`` these are real runtime branches, so the common frame pays for
exactly ONE robust estimator and the switched method's RANSAC runs only on
actual gate failure — while the observable decision tree (attempt order,
accept gates, last-attempt output on total failure) matches the reference
exactly.
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
    x1n = _normalized(K, xy1)
    x2n = _normalized(K, xy2)

    # Each branch returns (R, t, triangulation_inliers, vpf_inlier_count).
    # Keys are fixed per METHOD (k_e essential, k_h homography) regardless of
    # attempt order, so results are independent of which branch runs first.
    def essential_branch(_):
        # VO_utility.cpp:145-149.
        E, epi_inliers = find_essential(
            k_e, xy1, xy2, mask, K,
            cfg.essential.outlier_method, cfg.essential.threshold,
            cfg.num_hypotheses,
        )
        R_e, t_e, mask_e = recover_pose_from_essential(E, x1n, x2n, epi_inliers)
        # VPF counts the recoverPose-updated mask (the reference counts `mask`
        # after recoverPose mutates it, VO_utility.cpp:157); triangulation
        # consumes the pre-recoverPose epipolar set (extract_inliers runs on
        # findEssentialMat's mask, VO_utility.cpp:148).
        return R_e, t_e, epi_inliers, jnp.sum(mask_e.astype(jnp.int32))

    def homography_branch(_):
        # VO_utility.cpp:151-154.
        Hm, h_inliers = find_homography(
            k_h, xy1, xy2, mask,
            cfg.homography.outlier_method, cfg.homography.threshold,
            cfg.num_hypotheses,
        )
        R_h, t_h, _ = recover_pose_homography(
            Hm, xy1, xy2, h_inliers, K, cfg.homography_distance, R_prev, t_prev
        )
        return R_h, t_h, h_inliers, jnp.sum(h_inliers.astype(jnp.int32))

    def gate(num_inl):
        # Accept iff VPF and inlier-count thresholds pass (VO_utility.cpp:157-160).
        return (num_inl / jnp.maximum(n_matches, 1) >= cfg.valid_point_fraction) & (
            num_inl >= cfg.min_num_inliers
        )

    prefer_essential = select_estimation_method(xy1, xy2, mask, cfg.distance)

    # ---- try preferred; on VPF/inlier failure switch method ONCE
    # (VO_utility.cpp:140-179).  Under `lax.scan` these `lax.cond`s are real
    # runtime branches: the common frame runs ONE robust estimator, not two —
    # the switched branch's RANSAC executes only on actual gate failure.
    first = jax.lax.cond(
        prefer_essential, essential_branch, homography_branch, None
    )
    first_ok = gate(first[3])
    # On total failure the reference's output Mats hold the LAST attempted
    # method's estimate (the while loop overwrites R/t each attempt before
    # breaking) — which is exactly `second` in every case: when the first
    # attempt passed, the "second" is defined as the first itself.
    second = jax.lax.cond(
        first_ok,
        lambda _: first,
        lambda _: jax.lax.cond(
            prefer_essential, homography_branch, essential_branch, None
        ),
        None,
    )
    R, t, tri_inliers, num_inliers = second
    success = first_ok | gate(num_inliers)
    use_essential = jnp.where(first_ok, prefer_essential, ~prefer_essential)

    return RelativePoseResult(
        R=R,
        t=t,
        triangulation_inliers=tri_inliers,
        success=success,
        used_essential=use_essential,
        num_inliers=num_inliers,
    )
