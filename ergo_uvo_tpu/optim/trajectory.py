"""End-to-end trajectory refinement: VO outputs -> window BA -> pose graph.

This is the driver layer that connects the frame-to-frame VO pipelines
(:mod:`ergo_uvo_tpu.pipeline`) to the optimization libraries
(:mod:`ergo_uvo_tpu.optim.ba`, :mod:`ergo_uvo_tpu.optim.pose_graph`) — the
capability BASELINE.json configs[2]/[3] add on top of the reference, which is
pure frame-to-frame with no map or keyframes
(/root/reference/README.md:14-22; state shift visual_odometry.h:392-395).

Host-side orchestration (a ring of keyframes, correction chaining) around
jitted device math; all per-keyframe compute (detect/describe, window BA,
loop verification) runs as fixed-shape jitted calls.
"""

from __future__ import annotations

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ergo_uvo_tpu.estimation.relative_pose import estimate_relative_pose
from ergo_uvo_tpu.features.frontend import detect_and_describe
from ergo_uvo_tpu.features.matcher import match_descriptors
from ergo_uvo_tpu.geometry.camera import projection_matrix
from ergo_uvo_tpu.geometry.stats import masked_median
from ergo_uvo_tpu.geometry.triangulation import (
    cheirality_mask,
    filter_3d_points,
    triangulate_points,
)
from ergo_uvo_tpu.optim.keyframes import WindowedBA
from ergo_uvo_tpu.optim.pose_graph import (
    PoseGraph,
    detect_loop_closures,
    global_descriptor,
    optimize_pose_graph,
)


# Single integrator implementation lives in eval.ate (VERDICT r3 weak #8
# dedup); re-exported here for the optimization drivers and their callers.
from ergo_uvo_tpu.eval.ate import integrate_mono_poses  # noqa: F401


def _rel(R_a, t_a, R_b, t_b):
    """Relative world->cam transform a -> b: x_b = R x_a + t."""
    R = R_b @ R_a.T
    return R, t_b - R @ t_a


def _compose(R_rel, t_rel, R_a, t_a):
    """Compose: world->cam pose of b given a and the a->b relative."""
    return R_rel @ R_a, R_rel @ t_a + t_rel


class BATrajectoryResult(NamedTuple):
    positions: np.ndarray  # (T, 3) BA-corrected camera centers, world frame
    kf_indices: np.ndarray  # (Nk,) frame indices of keyframes
    kf_positions: np.ndarray  # (Nk, 3) refined keyframe centers
    costs: np.ndarray  # (num_solves, iters) BA cost curves
    ba_iters_per_s: float  # measured LM iterations/s (excl. compile)
    R_wc: np.ndarray  # (T, 3, 3) BA-corrected world->cam rotations
    t_wc: np.ndarray  # (T, 3) BA-corrected world->cam translations


def refine_mono_trajectory(
    imgs,
    timestamps,
    outs,
    K,
    cfg,
    window_size: int = 6,
    keyframe_stride: int = 3,
    ba_iters: int = 12,
    lowe_ratio: float = 0.8,
) -> BATrajectoryResult:
    """Sliding-window BA over VO keyframes; returns the corrected trajectory.

    `outs` is the :class:`ergo_uvo_tpu.pipeline.mono.MonoFrameOutput` stack
    from `run_mono_vo` — or a ``StereoFrameOutput`` stack: stereo publishes
    the same prev-cam displacement convention and carries native metric
    scale, so the identical integration + window refinement applies (pass
    the LEFT frames and K_left; the StereoVOConfig shares every field read
    here).  Keyframes are every `keyframe_stride`-th published frame; each
    full window is refined once and corrections chain forward (new keyframes
    enter composed onto the refined previous keyframe, so raw VO drift does
    not fight the optimizer).
    """
    velocities = np.asarray(outs.velocity)
    rots = np.asarray(outs.R)
    published = np.asarray(outs.published)
    timestamps = np.asarray(timestamps)
    R_wc, t_wc, _ = integrate_mono_poses(velocities, rots, timestamps, published)

    kf_idx = np.flatnonzero(published)[::keyframe_stride]
    binary = cfg.feature_detector.upper() in ("ORB", "AKAZE")
    det = jax.jit(
        lambda im: detect_and_describe(
            im, cfg.surf, cfg.max_keypoints, cfg.feature_detector,
            orb_threshold=cfg.orb_threshold,
            sift_contrast_threshold=cfg.sift_contrast_threshold,
            sift_edge_threshold=cfg.sift_edge_threshold,
            akaze=cfg.akaze,
        )
    )
    K_dev = jnp.asarray(K, jnp.float32)

    wba = WindowedBA(window_size=window_size, iters=ba_iters)
    refined: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    prev_kf = None
    costs = []
    solve_s = 0.0
    n_solves = 0
    window_members: list[int] = []

    for k in kf_idx:
        kp, dsc = det(jnp.asarray(imgs[k]))
        if prev_kf is None:
            R_init, t_init = R_wc[k], t_wc[k]
        else:
            R_r, t_r = _rel(R_wc[prev_kf], t_wc[prev_kf], R_wc[k], t_wc[k])
            R_init, t_init = _compose(R_r, t_r, *refined[prev_kf])
        wba.push_keyframe(
            kp.xy, dsc, kp.mask,
            jnp.asarray(R_init, jnp.float32), jnp.asarray(t_init, jnp.float32),
        )
        window_members.append(int(k))
        window_members = window_members[-window_size:]
        refined[int(k)] = (np.asarray(R_init), np.asarray(t_init))
        if wba.full:
            t0 = time.perf_counter()
            state, cost_curve, _ = wba.refine(K_dev, lowe_ratio, binary=binary)
            jax.block_until_ready(cost_curve)
            dt_solve = time.perf_counter() - t0
            # First solve pays compile; count only steady-state solves.
            if n_solves > 0:
                solve_s += dt_solve
            n_solves += 1
            costs.append(np.asarray(cost_curve))
            for i, fk in enumerate(window_members):
                refined[fk] = (np.asarray(state.R[i]), np.asarray(state.t[i]))
        prev_kf = int(k)

    # ---- propagate corrections to every frame: compose the raw VO relative
    # motion from the nearest earlier keyframe onto its refined pose.
    n = len(timestamps)
    positions = np.zeros((n, 3))
    R_out = np.zeros((n, 3, 3))
    t_out = np.zeros((n, 3))
    kf_sorted = np.asarray(sorted(refined))
    for f in range(n):
        earlier = kf_sorted[kf_sorted <= f]
        if len(earlier) == 0:
            R_f, t_f = R_wc[f], t_wc[f]
        else:
            j = int(earlier[-1])
            R_r, t_r = _rel(R_wc[j], t_wc[j], R_wc[f], t_wc[f])
            R_f, t_f = _compose(R_r, t_r, *refined[j])
        positions[f] = -R_f.T @ t_f
        R_out[f], t_out[f] = R_f, t_f
    kf_positions = np.stack(
        [-refined[int(k)][0].T @ refined[int(k)][1] for k in kf_idx]
    )
    iters_per_s = (
        (n_solves - 1) * ba_iters / solve_s if n_solves > 1 and solve_s > 0 else 0.0
    )
    return BATrajectoryResult(
        positions=positions,
        kf_indices=np.asarray(kf_idx),
        kf_positions=kf_positions,
        costs=np.stack(costs) if costs else np.zeros((0, ba_iters)),
        ba_iters_per_s=iters_per_s,
        R_wc=R_out,
        t_wc=t_out,
    )


class LoopClosure(NamedTuple):
    i: int
    j: int
    R_rel: np.ndarray  # (3, 3) measured x_j = R x_i + t
    t_rel: np.ndarray  # (3,)
    num_inliers: int


def verify_loop_candidate(
    key,
    xy_i, mask_i, desc_i,
    xy_j, mask_j, desc_j,
    K, cfg,
    range_i,
    lowe_ratio: float = 0.8,
    min_inliers: int = 20,
    binary: bool = False,
):
    """Geometric verification of a retrieval candidate pair (i, j).

    Reuses the mono estimation stack end-to-end: match -> essential/homography
    RANSAC -> triangulate -> metric scale from the range measurement at i
    (``compute_scale_factor`` semantics, VO_utility.cpp:23-38).  Returns
    (ok, R_rel, t_rel_metric, n_inliers) as device arrays.  `binary` must
    match the detector family (ORB/AKAZE) so the Lowe ratio applies to
    Hamming distances, as in the pipelines (pipeline/mono.py).
    """
    m = match_descriptors(desc_i, mask_i, desc_j, mask_j, lowe_ratio,
                          binary=binary)
    xy_i = jnp.where(m.mask[:, None], xy_i, 0.0)
    xy_j = jnp.where(m.mask[:, None], jnp.take(xy_j, m.idx, axis=0), 0.0)
    pose = estimate_relative_pose(
        key, xy_i, xy_j, m.mask, K, cfg, jnp.eye(3), jnp.zeros(3)
    )
    eye3 = jnp.eye(3, dtype=K.dtype)
    zero3 = jnp.zeros(3, K.dtype)
    P1 = projection_matrix(K, eye3, zero3)
    P2 = projection_matrix(K, pose.R, pose.t)
    tri_mask = pose.triangulation_inliers & m.mask
    X = triangulate_points(P1, P2, xy_i, xy_j)
    good, _ = filter_3d_points(
        X, tri_mask, K, eye3, zero3, K, pose.R, pose.t, xy_i, xy_j,
        cfg.reprojection_threshold, min_points=cfg.min_num_3d_points,
    )
    che = good & cheirality_mask(pose.R, pose.t, X)
    sf = range_i / jnp.maximum(masked_median(X[:, 2], che), 1e-9)
    n_inl = pose.num_inliers
    ok = (
        pose.success
        & (n_inl >= min_inliers)
        & (jnp.sum(che.astype(jnp.int32)) > 0)
        & (sf > 0)
    )
    return ok, pose.R, sf * pose.t, n_inl


class PoseGraphResult(NamedTuple):
    positions: np.ndarray  # (T, 3) optimized camera centers
    loops: list  # accepted LoopClosure edges
    costs: np.ndarray  # per-iteration pose-graph cost


def close_loops_and_optimize(
    imgs,
    R_wc,
    t_wc,
    ranges,
    K,
    cfg,
    key=None,
    min_gap: int = 10,
    top_k: int = 8,
    min_similarity: float = 0.85,
    loop_weight: float = 10.0,
    iters: int = 25,
    min_inliers: int = 20,
) -> PoseGraphResult:
    """Full loop-closure pipeline over a trajectory of frames.

    imgs: (T, H, W) preprocessed frames; R_wc/t_wc: (T,3,3)/(T,3) VO poses
    (with drift); ranges: (T,) range measurements for metric loop edges.
    Builds sequential odometry edges from the VO poses, retrieves + verifies
    loop candidates, and optimizes the pose graph (BASELINE configs[3]).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    T = len(imgs)
    R_wc = np.asarray(R_wc)
    t_wc = np.asarray(t_wc)
    K_dev = jnp.asarray(K, jnp.float32)

    binary = cfg.feature_detector.upper() in ("ORB", "AKAZE")
    det = jax.jit(
        lambda im: detect_and_describe(
            im, cfg.surf, cfg.max_keypoints, cfg.feature_detector,
            orb_threshold=cfg.orb_threshold,
            sift_contrast_threshold=cfg.sift_contrast_threshold,
            sift_edge_threshold=cfg.sift_edge_threshold,
            akaze=cfg.akaze,
        )
    )
    kpts_all, desc_all = [], []
    for f in range(T):
        kp, ds = det(jnp.asarray(imgs[f]))
        kpts_all.append(kp)
        desc_all.append(ds)
    desc_stack = jnp.stack(desc_all)
    mask_stack = jnp.stack([k.mask for k in kpts_all])
    gdesc = global_descriptor(desc_stack, mask_stack)
    pairs, scores, valid = detect_loop_closures(
        gdesc, min_gap=min_gap, top_k=top_k, min_similarity=min_similarity
    )
    pairs, valid = np.asarray(pairs), np.asarray(valid)

    verify = jax.jit(
        lambda key, ki_xy, ki_m, di, kj_xy, kj_m, dj, rng_i: verify_loop_candidate(
            key, ki_xy, ki_m, di, kj_xy, kj_m, dj, K_dev, cfg, rng_i,
            min_inliers=min_inliers, binary=binary,
        )
    )

    loops: list[LoopClosure] = []
    seen = set()
    for c in range(len(pairs)):
        if not valid[c]:
            continue
        i, j = int(pairs[c, 0]), int(pairs[c, 1])
        if (i, j) in seen:
            continue
        seen.add((i, j))
        key, sub = jax.random.split(key)
        ok, R_rel, t_rel, n_inl = verify(
            sub,
            kpts_all[i].xy, kpts_all[i].mask, desc_all[i],
            kpts_all[j].xy, kpts_all[j].mask, desc_all[j],
            jnp.asarray(float(ranges[i]), jnp.float32),
        )
        if bool(ok):
            loops.append(
                LoopClosure(i, j, np.asarray(R_rel), np.asarray(t_rel), int(n_inl))
            )

    return _optimize_with_loops(R_wc, t_wc, loops, loop_weight, iters)


def _optimize_with_loops(R_wc, t_wc, loops, loop_weight, iters):
    """Build the pose graph (sequential odometry edges + verified loop edges)
    and optimize it — the shared tail of the mono and stereo loop-closure
    drivers."""
    T = len(R_wc)
    n_seq = T - 1
    E = n_seq + max(len(loops), 1)
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    eR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    et = np.zeros((E, 3), np.float32)
    ew = np.zeros(E, np.float32)
    for k in range(n_seq):
        R_r, t_r = _rel(R_wc[k], t_wc[k], R_wc[k + 1], t_wc[k + 1])
        ei[k], ej[k] = k, k + 1
        eR[k], et[k], ew[k] = R_r, t_r, 1.0
    for li, lp in enumerate(loops):
        e = n_seq + li
        ei[e], ej[e] = lp.i, lp.j
        eR[e], et[e], ew[e] = lp.R_rel, lp.t_rel, loop_weight

    graph = PoseGraph(
        R=jnp.asarray(R_wc, jnp.float32),
        t=jnp.asarray(t_wc, jnp.float32),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        edge_R=jnp.asarray(eR),
        edge_t=jnp.asarray(et),
        edge_weight=jnp.asarray(ew),
    )
    opt, costs = optimize_pose_graph(graph, iters=iters, num_fixed=1)
    R_o, t_o = np.asarray(opt.R), np.asarray(opt.t)
    positions = -np.einsum("tij,ti->tj", R_o.transpose(0, 2, 1), t_o)
    return PoseGraphResult(positions=positions, loops=loops, costs=np.asarray(costs))


def _stereo_frame_landmarks(kpts_l, desc_l, kpts_r, desc_r, rig, cfg, binary):
    """Stereo-match one L/R pair and triangulate: returns (X (K,3) in the
    left frame aligned on left-keypoint slots, valid mask) — the per-keyframe
    landmark set the stereo loop verifier PnPs against (the same construction
    as the stereo pipeline's previous-pair triangulation, stereo.py:133-146).
    """
    from ergo_uvo_tpu.geometry.camera import projection_matrix as _pm
    from ergo_uvo_tpu.geometry.triangulation import (
        filter_3d_points as _f3d,
        triangulate_points as _tp,
    )

    sm = match_descriptors(desc_l, kpts_l.mask, desc_r, kpts_r.mask,
                           cfg.lowe_ratio_test, binary=binary)
    xy_r = jnp.take(kpts_r.xy, sm.idx, axis=0)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    zero3 = jnp.zeros(3, jnp.float32)
    P1 = _pm(rig.K_left, eye3, zero3)
    P2 = _pm(rig.K_right, rig.R_right, rig.t_right)
    X = _tp(P1, P2, kpts_l.xy, xy_r)
    good, _ = _f3d(
        X, sm.mask, rig.K_left, eye3, zero3, rig.K_right, rig.R_right,
        rig.t_right, kpts_l.xy, xy_r, cfg.reprojection_threshold,
        min_points=cfg.min_num_3d_points,
    )
    return X, good


def verify_loop_candidate_pnp(
    key,
    X_i, mask3d_i, desc_i,
    xy_j, mask_j, desc_j,
    K, cfg,
    lowe_ratio: float = 0.8,
    min_inliers: int = 20,
    binary: bool = False,
):
    """Stereo loop verification: PnP the keyframe-i stereo landmarks against
    keyframe-j left pixels.  Stereo landmarks carry NATIVE metric scale, so
    the loop edge needs no range scaling (unlike the mono essential-based
    verifier above).  Returns (ok, R_rel, t_rel, n_inliers) with
    x_j = R_rel x_i + t_rel.
    """
    from ergo_uvo_tpu.estimation.pnp import solve_pnp_ransac as _pnp

    m = match_descriptors(desc_i, mask3d_i, desc_j, mask_j, lowe_ratio,
                          binary=binary)
    xy_obs = jnp.take(xy_j, m.idx, axis=0)
    pnp = _pnp(
        key, X_i, xy_obs, m.mask & mask3d_i, K,
        cfg.reprojection_error, cfg.num_hypotheses,
        min_inliers=min_inliers,
    )
    n_inl = jnp.sum(pnp.inliers.astype(jnp.int32))
    ok = pnp.success & (n_inl >= min_inliers)
    return ok, pnp.R, pnp.t, n_inl


def close_loops_and_optimize_stereo(
    imgs_l,
    imgs_r,
    R_wc,
    t_wc,
    rig,
    cfg,
    key=None,
    min_gap: int = 10,
    top_k: int = 8,
    min_similarity: float = 0.85,
    loop_weight: float = 10.0,
    iters: int = 25,
    min_inliers: int = 20,
) -> PoseGraphResult:
    """Stereo loop-closure pipeline (BASELINE configs[3], stereo mode).

    Same retrieval as the mono driver (masked mean descriptor + cosine
    similarity over left-eye descriptors), but candidates verify through
    PnP against stereo-triangulated landmarks — metric loop edges with no
    range sensor involved (stereo's native scale, visual_odometry.h:647).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    T = len(imgs_l)
    R_wc = np.asarray(R_wc)
    t_wc = np.asarray(t_wc)

    binary = cfg.feature_detector.upper() in ("ORB", "AKAZE")
    det = jax.jit(
        lambda im: detect_and_describe(
            im, cfg.surf, cfg.max_keypoints, cfg.feature_detector,
            orb_threshold=cfg.orb_threshold,
            sift_contrast_threshold=cfg.sift_contrast_threshold,
            sift_edge_threshold=cfg.sift_edge_threshold,
            akaze=cfg.akaze,
        )
    )
    landmarks = jax.jit(
        lambda kl, dl, kr, dr: _stereo_frame_landmarks(
            kl, dl, kr, dr, rig, cfg, binary
        )
    )
    kpts_all, desc_all, X_all, m3d_all = [], [], [], []
    for f in range(T):
        kl, dl = det(jnp.asarray(imgs_l[f]))
        kr, dr = det(jnp.asarray(imgs_r[f]))
        X, good = landmarks(kl, dl, kr, dr)
        kpts_all.append(kl)
        desc_all.append(dl)
        X_all.append(X)
        m3d_all.append(good)
    desc_stack = jnp.stack(desc_all)
    mask_stack = jnp.stack([k.mask for k in kpts_all])
    gdesc = global_descriptor(desc_stack, mask_stack)
    pairs, scores, valid = detect_loop_closures(
        gdesc, min_gap=min_gap, top_k=top_k, min_similarity=min_similarity
    )
    pairs, valid = np.asarray(pairs), np.asarray(valid)

    verify = jax.jit(
        lambda key, Xi, m3i, di, kj_xy, kj_m, dj: verify_loop_candidate_pnp(
            key, Xi, m3i, di, kj_xy, kj_m, dj, rig.K_left, cfg,
            lowe_ratio=cfg.lowe_ratio_test, min_inliers=min_inliers,
            binary=binary,
        )
    )

    loops: list[LoopClosure] = []
    seen = set()
    for c in range(len(pairs)):
        if not valid[c]:
            continue
        i, j = int(pairs[c, 0]), int(pairs[c, 1])
        if (i, j) in seen:
            continue
        seen.add((i, j))
        key, sub = jax.random.split(key)
        ok, R_rel, t_rel, n_inl = verify(
            sub, X_all[i], m3d_all[i], desc_all[i],
            kpts_all[j].xy, kpts_all[j].mask, desc_all[j],
        )
        if bool(ok):
            loops.append(
                LoopClosure(i, j, np.asarray(R_rel), np.asarray(t_rel),
                            int(n_inl))
            )

    return _optimize_with_loops(R_wc, t_wc, loops, loop_weight, iters)
