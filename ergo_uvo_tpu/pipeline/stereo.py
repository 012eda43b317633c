"""Stereo UVO pipeline — the reference's ``stereo_VO`` as a masked scan.

Re-designs visual_odometry.h:406-741 as a pure step over
:class:`StereoVOState`:

  detect L/R -> stereo match (curr L<->R) -> "triangular matching"
  (prev stereo-matched left -> curr full left set, :592) -> triangulate the
  previous pair (prev-left frame, :631) -> 3D-point gates -> PnP RANSAC
  (:647-648) -> velocity = t_prevCam_currCam / dt (:148-159).

Failure cascade preserved exactly (every branch publishes validity 0 and
keeps the last t_prevCam_currCam — "assume constant motion", :667-711), and
the state shift prev <- curr-stereo-matched always happens, so a bad frame
empties the carried set until a good stereo pair re-seeds it (:723-733).
Gate comparisons mirror the reference's strict/non-strict choices:
detections >= MIN_NUM_FEATURES, stereo and triangular matches > MIN,
3D points > MIN_NUM_3DPOINTS, PnP inliers >= MIN_NUM_INLIERS.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.config import StereoVOConfig
from ergo_uvo_tpu.estimation.pnp import solve_pnp_ransac
from ergo_uvo_tpu.features.frontend import detect_and_describe
from ergo_uvo_tpu.features.matcher import match_descriptors
from ergo_uvo_tpu.geometry.camera import projection_matrix
from ergo_uvo_tpu.geometry.triangulation import (
    filter_3d_points,
    triangulate_points,
)


class StereoRig(NamedTuple):
    """Static rig geometry (stereo_VO_intrinsics.yaml via config.StereoIntrinsics)."""

    K_left: jax.Array  # (3,3) pipeline (alpha=0) left camera
    K_right: jax.Array  # (3,3) right camera
    R_right: jax.Array  # (3,3) right-from-left rotation
    t_right: jax.Array  # (3,) right-from-left translation (baseline)


class StereoVOState(NamedTuple):
    """Carried stereo-matched previous pair (visual_odometry.h:723-733)."""

    prev_xy_l: jax.Array  # (K, 2) left pixels of stereo-matched pairs
    prev_xy_r: jax.Array  # (K, 2) aligned right pixels
    prev_desc_l: jax.Array  # (K, D) left descriptors (triangular-match queries)
    prev_mask: jax.Array  # (K,)
    prev_time: jax.Array
    t_prev_curr: jax.Array  # (3,) last t_prevCam_currCam (constant-motion hold)
    R_curr_prev: jax.Array  # (3,3) last PnP rotation (diagnostic)
    initialized: jax.Array


class StereoFrameOutput(NamedTuple):
    velocity: jax.Array  # (3,) = t_prevCam_currCam / dt
    validity: jax.Array
    published: jax.Array
    R: jax.Array  # (3,3) R_currCam_prevCam
    t: jax.Array  # (3,) t_prevCam_currCam
    num_features_l: jax.Array
    num_features_r: jax.Array
    num_stereo_matches: jax.Array
    num_triangular_matches: jax.Array
    num_3d_points: jax.Array
    num_pnp_inliers: jax.Array


def stereo_vo_init(
    max_keypoints: int = 512, descriptor_dim: int = 64, dtype=jnp.float32
) -> StereoVOState:
    return StereoVOState(
        prev_xy_l=jnp.zeros((max_keypoints, 2), dtype),
        prev_xy_r=jnp.zeros((max_keypoints, 2), dtype),
        prev_desc_l=jnp.zeros((max_keypoints, descriptor_dim), dtype),
        prev_mask=jnp.zeros(max_keypoints, bool),
        prev_time=jnp.zeros((), dtype),
        t_prev_curr=jnp.zeros(3, dtype),
        R_curr_prev=jnp.eye(3, dtype=dtype),
        initialized=jnp.zeros((), bool),
    )


def stereo_vo_init_from(cfg, dtype=jnp.float32) -> StereoVOState:
    """State sized from the config (see pipeline.mono.mono_vo_init_from)."""
    return stereo_vo_init(cfg.max_keypoints, cfg.descriptor_dim, dtype)


@partial(jax.jit, static_argnames=("cfg",))
def stereo_vo_step(
    state: StereoVOState,
    img_l: jax.Array,
    img_r: jax.Array,
    timestamp: jax.Array,
    rig: StereoRig,
    key: jax.Array,
    cfg: StereoVOConfig,
):
    """One stereo pair.  Returns (next_state, StereoFrameOutput)."""
    kpts_l, desc_l = detect_and_describe(
        img_l, cfg.surf, cfg.max_keypoints, cfg.feature_detector,
        cfg.orb_threshold, cfg.sift_contrast_threshold, cfg.sift_edge_threshold,
        akaze=cfg.akaze,
    )
    kpts_r, desc_r = detect_and_describe(
        img_r, cfg.surf, cfg.max_keypoints, cfg.feature_detector,
        cfg.orb_threshold, cfg.sift_contrast_threshold, cfg.sift_edge_threshold,
        akaze=cfg.akaze,
    )
    n_l, n_r = kpts_l.count, kpts_r.count
    detections_ok = (n_l >= cfg.min_num_features) & (n_r >= cfg.min_num_features)

    # ---- stereo match curr L (query) <-> R (train) (visual_odometry.h:558).
    binary = cfg.feature_detector.upper() in ("ORB", "AKAZE")
    sm = match_descriptors(desc_l, kpts_l.mask, desc_r, kpts_r.mask,
                           cfg.lowe_ratio_test, binary=binary)
    n_stereo = sm.count
    stereo_ok = detections_ok & (n_stereo > cfg.min_num_features)
    # Current stereo-matched set, aligned on left slots; emptied when the
    # gates fail (the reference's empty-compaction, :569-579).
    curr_set_mask = sm.mask & stereo_ok
    curr_xy_r = jnp.take(kpts_r.xy, sm.idx, axis=0)

    # ---- triangular matching: prev stereo-matched left -> curr FULL left
    # keypoint set (:592 matches against curr_left_descr, not the subset).
    tm = match_descriptors(state.prev_desc_l, state.prev_mask, desc_l,
                           kpts_l.mask, cfg.lowe_ratio_test, binary=binary)
    n_tri = tm.count
    tri_ok = stereo_ok & (n_tri > cfg.min_num_features)
    tri_mask = tm.mask & tri_ok

    # ---- triangulate the PREVIOUS stereo pair in the prev-left frame (:631).
    eye3 = jnp.eye(3, dtype=img_l.dtype)
    zero3 = jnp.zeros(3, img_l.dtype)
    P1 = projection_matrix(rig.K_left, eye3, zero3)
    P2 = projection_matrix(rig.K_right, rig.R_right, rig.t_right)
    X = triangulate_points(P1, P2, state.prev_xy_l, state.prev_xy_r)
    good_mask, _ = filter_3d_points(
        X, tri_mask,
        rig.K_left, eye3, zero3,
        rig.K_right, rig.R_right, rig.t_right,
        state.prev_xy_l, state.prev_xy_r,
        cfg.reprojection_threshold,
        min_points=cfg.min_num_3d_points,
    )
    n_3d = jnp.sum(good_mask.astype(jnp.int32))
    points_ok = tri_ok & (n_3d > cfg.min_num_3d_points)

    # ---- PnP: prev-left-frame 3D points vs current-left pixels (:647-648).
    curr_xy_for_pnp = jnp.take(kpts_l.xy, tm.idx, axis=0)
    pnp = solve_pnp_ransac(
        key, X, curr_xy_for_pnp, good_mask & points_ok, rig.K_left,
        cfg.reprojection_error, cfg.num_hypotheses,
        min_inliers=cfg.min_num_inliers,
    )
    success = points_ok & pnp.success

    R_curr_prev = jnp.where(success, pnp.R, state.R_curr_prev)
    t_prev_curr = jnp.where(
        success, -(pnp.R.T @ pnp.t), state.t_prev_curr
    )

    # ---- output (stereo_output_computation, :148-159).
    delta_t = timestamp - state.prev_time
    safe_dt = jnp.where(jnp.abs(delta_t) < 1e-6, 1.0, delta_t)
    velocity = t_prev_curr / safe_dt
    published = state.initialized

    # ---- init handshake (:474-506) + unconditional steady-state shift.
    becomes_init = (~state.initialized) & stereo_ok
    take_curr = state.initialized | becomes_init
    next_state = StereoVOState(
        prev_xy_l=jnp.where(take_curr, jnp.where(curr_set_mask[:, None], kpts_l.xy, 0.0), state.prev_xy_l),
        prev_xy_r=jnp.where(take_curr, jnp.where(curr_set_mask[:, None], curr_xy_r, 0.0), state.prev_xy_r),
        prev_desc_l=jnp.where(take_curr, jnp.where(curr_set_mask[:, None], desc_l, 0.0), state.prev_desc_l),
        prev_mask=jnp.where(take_curr, curr_set_mask, state.prev_mask),
        prev_time=jnp.where(take_curr, timestamp, state.prev_time),
        t_prev_curr=t_prev_curr,
        R_curr_prev=R_curr_prev,
        initialized=state.initialized | becomes_init,
    )
    out = StereoFrameOutput(
        velocity=jnp.where(published, velocity, 0.0),
        validity=success & published,
        published=published,
        R=R_curr_prev,
        t=t_prev_curr,
        num_features_l=n_l,
        num_features_r=n_r,
        num_stereo_matches=n_stereo,
        num_triangular_matches=n_tri,
        num_3d_points=n_3d,
        num_pnp_inliers=jnp.sum(pnp.inliers.astype(jnp.int32)),
    )
    return next_state, out


def run_stereo_vo_streaming(
    source,
    plan_l,
    plan_r,
    rig: StereoRig,
    cfg: StereoVOConfig,
    key: jax.Array,
    chunk_size: int = 16,
    state: StereoVOState | None = None,
    chunk_callback=None,
    timings: list | None = None,
):
    """Stream synced L/R frame batches through stereo VO chunk by chunk.

    The streaming analogue of the reference's ApproximateTime-synced stereo
    loop (visual_odometry.h:766-774, :526-740): a host loop pulls fixed-size
    paired batches from a :class:`ergo_uvo_tpu.io.sequence.JpegPairSource`
    (next chunk decodes on host threads while the device scans the current
    one), preprocesses both eyes with their own undistortion plans, and scans
    `stereo_vo_step` as one XLA program per chunk.  Returns
    (final_state, outputs stacked over all streamed frames).

    `chunk_callback(frames_done, state, chunk_out, next_key)` and `timings`
    — see :func:`ergo_uvo_tpu.pipeline.mono.run_mono_vo_streaming`.
    """
    import time

    import numpy as np

    from ergo_uvo_tpu.image.preprocess import preprocess_frame

    if state is None:
        state = stereo_vo_init_from(cfg)

    pre_l = jax.jit(jax.vmap(lambda im: preprocess_frame(plan_l, im)))
    pre_r = jax.jit(jax.vmap(lambda im: preprocess_frame(plan_r, im)))

    @jax.jit
    def run_chunk(state, imgs_l, imgs_r, tss, key):
        keys = jax.random.split(key, imgs_l.shape[0])

        def step(carry, inp):
            il, ir, ts, k = inp
            return stereo_vo_step(carry, il, ir, ts, rig, k, cfg)

        return jax.lax.scan(step, state, (imgs_l, imgs_r, tss, keys))

    chunks = []
    frames_done = 0
    for batch in source.batches(chunk_size):
        if batch.imgs_right is None:
            raise ValueError("stereo streaming needs a paired source "
                             "(FrameBatch.imgs_right is None)")
        t0 = time.perf_counter()
        key, sub = jax.random.split(key)
        imgs_l = pre_l(jnp.asarray(batch.imgs))
        imgs_r = pre_r(jnp.asarray(batch.imgs_right))
        state, outs = run_chunk(state, imgs_l, imgs_r,
                                jnp.asarray(batch.timestamps), sub)
        chunks.append(jax.tree.map(np.asarray, outs))
        if timings is not None:
            timings.append((int(imgs_l.shape[0]), time.perf_counter() - t0))
        frames_done += int(imgs_l.shape[0])
        if chunk_callback is not None:
            chunk_callback(frames_done, state, chunks[-1], key)
    if not chunks:
        raise ValueError("source yielded no complete chunks")
    outputs = jax.tree.map(lambda *xs: np.concatenate(xs), *chunks)
    return state, outputs


def run_stereo_vo(
    imgs_l: jax.Array,  # (T, H, W)
    imgs_r: jax.Array,  # (T, H, W)
    timestamps: jax.Array,  # (T,)
    rig: StereoRig,
    cfg: StereoVOConfig,
    key: jax.Array,
    state: StereoVOState | None = None,
):
    """Scan the stereo step over a sequence; one XLA program end-to-end."""
    if state is None:
        state = stereo_vo_init_from(cfg, imgs_l.dtype)
    keys = jax.random.split(key, imgs_l.shape[0])

    def step(carry, inp):
        il, ir, ts, k = inp
        return stereo_vo_step(carry, il, ir, ts, rig, k, cfg)

    return jax.lax.scan(step, state, (imgs_l, imgs_r, timestamps, keys))
