"""Monocular UVO pipeline — the reference's ``mono_VO`` as a masked scan.

Re-designs the steady-state loop of visual_odometry.h:167-398 as a pure
step function over a carried :class:`MonoVOState`, with every skip/fallback
branch (SURVEY.md §3.1 failure handling) expressed as masked selection:

  frame -> detect+describe -> match(prev, curr) -> method select ->
  essential/homography + switch-once -> triangulate + gates -> range scale ->
  velocity + validity, state shift prev <- curr.

Failure semantics preserved exactly:
  * < MIN_NUM_FEATURES detections or matches -> frame skipped (nothing
    published), state still shifts (visual_odometry.h:276-307);
  * pose failure -> publish last-attempt pose with validity 0
    ("assume constant motion", :335-344);
  * < MIN_NUM_3DPOINTS after gating or empty cheirality set -> validity 0,
    SF stale (:358-375);
  * SF = range / median(Z) over the *previous-frame* coordinates of points
    that pass cheirality in the current frame — the reference's
    ``convert_3Dpoints_camera`` returns source-frame rows (VO_utility.cpp:55,
    see SURVEY.md §2.1) — preserved for parity.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ergo_uvo_tpu.config import MonoVOConfig
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


class MonoVOState(NamedTuple):
    """Carried frame-to-frame state (visual_odometry.h:209-215, :392-395)."""

    prev_xy: jax.Array  # (K, 2)
    prev_desc: jax.Array  # (K, D)
    prev_mask: jax.Array  # (K,)
    prev_time: jax.Array  # f32 seconds
    R: jax.Array  # (3, 3) last relative rotation (curr <- prev)
    t: jax.Array  # (3,) last unit translation
    SF: jax.Array  # f32 metric scale factor (init 1.0, :204)
    initialized: jax.Array  # bool — init handshake done (:227-245)


class MonoFrameOutput(NamedTuple):
    """Per-frame record: the ROS topics + structured diagnostics (§5)."""

    velocity: jax.Array  # (3,) camera-frame linear velocity
    validity: jax.Array  # bool — successful_estimate
    published: jax.Array  # bool — False for skipped/init frames
    R: jax.Array  # (3, 3)
    t: jax.Array  # (3,)
    scale_factor: jax.Array
    num_features: jax.Array
    num_matches: jax.Array
    num_inliers: jax.Array
    num_3d_points: jax.Array
    used_essential: jax.Array
    median_disparity: jax.Array


def mono_vo_init(
    max_keypoints: int = 512, descriptor_dim: int = 64, dtype=jnp.float32
) -> MonoVOState:
    return MonoVOState(
        prev_xy=jnp.zeros((max_keypoints, 2), dtype),
        prev_desc=jnp.zeros((max_keypoints, descriptor_dim), dtype),
        prev_mask=jnp.zeros(max_keypoints, bool),
        prev_time=jnp.zeros((), dtype),
        R=jnp.eye(3, dtype=dtype),
        t=jnp.zeros(3, dtype),
        SF=jnp.ones((), dtype),
        initialized=jnp.zeros((), bool),
    )


def mono_vo_init_from(cfg, dtype=jnp.float32) -> MonoVOState:
    """State sized from the config — the one way to build a MonoVOState.

    ``descriptor_dim`` is a derived property of the detector choice
    (config.py); threading it by hand desyncs call sites when the detector
    changes (VERDICT r4 weak #7).
    """
    return mono_vo_init(cfg.max_keypoints, cfg.descriptor_dim, dtype)


@partial(jax.jit, static_argnames=("cfg",))
def mono_vo_step(
    state: MonoVOState,
    img: jax.Array,  # (H, W) preprocessed gray frame
    timestamp: jax.Array,  # f32 seconds
    range_measure: jax.Array,  # f32 distance-to-scene (sensor_msgs/Range)
    K: jax.Array,  # (3, 3) pipeline camera (the alpha=0 new K)
    key: jax.Array,
    cfg: MonoVOConfig,
):
    """One frame of mono VO.  Returns (next_state, MonoFrameOutput)."""
    kpts, desc = detect_and_describe(
        img, cfg.surf, cfg.max_keypoints, cfg.feature_detector,
        cfg.orb_threshold, cfg.sift_contrast_threshold, cfg.sift_edge_threshold,
        akaze=cfg.akaze,
    )
    return mono_vo_step_with_features(
        state, kpts, desc, timestamp, range_measure, K, key, cfg
    )


@partial(jax.jit, static_argnames=("cfg",))
def mono_vo_step_with_features(
    state: MonoVOState,
    kpts,  # features.detector.Keypoints for the current frame
    desc: jax.Array,  # (K, D) descriptors aligned with `kpts`
    timestamp: jax.Array,
    range_measure: jax.Array,
    K: jax.Array,
    key: jax.Array,
    cfg: MonoVOConfig,
):
    """The mono step AFTER detection: match -> pose -> triangulate -> scale.

    Detection is state-independent, so callers may compute features for many
    frames in one batched `vmap` and scan only this function over the
    sequence (run_mono_vo_batched_features) — better compiler parallelism
    than re-deriving features inside every scan iteration, an external
    feature source's entry point, and the deployment shape the ORB branch
    REQUIRES on the axon TPU (r5: any ORB image-stage executable scanned
    over stacked frame inputs faults the worker; detection vmapped outside
    the scan sidesteps the faulting codegen pattern entirely).
    """
    n_features = kpts.count
    enough_features = n_features >= cfg.min_num_features

    # ---- init handshake (visual_odometry.h:227-245): before initialization,
    # a frame only becomes `prev` if it has enough features.
    becomes_init = (~state.initialized) & enough_features
    run_steady = state.initialized

    # ---- matching (prev -> curr; VO_utility.cpp:551-573).  Binary
    # descriptors (ORB) use Hamming-distance ratio semantics (:524-529).
    binary = cfg.feature_detector.upper() in ("ORB", "AKAZE")
    matches = match_descriptors(
        state.prev_desc, state.prev_mask, desc, kpts.mask, cfg.lowe_ratio_test,
        binary=binary,
    )
    # Stage boundary (see image/preprocess.py): keep the matcher's outputs
    # materialized instead of re-fused into every downstream consumer.
    matches = jax.lax.optimization_barrier(matches)
    prev_xy = jnp.where(matches.mask[:, None], state.prev_xy, 0.0)
    curr_xy = jnp.where(
        matches.mask[:, None], jnp.take(kpts.xy, matches.idx, axis=0), 0.0
    )
    n_matches = matches.count
    enough_matches = n_matches >= cfg.min_num_features
    process = run_steady & enough_features & enough_matches

    disp = jnp.linalg.norm(prev_xy - curr_xy, axis=-1)
    median_disp = masked_median(disp, matches.mask)

    # ---- relative pose with method selection + switch-once.
    pose = estimate_relative_pose(
        key, prev_xy, curr_xy, matches.mask, K, cfg, state.R, state.t
    )
    pose_success = pose.success & process

    # ---- triangulation + gating (visual_odometry.h:349-375).
    eye3 = jnp.eye(3, dtype=K.dtype)
    zero3 = jnp.zeros(3, K.dtype)
    P1 = projection_matrix(K, eye3, zero3)
    P2 = projection_matrix(K, pose.R, pose.t)
    tri_mask = pose.triangulation_inliers & matches.mask
    X = triangulate_points(P1, P2, prev_xy, curr_xy)
    good_mask, _ = filter_3d_points(
        X, tri_mask,
        K, eye3, zero3, K, pose.R, pose.t,
        prev_xy, curr_xy,
        cfg.reprojection_threshold,
        min_points=cfg.min_num_3d_points,
    )
    n_3d = jnp.sum(good_mask.astype(jnp.int32))
    enough_3d = n_3d >= cfg.min_num_3d_points

    # Cheirality in the current frame; Z stays in the previous frame
    # (convert_3Dpoints_camera's source-frame return, VO_utility.cpp:46-63).
    che_mask = good_mask & cheirality_mask(pose.R, pose.t, X)
    n_che = jnp.sum(che_mask.astype(jnp.int32))
    z_prev = X[:, 2]
    sf_new = range_measure / jnp.maximum(masked_median(z_prev, che_mask), 1e-9)

    update_sf = pose_success & enough_3d & (n_che > 0)
    validity = update_sf
    SF = jnp.where(update_sf, sf_new, state.SF)

    # On a processed frame the carried (R, t) always take the estimator's
    # output (even when validity drops — the reference's member Mats hold the
    # last attempt, see estimate_relative_pose docstring).
    R_out = jnp.where(process, pose.R, state.R)
    t_out = jnp.where(process, pose.t, state.t)

    # ---- output (mono_output_computation, visual_odometry.h:126-140).
    delta_t = timestamp - state.prev_time
    safe_dt = jnp.where(jnp.abs(delta_t) < 1e-6, 1.0, delta_t)
    velocity = -SF * (R_out.T @ t_out) / safe_dt
    published = process

    # ---- state shift (prev <- curr whenever initialized or initializing).
    take_curr = run_steady | becomes_init
    next_state = MonoVOState(
        prev_xy=jnp.where(take_curr, kpts.xy, state.prev_xy),
        prev_desc=jnp.where(take_curr, desc, state.prev_desc),
        prev_mask=jnp.where(take_curr, kpts.mask, state.prev_mask),
        prev_time=jnp.where(take_curr, timestamp, state.prev_time),
        R=R_out,
        t=t_out,
        SF=SF,
        initialized=state.initialized | becomes_init,
    )
    out = MonoFrameOutput(
        velocity=jnp.where(published, velocity, 0.0),
        validity=validity & published,
        published=published,
        R=R_out,
        t=t_out,
        scale_factor=SF,
        num_features=n_features,
        num_matches=n_matches,
        num_inliers=pose.num_inliers,
        num_3d_points=n_3d,
        used_essential=pose.used_essential & published,
        median_disparity=median_disp,
    )
    return next_state, out


def run_mono_vo_streaming(
    source,
    plan,
    K: jax.Array,
    cfg: MonoVOConfig,
    key: jax.Array,
    chunk_size: int = 16,
    state: MonoVOState | None = None,
    chunk_callback=None,
    timings: list | None = None,
):
    """Stream a :class:`ergo_uvo_tpu.io.sequence.FrameSource` through mono VO.

    Host loop over fixed-size frame chunks: each chunk is preprocessed
    (vmapped) and scanned as one XLA program while the NEXT chunk decodes on
    host threads (the native prefetch ring) — frames never bulk-materialize.
    Returns (final_state, outputs stacked over all streamed frames).

    `chunk_callback(frames_done, state, chunk_out, next_key)` fires after
    every chunk with the carried VO state, THIS chunk's output pytree (numpy
    — only the new frames, so a checkpointer appends O(chunk) bytes instead
    of re-writing history, ADVICE r3), and the PRNG key the NEXT chunk will
    split — exactly the payload a crash-resumable checkpoint needs
    (utils.checkpoint.save_stream_head / append_stream_segment).

    `timings` (optional list) collects one `(n_frames, seconds)` entry per
    chunk — the first entry includes XLA compile, the rest are steady-state;
    the CLI derives `{compile_s, steady_fps}` from it.
    """
    import time

    import numpy as np

    from ergo_uvo_tpu.image.preprocess import preprocess_frame

    if state is None:
        state = mono_vo_init_from(cfg)

    pre = jax.jit(jax.vmap(lambda im: preprocess_frame(plan, im)))

    @jax.jit
    def run_chunk(state, imgs, tss, rgs, key):
        keys = jax.random.split(key, imgs.shape[0])

        def step(carry, inp):
            img, ts, rng_m, k = inp
            return mono_vo_step(carry, img, ts, rng_m, K, k, cfg)

        return jax.lax.scan(step, state, (imgs, tss, rgs, keys))

    chunks = []
    frames_done = 0
    for batch in source.batches(chunk_size):
        t0 = time.perf_counter()
        key, sub = jax.random.split(key)
        imgs = pre(jnp.asarray(batch.imgs))
        rgs = (
            jnp.asarray(batch.ranges)
            if batch.ranges is not None
            else jnp.ones(imgs.shape[0], imgs.dtype)
        )
        state, outs = run_chunk(state, imgs, jnp.asarray(batch.timestamps),
                                rgs, sub)
        chunks.append(jax.tree.map(np.asarray, outs))
        if timings is not None:
            timings.append((int(imgs.shape[0]), time.perf_counter() - t0))
        frames_done += int(imgs.shape[0])
        if chunk_callback is not None:
            chunk_callback(frames_done, state, chunks[-1], key)
    if not chunks:
        raise ValueError("source yielded no complete chunks")
    outputs = jax.tree.map(lambda *xs: np.concatenate(xs), *chunks)
    return state, outputs


def run_mono_vo(
    imgs: jax.Array,  # (T, H, W) preprocessed gray frames
    timestamps: jax.Array,  # (T,)
    ranges: jax.Array,  # (T,) range-sensor measurements
    K: jax.Array,
    cfg: MonoVOConfig,
    key: jax.Array,
    state: MonoVOState | None = None,
):
    """Scan the mono step over a frame sequence; returns (state, outputs).

    One `lax.scan` = one XLA program for the whole sequence — the TPU-shaped
    analogue of the reference's 20 Hz spin loop, with no host round-trips.
    """
    if state is None:
        state = mono_vo_init_from(cfg, imgs.dtype)
    keys = jax.random.split(key, imgs.shape[0])

    def step(carry, inp):
        img, ts, rng_m, k = inp
        return mono_vo_step(carry, img, ts, rng_m, K, k, cfg)

    return jax.lax.scan(step, state, (imgs, timestamps, ranges, keys))


def run_mono_vo_batched_features(
    imgs: jax.Array,
    timestamps: jax.Array,
    ranges: jax.Array,
    K: jax.Array,
    cfg: MonoVOConfig,
    key: jax.Array,
    state: MonoVOState | None = None,
):
    """run_mono_vo with detection hoisted OUT of the scan.

    Features are state-independent, so one batched ``vmap`` computes them
    for every frame up front and the scan carries only match -> pose ->
    triangulate -> scale (mono_vo_step_with_features).  Bit-identical
    outputs to :func:`run_mono_vo` (tests/test_pipeline.py), with two wins:
    the detector runs as one frame-parallel program instead of T sequential
    scan iterations, and the ORB branch becomes runnable on the axon TPU
    (whose runtime faults on ORB image-stage executables inside an xs-scan —
    r5 bisect; see mono_vo_step_with_features).
    """
    if state is None:
        state = mono_vo_init_from(cfg, imgs.dtype)
    keys = jax.random.split(key, imgs.shape[0])

    kpts, descs = jax.vmap(
        lambda im: detect_and_describe(
            im, cfg.surf, cfg.max_keypoints, cfg.feature_detector,
            cfg.orb_threshold, cfg.sift_contrast_threshold,
            cfg.sift_edge_threshold, akaze=cfg.akaze,
        )
    )(imgs)

    def step(carry, inp):
        kp, ds, ts, rng_m, k = inp
        return mono_vo_step_with_features(carry, kp, ds, ts, rng_m, K, k, cfg)

    return jax.lax.scan(
        step, state, (kpts, descs, timestamps, ranges, keys)
    )
