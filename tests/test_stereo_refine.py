"""Stereo trajectory refinement (VERDICT r3 missing #2).

BASELINE configs[2]/[3] are mode-agnostic: stereo runs must get the same
window-BA + loop-closure layers as mono.  Stereo outputs share mono's
prev-cam displacement convention (stereo_output_computation,
visual_odometry.h:148-159), so the windowed refinement applies directly;
loop closure verifies candidates by PnP against stereo-triangulated
landmarks — metric edges with no range sensor involved.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergo_uvo_tpu.config import StereoVOConfig, SurfConfig
from ergo_uvo_tpu.eval import ate_rmse
from ergo_uvo_tpu.io import make_loop_sequence, make_stereo_sequence
from ergo_uvo_tpu.optim import (
    close_loops_and_optimize_stereo,
    integrate_mono_poses,
    refine_mono_trajectory,
)
from ergo_uvo_tpu.pipeline import run_stereo_vo
from ergo_uvo_tpu.pipeline.stereo import StereoRig


def _rig(K, baseline=0.33):
    return StereoRig(
        K_left=jnp.asarray(K), K_right=jnp.asarray(K),
        R_right=jnp.eye(3), t_right=jnp.asarray([-baseline, 0.0, 0.0]),
    )


def test_stereo_window_ba_refines_trajectory():
    """Starved stereo VO -> window BA over the left frames must reduce ATE."""
    # Starved hard (48 kpts, 8 PnP hypotheses): stereo PnP is robust enough
    # that milder starvation still tracks to ~0.03 ATE with nothing for BA
    # to recover (measured raw 0.195 / BA 0.061 at these settings).
    cfg_vo = StereoVOConfig(
        surf=SurfConfig(min_hessian=300.0), max_keypoints=48,
        num_hypotheses=8,
    )
    cfg_ba = StereoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=256,
        num_hypotheses=16,
    )
    seq = make_stereo_sequence(
        n_frames=24, height=240, width=320, dt=0.25, seed=5, speed=0.5
    )
    rig = _rig(seq.K)
    _, outs = run_stereo_vo(
        jnp.asarray(seq.imgs_left), jnp.asarray(seq.imgs_right),
        jnp.asarray(seq.timestamps), rig, cfg_vo, jax.random.PRNGKey(0),
    )
    outs = jax.tree.map(np.asarray, outs)
    _, _, raw_pos = integrate_mono_poses(
        outs.velocity, outs.R, seq.timestamps, outs.published
    )
    gt = seq.positions - seq.positions[0]
    ate_raw = ate_rmse(raw_pos, gt)

    res = refine_mono_trajectory(
        seq.imgs_left, seq.timestamps, outs, seq.K, cfg_ba,
        window_size=6, keyframe_stride=2, ba_iters=10,
    )
    ate_ba = ate_rmse(res.positions, gt)
    assert np.isfinite(res.positions).all()
    assert len(res.kf_indices) >= 6
    # Real improvement, not noise (measured 0.31x).
    assert ate_ba < 0.7 * ate_raw, (ate_raw, ate_ba)


def test_stereo_pose_graph_closes_loop():
    """Retrieval + PnP verification + pose graph on the stereo loop fixture:
    endpoint drift must collapse, with >= 1 metric loop edge accepted."""
    cfg = StereoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=256,
        num_hypotheses=256,
    )
    seq = make_loop_sequence(
        n_frames=20, height=240, width=320, seed=2, baseline=0.33
    )
    rig = _rig(seq.K)
    T = len(seq.imgs_left)
    R_wc = seq.rotations
    # Inject odometry-like drift (as the mono loop test does).
    rng = np.random.default_rng(0)
    step = np.linalg.norm(np.diff(seq.positions, axis=0), axis=-1).mean()
    drift_dir = rng.standard_normal(3)
    drift_dir /= np.linalg.norm(drift_dir)
    drift = np.outer(np.arange(T), drift_dir) * (0.06 * step)
    pos_drift = seq.positions + drift
    t_drift = -np.einsum("tij,tj->ti", R_wc, pos_drift)
    endpoint_before = np.linalg.norm(pos_drift[-1] - seq.positions[-1])
    assert endpoint_before > 0.2

    res = close_loops_and_optimize_stereo(
        seq.imgs_left, seq.imgs_right, R_wc, t_drift, rig, cfg,
        min_gap=12, top_k=6, min_similarity=0.8, iters=25,
    )
    assert len(res.loops) >= 1, "no stereo loop survived PnP verification"
    assert any(lp.j - lp.i >= 12 for lp in res.loops)
    endpoint_after = np.linalg.norm(
        (res.positions[-1] - res.positions[0])
        - (seq.positions[-1] - seq.positions[0])
    )
    assert endpoint_after < endpoint_before / 5.0, (
        endpoint_before, endpoint_after,
    )
