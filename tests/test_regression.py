"""Pinned accuracy regressions (VERDICT r1 #9).

Fixed-seed fixtures with recorded expected metrics, bounded at ~2x the
measured values — a silent accuracy regression (e.g. a detector or estimator
change that doubles ATE) fails here even though the loose smoke thresholds in
test_pipeline.py would still pass.  Measured on 2026-08-19 (CPU, f32):

  mono : ATE 0.0056 m, velocity RMSE 0.0185 m/s, validity 0.958
  stereo: velocity RMSE 0.0246 m/s, validity 0.938

If a change legitimately improves/changes accuracy, re-measure and update
the bounds consciously — do not widen them to make a regression pass.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ergo_uvo_tpu.config import MonoVOConfig, StereoVOConfig, SurfConfig
from ergo_uvo_tpu.eval import ate_rmse, velocity_rmse
from ergo_uvo_tpu.io import make_mono_sequence, make_stereo_sequence
from ergo_uvo_tpu.optim.trajectory import integrate_mono_poses
from ergo_uvo_tpu.pipeline import run_mono_vo, run_stereo_vo
from ergo_uvo_tpu.pipeline.stereo import StereoRig


def test_mono_pinned_accuracy():
    cfg = MonoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=256, num_hypotheses=256
    )
    seq = make_mono_sequence(n_frames=24, height=240, width=320, dt=0.25, seed=7)
    _, outs = run_mono_vo(
        jnp.asarray(seq.imgs_left), jnp.asarray(seq.timestamps),
        jnp.asarray(seq.ranges), jnp.asarray(seq.K), cfg, jax.random.PRNGKey(7),
    )
    outs = jax.tree.map(np.asarray, outs)
    _, _, pos = integrate_mono_poses(
        outs.velocity, outs.R, seq.timestamps, outs.published
    )
    gt = seq.positions - seq.positions[0]
    ate = ate_rmse(pos, gt)
    vrmse = velocity_rmse(outs.velocity, seq.velocities_prevcam, outs.validity)
    assert ate < 0.012, f"mono ATE regressed: {ate:.4f} (pinned 0.0056)"
    assert vrmse < 0.04, f"mono vel RMSE regressed: {vrmse:.4f} (pinned 0.0185)"
    assert outs.validity.mean() >= 0.9, outs.validity.mean()
    assert int(outs.published.sum()) == 23


def test_stereo_pinned_accuracy():
    cfg = StereoVOConfig(
        surf=SurfConfig(min_hessian=60.0), max_keypoints=256, num_hypotheses=256
    )
    seq = make_stereo_sequence(n_frames=16, height=240, width=320, dt=0.25, seed=7)
    rig = StereoRig(
        K_left=jnp.asarray(seq.K), K_right=jnp.asarray(seq.K),
        R_right=jnp.eye(3), t_right=jnp.asarray([-0.33, 0.0, 0.0]),
    )
    _, outs = run_stereo_vo(
        jnp.asarray(seq.imgs_left), jnp.asarray(seq.imgs_right),
        jnp.asarray(seq.timestamps), rig, cfg, jax.random.PRNGKey(7),
    )
    outs = jax.tree.map(np.asarray, outs)
    vrmse = velocity_rmse(outs.velocity, seq.velocities_prevcam, outs.validity)
    assert vrmse < 0.05, f"stereo vel RMSE regressed: {vrmse:.4f} (pinned 0.0246)"
    assert outs.validity.mean() >= 0.85, outs.validity.mean()
